"""Streaming CDC tests: DDB-stream envelopes -> deduped partitioned bronze.

Trigger.AvailableNow drains the landing directory deterministically
(SURVEY.md §7 hard-parts note on streaming determinism).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.streaming import (
    DDB_EVENT_SCHEMA,
    cdc_transform,
    forward_cdc,
    windowed_counts,
)


def _envelope(event_name, city, iso_ts, temp="20.5", event_id="e1"):
    return {
        "eventID": event_id,
        "eventName": event_name,
        "dynamodb": {
            "NewImage": {
                "app": {"S": "rxlan"},
                "stage": {"S": "dev"},
                "source": {"S": "openweather"},
                "fetched_at_utc": {"S": iso_ts},
                "city": {"S": city},
                "country": {"S": "US"},
                "lat": {"N": "30.27"},
                "lon": {"N": "-97.74"},
                "temp_c": {"N": temp},
                "feels_like_c": {"N": temp},
                "humidity": {"N": "50"},
                "pressure": {"N": "1013"},
                "wind_speed": {"N": "3.5"},
            },
            "ApproximateCreationDateTime": 1709287500.0,
        },
    }


def _write_landing(path, envelopes, name="batch0.json"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in envelopes:
            f.write(json.dumps(e) + "\n")


def test_cdc_transform_batch_semantics(spark):
    rows = [
        _envelope("INSERT", "Austin", "2024-03-01T10:05:00Z", event_id="a"),
        _envelope("INSERT", "Austin", "2024-03-01T10:05:00Z", event_id="b"),  # dup
        _envelope("MODIFY", "Austin", "2024-03-01T10:06:00Z", event_id="c"),  # filtered
        _envelope("INSERT", "Chicago", "2024-03-01T10:07:00Z", event_id="d"),
    ]
    df = spark.createDataFrame([json.dumps(r) for r in rows], "string").select(
        F.from_json(F.col("value"), DDB_EVENT_SCHEMA).alias("e")
    ).select("e.*")
    out = cdc_transform(df)
    got = {(r["city"], str(r["ts"]), r["dt"], r["hour"]) for r in out.collect()}
    assert got == {
        ("Austin", "2024-03-01 10:05:00", "2024-03-01", "10"),
        ("Chicago", "2024-03-01 10:07:00", "2024-03-01", "10"),
    }
    # typed decode: numbers became doubles/ints
    types = dict(out.dtypes)
    assert types["temp_c"] == "double" and types["humidity"] == "int"


def test_forward_cdc_end_to_end(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(
        landing,
        [
            _envelope("INSERT", "Austin", "2024-03-01T10:05:00Z", event_id="a"),
            _envelope("INSERT", "Austin", "2024-03-01T10:05:00Z", event_id="a2"),
            _envelope("INSERT", "Chicago", "2024-03-01T11:20:00Z", event_id="b"),
            _envelope("REMOVE", "Austin", "2024-03-01T11:30:00Z", event_id="c"),
        ],
    )
    q = forward_cdc(spark, landing, out_dir, ckpt, available_now=True)
    q.awaitTermination(120)
    out = spark.read.option("basePath", out_dir).json(out_dir)
    rows = {(r["city"], r["dt"], r["hour"]) for r in out.collect()}
    assert rows == {("Austin", "2024-03-01", "10"), ("Chicago", "2024-03-01", "11")}
    # partition directories are event-time derived
    assert os.path.isdir(os.path.join(out_dir, "dt=2024-03-01", "hour=10"))

    # restart with new data: checkpoint resumes, no reprocessing of old files
    _write_landing(
        landing,
        [_envelope("INSERT", "Austin", "2024-03-01T12:00:00Z", event_id="d")],
        name="batch1.json",
    )
    q2 = forward_cdc(spark, landing, out_dir, ckpt, available_now=True)
    q2.awaitTermination(120)
    out2 = spark.read.option("basePath", out_dir).json(out_dir)
    assert out2.count() == 3


def test_backpressure_max_files_per_trigger(spark, tmp_path):
    """A 4-file backlog with maxFilesPerTrigger=1 drains in multiple
    micro-batches (availableNow honors the cap batch by batch)."""
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for i in range(4):
        _write_landing(
            landing,
            [_envelope("INSERT", "Austin", f"2024-03-01T1{i}:00:00Z", event_id=f"e{i}")],
            name=f"f{i}.json",
        )
    q = forward_cdc(
        spark, landing, out_dir, ckpt, available_now=True, max_files_per_trigger=1
    )
    q.awaitTermination(180)
    progress = q.recentProgress
    batches_with_rows = [p for p in progress if p["numInputRows"] > 0]
    assert len(batches_with_rows) == 4  # one file per micro-batch
    out = spark.read.option("basePath", out_dir).json(out_dir)
    assert out.count() == 4


def test_windowed_counts_batch(spark):
    rows = [
        _envelope("INSERT", "Austin", "2024-03-01T10:05:00Z", event_id="a"),
        _envelope("INSERT", "Austin", "2024-03-01T10:55:00Z", event_id="b"),
        _envelope("INSERT", "Austin", "2024-03-01T11:05:00Z", event_id="c"),
    ]
    df = spark.createDataFrame([json.dumps(r) for r in rows], "string").select(
        F.from_json(F.col("value"), DDB_EVENT_SCHEMA).alias("e")
    ).select("e.*")
    out = windowed_counts(cdc_transform(df))
    got = {(str(r["window_start"]), r["n"]) for r in out.collect()}
    assert got == {("2024-03-01 10:00:00", 2), ("2024-03-01 11:00:00", 1)}


def test_streaming_cdc_counts_driver_query(spark):
    """The driver-visible streaming artifact: a real AvailableNow run over
    fixture-derived envelopes, deterministic across reruns."""
    from rxlan_aws_lakehouse_spark.queries.streaming_live import (
        streaming_cdc_counts,
    )

    a = streaming_cdc_counts(spark, "/root/testdata/sf0.001").collect()
    assert len(a) > 0
    assert all(r["n_rows"] > 0 and r["n_cities"] > 0 for r in a)
    b = streaming_cdc_counts(spark, "/root/testdata/sf0.001").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_streaming_sessionize_counts_driver_query(spark):
    """The stateful-lane driver artifact: applyInPandasWithState sessions
    drained in one AvailableNow batch — deterministic across reruns, with
    real multi-event sessions (close-by-data) emitted."""
    from rxlan_aws_lakehouse_spark.queries.streaming_live import (
        streaming_sessionize_counts,
    )

    a = streaming_sessionize_counts(spark, "/root/testdata/sf0.001").collect()
    assert len(a) > 0
    assert all(r["n_sessions"] > 0 and r["n_events"] >= r["n_sessions"] for r in a)
    b = streaming_sessionize_counts(spark, "/root/testdata/sf0.001").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_enrich_stream_static_join(spark, tmp_path):
    """Stream-static join: each micro-batch row enriched with a broadcast
    dimension; unmatched cities pass through with NULL (left join), and the
    watermark dedup still collapses duplicates before the join."""
    from rxlan_aws_lakehouse_spark.streaming.enrich import enrich_stream

    landing = str(tmp_path / "landing")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_landing(
        landing,
        [
            _envelope("INSERT", "Austin", "2024-03-01T10:00:00Z", event_id="a1"),
            _envelope("INSERT", "Austin", "2024-03-01T10:00:00Z", event_id="a1dup"),
            _envelope("INSERT", "Dallas", "2024-03-01T10:05:00Z", event_id="d1"),
            _envelope("INSERT", "Nowhere", "2024-03-01T10:06:00Z", event_id="n1"),
            _envelope("MODIFY", "Austin", "2024-03-01T11:00:00Z", event_id="m1"),
        ],
    )
    dim = spark.createDataFrame(
        [("Austin", "TX", "south"), ("Dallas", "TX", "south")],
        "city string, state string, region string",
    )
    q = enrich_stream(spark, landing, out_dir, ckpt, dim, on="city")
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    rows = {r["city"]: r for r in got.collect()}
    assert set(rows) == {"Austin", "Dallas", "Nowhere"}  # MODIFY filtered, dup collapsed
    assert rows["Austin"]["region"] == "south"
    assert rows["Nowhere"]["region"] is None  # left join annotates, never drops


def test_stream_stream_attribution_join(spark, tmp_path):
    """Two live streams joined on key + event-time range: conversions match
    clicks of the same user within the 30-minute window only."""
    import json as _json
    from rxlan_aws_lakehouse_spark.streaming.stream_join import run_attribution

    clicks_dir = str(tmp_path / "clicks")
    convs_dir = str(tmp_path / "convs")
    os.makedirs(clicks_dir), os.makedirs(convs_dir)
    with open(os.path.join(clicks_dir, "c.json"), "w") as f:
        for row in [
            {"user_id": 1, "click_id": 10, "ts": "2024-03-01T10:00:00"},
            {"user_id": 1, "click_id": 11, "ts": "2024-03-01T10:20:00"},
            {"user_id": 2, "click_id": 20, "ts": "2024-03-01T10:00:00"},
        ]:
            f.write(_json.dumps(row) + "\n")
    with open(os.path.join(convs_dir, "v.json"), "w") as f:
        for row in [
            # in-window for clicks 10 and 11
            {"user_id": 1, "conv_id": 100, "ts": "2024-03-01T10:25:00", "amount": 5.0},
            # out of window for click 20 (45 min later)
            {"user_id": 2, "conv_id": 200, "ts": "2024-03-01T10:45:00", "amount": 7.0},
            # conversion BEFORE any click: no match
            {"user_id": 1, "conv_id": 300, "ts": "2024-03-01T09:00:00", "amount": 9.0},
        ]:
            f.write(_json.dumps(row) + "\n")
    q = run_attribution(
        spark, clicks_dir, convs_dir, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = spark.read.schema(
        "user_id long, conv_id long, click_id long, "
        "click_ts timestamp, conv_ts timestamp, amount double"
    ).parquet(str(tmp_path / "out"))
    pairs = {(r["conv_id"], r["click_id"]) for r in got.collect()}
    assert pairs == {(100, 10), (100, 11)}


def test_cdc_over_real_tcp_socket(spark, tmp_path):
    """The CDC pipeline fed by a REAL network source (round 8): a local
    TCP server streams DDB envelopes line-by-line, Spark's socket source
    connects as a client, and the same cdc_transform (INSERT filter,
    typed decode, watermark dedup, event-time dt/hour) that serves the
    file-landing path decodes live network input. Pins that the transform
    is source-agnostic — the Kinesis/Kafka swap changes only the reader."""
    import json
    import socket
    import threading
    import time as _time

    from rxlan_aws_lakehouse_spark.streaming.net import run_cdc_socket

    def envelope(i, name="INSERT"):
        return json.dumps(
            {
                "eventID": f"evt-{i}",
                "eventName": name,
                "dynamodb": {
                    "NewImage": {
                        "city": {"S": f"City{i % 3}"},
                        "fetched_at_utc": {
                            "S": f"2024-01-01T10:{i:02d}:00Z"
                        },
                        "temp_c": {"N": str(20.0 + i)},
                    },
                    "ApproximateCreationDateTime": 1709287500.0,
                },
            }
        )

    lines = [envelope(i) for i in range(10)]
    lines.append(envelope(3))              # duplicate (city, ts): deduped
    lines.append(envelope(99, "MODIFY"))   # filtered
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            stop.wait(60)  # keep the connection open until the test ends

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = run_cdc_socket(spark, "127.0.0.1", port, out, ckpt)
    try:
        deadline = _time.time() + 60
        got = 0
        while _time.time() < deadline:
            try:
                got = spark.read.parquet(out).count()
            except Exception:
                got = 0
            if got >= 10:
                break
            _time.sleep(1)
        sink = spark.read.parquet(out)
        rows = {
            (r["city"], str(r["ts"]), r["dt"], r["hour"])
            for r in sink.collect()
        }
        assert len(rows) == 10  # 10 distinct INSERTs; dup + MODIFY gone
        assert ("City0", "2024-01-01 10:03:00", "2024-01-01", "10") in rows
        temps = {r["temp_c"] for r in sink.collect()}
        assert temps == {20.0 + i for i in range(10)}  # typed-N decode
    finally:
        q.stop()
        stop.set()
        srv.close()
