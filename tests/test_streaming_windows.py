"""Session-window and stream-stream join tests — streaming runs drained
deterministically with Trigger.AvailableNow."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.streaming import cdc
from rxlan_aws_lakehouse_spark.streaming.windows import session_windows, stream_stream_join
from tests.test_streaming import _envelope, _write_landing


def _decoded_stream(spark, landing):
    raw = spark.readStream.schema(cdc.DDB_EVENT_SCHEMA).json(landing)
    return cdc.cdc_transform(raw)


def test_session_windows_streaming(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(
        landing,
        [
            # Austin: two events 10 min apart (one session), then a 2h gap
            _envelope("INSERT", "Austin", "2024-03-01T10:00:00Z", event_id="a"),
            _envelope("INSERT", "Austin", "2024-03-01T10:10:00Z", event_id="b"),
            _envelope("INSERT", "Austin", "2024-03-01T12:30:00Z", event_id="c"),
            _envelope("INSERT", "Chicago", "2024-03-01T10:05:00Z", event_id="d"),
        ],
    )
    sess = session_windows(_decoded_stream(spark, landing))
    q = (
        sess.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["city"], []).append(r)
    # watermark only CLOSES sessions seen strictly before it; the final
    # session per key may be withheld until more data advances event time —
    # the first Austin session must be closed and correct
    austin = sorted(by_key.get("Austin", []), key=lambda r: r["session_start"])
    assert austin, "first Austin session should have closed"
    assert austin[0]["n_events"] == 2
    assert str(austin[0]["first_ts"]) == "2024-03-01 10:00:00"
    assert str(austin[0]["last_ts"]) == "2024-03-01 10:10:00"


def test_session_windows_batch_semantics(spark):
    """Same operator on a batch frame: all sessions visible."""
    df = spark.createDataFrame(
        [
            ("Austin", "2024-03-01 10:00:00"),
            ("Austin", "2024-03-01 10:10:00"),
            ("Austin", "2024-03-01 12:30:00"),
        ],
        "city string, ts_s string",
    ).select("city", F.to_timestamp("ts_s").alias("ts"))
    out = session_windows(df).orderBy("session_start").collect()
    assert [r["n_events"] for r in out] == [2, 1]


def test_stream_static_enrichment(spark, tmp_path):
    """Each micro-batch joins against the static dimension (broadcast per
    batch); unmatched stream rows survive the left join."""
    from rxlan_aws_lakehouse_spark.streaming import stream_static_enrich

    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(
        landing,
        [
            _envelope("INSERT", "Austin", "2024-03-01T10:00:00Z", event_id="a"),
            _envelope("INSERT", "Nowhere", "2024-03-01T10:01:00Z", event_id="b"),
        ],
    )
    dim = spark.createDataFrame(
        [("Austin", "US-TX", 961855), ("Chicago", "US-IL", 2746388)],
        "city string, region string, population long",
    )
    enriched = stream_static_enrich(
        _decoded_stream(spark, landing).select("city", "ts", "temp_c"), dim, on="city"
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["city"]: r for r in spark.read.parquet(out_dir).collect()}
    assert rows["Austin"]["region"] == "US-TX"
    assert rows["Nowhere"]["region"] is None  # left join keeps it
    assert len(rows) == 2


def test_stream_stream_join(spark, tmp_path):
    click_dir = str(tmp_path / "clicks")
    buy_dir = str(tmp_path / "buys")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(
        click_dir,
        [
            _envelope("INSERT", "Austin", "2024-03-01T10:00:00Z", event_id="c1"),
            _envelope("INSERT", "Austin", "2024-03-01T07:00:00Z", event_id="c2"),  # too old
            _envelope("INSERT", "Chicago", "2024-03-01T10:20:00Z", event_id="c3"),  # after buy
        ],
    )
    _write_landing(
        buy_dir,
        [_envelope("INSERT", "Austin", "2024-03-01T10:30:00Z", event_id="b1"),
         _envelope("INSERT", "Chicago", "2024-03-01T10:10:00Z", event_id="b2")],
    )
    clicks = _decoded_stream(spark, click_dir).select(
        "city", F.col("ts").alias("click_ts")
    )
    buys = _decoded_stream(spark, buy_dir).select(
        F.col("city").alias("city_b"), F.col("ts").alias("buy_ts")
    )
    # rename for shared-key form
    joined = stream_stream_join(
        buys.withColumnRenamed("city_b", "city"),
        clicks,
        key="city",
        left_ts="buy_ts",
        right_ts="click_ts",
        within="1 hour",
    )
    q = (
        joined.select("l.city", "buy_ts", "click_ts")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["city"], str(r["click_ts"])) for r in spark.read.parquet(out_dir).collect()}
    # Austin buy at 10:30 attributes to the 10:00 click (within 1h);
    # the 07:00 click is outside the window; Chicago's click is AFTER its buy
    assert rows == {("Austin", "2024-03-01 10:00:00")}


def test_watermark_dedup_multibatch_semantics(spark, tmp_path):
    """Pins the Spark semantics run_watermark_dedup documents and the
    registry lane's oracle relies on (measured round 8): (1) one file per
    micro-batch in mtime order, so the watermark advances between batches;
    (2) the operator never drops below-watermark INPUT (late new keys are
    emitted); (3) duplicates are suppressed cross-batch while their
    original's ts + delay is at or past the current watermark."""
    import json
    import os

    from rxlan_aws_lakehouse_spark.streaming.windows import run_watermark_dedup

    landing = tmp_path / "landing"
    landing.mkdir()
    f1 = [
        {"city": "A", "ts": "2024-01-01T10:00:00"},
        {"city": "A", "ts": "2024-01-01T10:00:00"},   # in-batch dup
        {"city": "C", "ts": "2024-01-01T12:00:00"},   # frontier -> wm2 11:00
    ]
    f2 = [
        {"city": "D", "ts": "2024-01-02T09:00:00"},
        {"city": "A", "ts": "2024-01-01T10:00:00"},   # cross-batch dup,
                                                      # expiresAt 11:00 == wm2
        {"city": "E", "ts": "2024-01-01T08:00:00"},   # NEW key below wm2
    ]
    for i, rows in enumerate([f1, f2]):
        p = landing / f"b{i}.json"
        p.write_text("".join(json.dumps(r) + "\n" for r in rows))
        os.utime(p, (1_700_000_000 + i * 60,) * 2)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = run_watermark_dedup(spark, str(landing), out, ckpt, delay="1 hour")
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # genuinely multi-batch
    got = sorted(
        (r["city"], str(r["ts"])) for r in spark.read.parquet(out).collect()
    )
    assert got == [
        ("A", "2024-01-01 10:00:00"),
        ("C", "2024-01-01 12:00:00"),
        ("D", "2024-01-02 09:00:00"),
        ("E", "2024-01-01 08:00:00"),
    ]
