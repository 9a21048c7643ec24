"""Batch/streaming consistency: the same records pushed through the
streaming CDC path and the batch ETL path must land identical gold rows.

This is the lambda-architecture guarantee the reference implies but never
tests (its batch reload and streaming delivery share a schema only by
convention).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.pipeline import run_batch
from rxlan_aws_lakehouse_spark.pipeline.gold import load_gold
from rxlan_aws_lakehouse_spark.streaming.cdc import forward_cdc
from tests.test_streaming import _envelope, _write_landing

RECORDS = [
    ("Austin", "2024-03-01T10:05:00Z", "21.5"),
    ("Austin", "2024-03-01T10:05:00Z", "21.5"),  # at-least-once dup
    ("Chicago", "2024-03-01T10:10:00Z", "3.0"),
    ("Austin", "2024-03-01T11:20:00Z", "22.0"),
]

COMPARE_COLS = ["city", "ts", "temp_c", "dt", "hour"]


def test_streaming_and_batch_paths_agree(spark, tmp_path):
    landing = str(tmp_path / "landing")
    stream_bronze = str(tmp_path / "stream_bronze")
    ckpt = str(tmp_path / "ckpt")
    gold = str(tmp_path / "gold")

    # streaming path: envelopes -> CDC -> bronze NDJSON (deduped, event-time
    # partitioned)
    _write_landing(
        landing,
        [
            _envelope("INSERT", c, ts, temp=t, event_id=f"e{i}")
            for i, (c, ts, t) in enumerate(RECORDS)
        ],
    )
    q = forward_cdc(spark, landing, stream_bronze, ckpt, available_now=True)
    q.awaitTermination(120)

    # batch path: the CDC output IS the bronze layer; run the batch ETL on it
    m = run_batch(spark, stream_bronze, gold)
    assert m.input_rows == 3  # dup removed by the stream, not re-counted

    got = {
        (r["city"], str(r["ts"]), r["temp_c"], r["dt"], r["hour"])
        for r in load_gold(spark, gold).select(*COMPARE_COLS).collect()
    }
    assert got == {
        ("Austin", "2024-03-01 10:05:00", 21.5, "2024-03-01", "10"),
        ("Chicago", "2024-03-01 10:10:00", 3.0, "2024-03-01", "10"),
        ("Austin", "2024-03-01 11:20:00", 22.0, "2024-03-01", "11"),
    }
    # partition columns derived identically by both paths: the gold files
    # sit under the same dt=/hour= dirs the stream wrote
    stream_parts = {
        (r["dt"], r["hour"])
        for r in spark.read.option("basePath", stream_bronze).json(stream_bronze)
        .select("dt", "hour").distinct().collect()
    }
    gold_parts = {
        (r["dt"], r["hour"])
        for r in load_gold(spark, gold).select("dt", "hour").distinct().collect()
    }
    assert stream_parts == gold_parts
