"""Stateful streaming operator tests: per-key running state across
micro-batches via applyInPandasWithState."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.streaming.stateful import (
    run_running_stats,
    run_sessionize,
)
from tests.test_streaming import _envelope, _write_landing


def test_event_time_timeout_closes_sessions(spark, tmp_path):
    """Sessions emit only when the watermark passes session end + gap:
    batch 1 opens a session; batch 2's later events advance the watermark
    past the timeout, so batch 2's output contains the CLOSED session."""
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_landing(
        landing,
        [
            _envelope("INSERT", "Austin", "2024-03-01T10:00:00Z", event_id="a"),
            _envelope("INSERT", "Austin", "2024-03-01T10:10:00Z", event_id="b"),
        ],
    )
    q = run_sessionize(spark, landing, out_dir, ckpt, gap_minutes=30)
    q.awaitTermination(120)
    # session still open: nothing emitted yet
    first = spark.read.schema(
        "city string, session_start timestamp, session_end timestamp, n_events long"
    ).parquet(out_dir)
    assert first.count() == 0

    # close-by-DATA: a later Austin event exceeding the gap splits the
    # session immediately; close-by-WATERMARK: Chicago's session (opened in
    # the same batch) has no further data — a later batch advances the
    # watermark, and timeout processing at the NEXT batch start evicts it
    _write_landing(
        landing,
        [
            _envelope("INSERT", "Austin", "2024-03-01T13:00:00Z", event_id="c"),
            _envelope("INSERT", "Chicago", "2024-03-01T13:00:30Z", event_id="c2"),
        ],
        name="batch1.json",
    )
    q2 = run_sessionize(spark, landing, out_dir, ckpt, gap_minutes=30)
    q2.awaitTermination(120)
    closed = {(r["city"], str(r["session_start"]), r["n_events"]) for r in spark.read.parquet(out_dir).collect()}
    assert closed == {("Austin", "2024-03-01 10:00:00", 2)}  # split by data

    _write_landing(
        landing,
        [_envelope("INSERT", "Austin", "2024-03-01T16:00:00Z", event_id="d")],
        name="batch2.json",
    )
    q3 = run_sessionize(spark, landing, out_dir, ckpt, gap_minutes=30)
    q3.awaitTermination(120)
    _write_landing(
        landing,
        [_envelope("INSERT", "Austin", "2024-03-01T17:00:00Z", event_id="e")],
        name="batch3.json",
    )
    q4 = run_sessionize(spark, landing, out_dir, ckpt, gap_minutes=30)
    q4.awaitTermination(120)
    closed = {(r["city"], str(r["session_start"]), r["n_events"]) for r in spark.read.parquet(out_dir).collect()}
    # Chicago evicted by watermark timeout; Austin's 13:00 session split by
    # the 16:00 event
    assert ("Chicago", "2024-03-01 13:00:30", 1) in closed
    assert ("Austin", "2024-03-01 13:00:00", 1) in closed


def test_running_stats_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_landing(
        landing,
        [
            _envelope("INSERT", "Austin", "2024-03-01T10:05:00Z", temp="10.0", event_id="a"),
            _envelope("INSERT", "Austin", "2024-03-01T10:06:00Z", temp="30.0", event_id="b"),
            _envelope("INSERT", "Chicago", "2024-03-01T10:07:00Z", temp="5.0", event_id="c"),
        ],
    )
    q = run_running_stats(spark, landing, out_dir, ckpt)
    q.awaitTermination(120)
    first = {
        r["city"]: r
        for r in spark.read.parquet(out_dir).collect()
    }
    assert first["Austin"]["n"] == 2
    assert first["Austin"]["min_v"] == 10.0 and first["Austin"]["max_v"] == 30.0
    assert first["Austin"]["avg_v"] == 20.0
    assert first["Chicago"]["n"] == 1

    # second micro-batch: state persists via checkpoint, Austin accumulates
    _write_landing(
        landing,
        [_envelope("INSERT", "Austin", "2024-03-01T10:30:00Z", temp="50.0", event_id="d")],
        name="batch1.json",
    )
    q2 = run_running_stats(spark, landing, out_dir, ckpt)
    q2.awaitTermination(120)
    latest = (
        spark.read.parquet(out_dir)
        .filter(F.col("city") == "Austin")
        .orderBy(F.col("batch_id").desc(), F.col("n").desc())
        .head()
    )
    assert latest["n"] == 3
    assert latest["max_v"] == 50.0
    assert latest["avg_v"] == 30.0
