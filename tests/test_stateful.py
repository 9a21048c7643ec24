"""Stateful streaming operator tests: per-key running state across
micro-batches via applyInPandasWithState."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.streaming.stateful import run_running_stats
from tests.test_streaming import _envelope, _write_landing


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
