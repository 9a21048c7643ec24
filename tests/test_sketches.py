"""HLL sketch rollups (ops/sketches.py): mergeability, storage
round-trip, incremental maintenance, accuracy, and build-plan shape."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.ops import sketches


@pytest.fixture(scope="module")
def keyed(spark):
    # 40k rows over 5k distinct keys spread across 10 partitions
    return (
        spark.range(40_000)
        .select(
            (F.col("id") % 5_000).alias("k"),
            (F.col("id") % 10).cast("string").alias("part"),
        )
        .persist()
    )


def _est(df):
    return df.collect()[0]["estimate"]


def test_union_of_partition_sketches_matches_whole_sketch(spark, keyed):
    """The property that makes sketches mergeable state: unioning the 10
    per-partition sketches yields the SAME estimate as one sketch built
    over the whole corpus — partition boundaries leave no trace."""
    per_part = sketches.partition_sketches(keyed, "k", ["part"])
    assert per_part.count() == 10
    whole = keyed.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("k", F.lit(12))).alias(
            "estimate"
        )
    )
    assert _est(sketches.merged_estimate(per_part)) == _est(whole)


def test_estimate_within_tolerance_of_exact(spark, keyed):
    est = _est(
        sketches.merged_estimate(
            sketches.partition_sketches(keyed, "k", ["part"])
        )
    )
    assert abs(est - 5_000) <= 0.03 * 5_000


def test_sketch_survives_parquet_roundtrip(spark, keyed):
    """The storage contract: the binary column written to parquet and
    read back unions to the identical estimate — stored sketches are
    first-class state, not a session-local artifact."""
    per_part = sketches.partition_sketches(keyed, "k", ["part"])
    before = _est(sketches.merged_estimate(per_part))
    work = tempfile.mkdtemp(prefix="sketch_rt_")
    try:
        per_part.write.mode("overwrite").parquet(work)
        stored = spark.read.parquet(work)
        assert _est(sketches.merged_estimate(stored)) == before
        # rollup at a coarser grain from storage: parts {0..4} vs {5..9}
        half = sketches.rollup_estimates(
            stored.withColumn(
                "half", (F.col("part").cast("int") < 5).cast("int")
            ),
            ["half"],
        )
        assert half.count() == 2
        assert half.agg(F.sum("n_rows")).collect()[0][0] == 40_000
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_incremental_merge_equals_full_rebuild(spark, keyed):
    """New-partition maintenance: build sketches for 8 old parts, append
    the 2 fresh parts' sketches (historical rows untouched), and the
    merged estimate equals a from-scratch build over everything."""
    old = sketches.partition_sketches(
        keyed.filter(F.col("part").cast("int") < 8), "k", ["part"]
    )
    fresh = sketches.partition_sketches(
        keyed.filter(F.col("part").cast("int") >= 8), "k", ["part"]
    )
    merged = sketches.merge_new_partition(old, fresh)
    full = sketches.partition_sketches(keyed, "k", ["part"])
    assert _est(sketches.merged_estimate(merged)) == _est(
        sketches.merged_estimate(full)
    )


def test_build_plan_is_one_partial_agg_shuffle(spark, keyed):
    """Scale shape: the sketch build must be a partial-aggregate pair
    around ONE exchange — executors ship ~2.5 KB partial sketches, never
    raw keys."""
    plan = (
        sketches.partition_sketches(keyed, "k", ["part"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan
