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


class TestHistogramSketches:
    LO, HI, NB = 0.0, 100.0, 10

    def _df(self, spark):
        # values 0..99, two partitions by parity of value
        return spark.range(0, 100).select(
            (F.col("id") % 2).cast("string").alias("part"),
            F.col("id").cast("double").alias("v"),
        )

    def test_dense_histogram_and_clamping(self, spark):
        df = self._df(spark).unionByName(
            spark.createDataFrame(
                [("0", -5.0), ("0", 1e9)], "part string, v double"
            )
        )
        sk = sketches.histogram_sketches(
            df, "v", ["part"], self.LO, self.HI, self.NB
        )
        rows = {r["part"]: r for r in sk.collect()}
        assert rows["0"]["n_rows"] == 52
        h0 = rows["0"]["hist"]
        assert len(h0) == self.NB
        # each width-10 bin holds 5 even values; edges absorb the clamps
        assert h0[0] == 6 and h0[-1] == 6 and all(c == 5 for c in h0[1:-1])
        assert sum(rows["1"]["hist"]) == rows["1"]["n_rows"] == 50
        # clamp observability (round 9): out-of-range mass is COUNTED,
        # not silently folded into the edge bins alone
        assert rows["0"]["clamped_low"] == 1
        assert rows["0"]["clamped_high"] == 1
        assert rows["1"]["clamped_low"] == rows["1"]["clamped_high"] == 0

    def test_clamp_counts_sum_through_merge(self, spark):
        df = self._df(spark).unionByName(
            spark.createDataFrame(
                [("0", -5.0), ("1", -6.0), ("0", 1e9), ("0", 100.0)],
                "part string, v double",
            )
        ).withColumn("all", F.lit("x"))
        sk = sketches.histogram_sketches(
            df, "v", ["part", "all"], self.LO, self.HI, self.NB
        )
        merged = sketches.merge_histograms(sk, ["all"]).collect()[0]
        assert merged["clamped_low"] == 2
        assert merged["clamped_high"] == 2  # 1e9 and hi itself (range is [lo, hi))
        assert merged["n_rows"] == 104
        # legacy sketch tables without the clamp columns still merge
        legacy = sk.drop("clamped_low", "clamped_high")
        m2 = sketches.merge_histograms(legacy, ["all"]).collect()[0]
        assert m2["n_rows"] == 104 and "clamped_low" not in m2.asDict()

    def test_merge_equals_direct_build_after_roundtrip(self, spark, tmp_path):
        df = self._df(spark)
        sk = sketches.histogram_sketches(
            df, "v", ["part"], self.LO, self.HI, self.NB
        )
        p = str(tmp_path / "hist")
        sk.write.parquet(p)
        stored = spark.read.parquet(p).withColumn("all", F.lit("x"))
        merged = sketches.merge_histograms(stored, ["all"]).collect()[0]
        direct = sketches.histogram_sketches(
            df.withColumn("all", F.lit("x")), "v", ["all"],
            self.LO, self.HI, self.NB,
        ).collect()[0]
        assert list(merged["hist"]) == list(direct["hist"])
        assert merged["n_rows"] == direct["n_rows"] == 100

    def test_quantile_interpolation_exact_values(self, spark):
        # uniform 0..99 in width-10 bins: est(q) = q * 100 exactly
        df = self._df(spark).withColumn("all", F.lit("x"))
        sk = sketches.histogram_sketches(
            df, "v", ["all"], self.LO, self.HI, self.NB
        )
        got = sk.select(
            *[
                sketches.histogram_quantile(
                    "hist", q, self.LO, self.HI, self.NB
                ).alias(f"q{i}")
                for i, q in enumerate((0.1, 0.5, 0.95))
            ]
        ).collect()[0]
        assert got["q0"] == 10.0 and got["q1"] == 50.0 and got["q2"] == 95.0

    def test_quantile_skips_empty_bins(self, spark):
        # all mass in bins 0 and 9: p50 must cross inside bin 0 (no /0)
        df = spark.createDataFrame(
            [("x", 1.0)] * 30 + [("x", 99.0)] * 10, "all string, v double"
        )
        sk = sketches.histogram_sketches(
            df, "v", ["all"], self.LO, self.HI, self.NB
        )
        got = sk.select(
            sketches.histogram_quantile(
                "hist", 0.5, self.LO, self.HI, self.NB
            ).alias("p50"),
            sketches.histogram_quantile(
                "hist", 0.99, self.LO, self.HI, self.NB
            ).alias("p99"),
        ).collect()[0]
        # p50: target 20 of 30-in-bin0 -> 10 * (20/30)
        assert abs(got["p50"] - 10.0 * (20.0 / 30.0)) < 1e-12
        # p99: target 39.6 crosses in bin 9: 90 + 10*(9.6/10)
        assert abs(got["p99"] - (90.0 + 9.6)) < 1e-12


class TestCountMin:
    def _df(self, spark):
        # zipf-ish: key k appears ~100//k times
        rows = [(k, i) for k in range(1, 40) for i in range(100 // k)]
        return spark.createDataFrame(rows, "k int, i int").withColumn(
            "part", (F.col("i") % 3).cast("string")
        )

    def test_never_underestimates_and_exact_for_isolated(self, spark):
        df = self._df(spark)
        sk = sketches.countmin_sketches(df, "k", ["part"], d=4, w=64)
        merged = sketches.merge_histograms(
            sk.withColumn("g", F.lit(1)), ["g"], hist_col="cm"
        )
        keys = spark.createDataFrame(
            [(k,) for k in range(1, 40)], "k int"
        )
        exact = df.groupBy("k").count()
        got = (
            keys.crossJoin(merged)
            .select(
                "k",
                sketches.countmin_estimate("cm", F.col("k"), d=4, w=64)
                .alias("est"),
            )
            .join(exact, "k")
            .collect()
        )
        assert all(r["est"] >= r["count"] for r in got)
        # with 39 keys in 4x64 cells, most mins are collision-free
        assert sum(1 for r in got if r["est"] == r["count"]) > 20

    def test_merge_equals_direct_build(self, spark):
        df = self._df(spark)
        per_part = sketches.countmin_sketches(df, "k", ["part"], d=4, w=64)
        merged = sketches.merge_histograms(
            per_part.withColumn("g", F.lit(1)), ["g"], hist_col="cm"
        ).collect()[0]
        direct = sketches.countmin_sketches(
            df.withColumn("g", F.lit(1)), "k", ["g"], d=4, w=64
        ).collect()[0]
        assert list(merged["cm"]) == list(direct["cm"])
        assert merged["n_rows"] == direct["n_rows"]


def test_histogram_wide_bins_uses_spine_and_matches_narrow(spark):
    """Both dense-assembly strategies (map-lookup <= 512 bins, spine-join
    above) must produce identical histograms: build at 1024 bins and
    check against per-value closed form."""
    df = spark.range(0, 2048).select(
        F.lit("x").alias("p"), (F.col("id") % 1024).cast("double").alias("v")
    )
    sk = sketches.histogram_sketches(
        df, "v", ["p"], lo=0.0, hi=1024.0, n_bins=1024
    ).collect()[0]
    assert len(sk["hist"]) == 1024
    assert all(c == 2 for c in sk["hist"])  # each bin holds exactly 2
    assert sk["n_rows"] == 2048
    assert sk["clamped_low"] == sk["clamped_high"] == 0
