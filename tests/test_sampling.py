"""Deterministic-sampling guarantees: the sample must be a pure function
of the row key — invariant under partitioning, cluster layout, and retries.
This is the property ``rand(seed)`` does NOT have (its variates are
assigned per-partition), and the reason the samplers hash instead."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from rxlan_aws_lakehouse_spark.queries.sampling import (
    LANG_RATES,
    QUOTA_PER_SOURCE,
    _uniform,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_quota_sample_invariant_under_shuffle_partitions(spark, sf_dir):
    """The same documents are selected no matter how the window shuffle is
    laid out — re-running on a different cluster size picks identical rows."""
    q = entrymod.queries()["sample_quota"]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(q(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(q(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
    assert len(a) == 20 * QUOTA_PER_SOURCE


def test_stratified_keep_decision_is_row_local(spark, sf_dir):
    """The Bernoulli keep-test for one doc_id gives the same verdict whether
    the row is evaluated alone or inside the full scan — no hidden state."""
    from rxlan_aws_lakehouse_spark.catalog import load

    d = load(spark, sf_dir, "documents").select("doc_id")
    full = {
        r["doc_id"]: r["u"]
        for r in d.select(
            "doc_id", _uniform(F.col("doc_id"), "strat:").alias("u")
        ).collect()
    }
    some = spark.createDataFrame(
        [(k,) for k in list(full)[:50]], "doc_id long"
    ).select("doc_id", _uniform(F.col("doc_id"), "strat:").alias("u"))
    for r in some.collect():
        assert full[r["doc_id"]] == r["u"]


def test_stratified_rates_are_respected(spark, sf_dir):
    """Observed keep-rate per language tracks the configured rate (binomial
    tolerance at n=500 docs); rate-1.0 strata keep everything exactly."""
    agg = (
        entrymod.queries()["sample_stratified"](spark, sf_dir)
        .groupBy("lang")
        .agg(F.sum("n_total").alias("n"), F.sum("n_kept").alias("k"))
    )
    for r in agg.collect():
        rate = LANG_RATES[r["lang"]]
        if rate == 1.0:
            assert r["k"] == r["n"]
        else:
            observed = r["k"] / r["n"]
            assert abs(observed - rate) < 0.15, (r["lang"], observed, rate)


def test_mixture_weights_flatten_toward_uniform(spark, sf_dir):
    """Temperature < 1 must compress the mixture: every q_share sits between
    its p_share and the uniform share, and shares sum to 1."""
    rows = entrymod.queries()["sample_mixture_weights"](spark, sf_dir).collect()
    uniform = 1.0 / len(rows)
    assert abs(sum(r["p_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["q_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        lo, hi = sorted((r["p_share"], uniform))
        assert lo - 1e-6 <= r["q_share"] <= hi + 1e-6, tuple(r)


def test_weighted_sample_is_true_topk_and_length_biased(spark, sf_dir):
    """A-ES keys must reach the plan as a TakeOrderedAndProject (no global
    sort), and the sample must actually skew long: the sampled docs' mean
    length exceeds the corpus mean."""
    from rxlan_aws_lakehouse_spark.catalog import load

    df = entrymod.queries()["sample_weighted"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full sort before the limit
    sampled = df.agg(F.avg("n_chars")).first()[0]
    corpus = load(spark, sf_dir, "documents").agg(F.avg("n_chars")).first()[0]
    assert sampled > corpus


def test_split_is_exhaustive_and_disjoint(spark, sf_dir):
    """Every document lands in exactly one split; totals reconcile."""
    from rxlan_aws_lakehouse_spark.catalog import load

    rows = entrymod.queries()["sample_split"](spark, sf_dir).collect()
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    total = sum(r["n"] for r in rows)
    assert total == load(spark, sf_dir, "documents").count()
