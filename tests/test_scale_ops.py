"""Tests for scale infrastructure: salting, warehouse/compaction, approx
sketches (tolerance-checked — sketches can't hash-match an exact oracle)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.catalog import load
from rxlan_aws_lakehouse_spark.ops.salting import salted_agg, salted_join
from rxlan_aws_lakehouse_spark.warehouse import (
    compact_partitions,
    create_bucketed_table,
    create_gold_table,
    merge_upsert,
    partition_file_stats,
)


def test_salted_agg_matches_plain(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    plain = {
        r["event_type"]: (r["n"], r["mx"])
        for r in e.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["mx"])
        for r in salted_agg(
            e,
            ["event_type"],
            {"n": ("count", F.col("value")), "mx": ("max", F.col("value"))},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, "l_orderkey").count()
    assert salted_join(li, o, ["l_orderkey"], salt_buckets=4).count() == plain
    # left join keeps unmatched skewed rows exactly once
    o_half = o.filter(F.col("l_orderkey") % 2 == 0)
    plain_left = li.join(o_half, "l_orderkey", "left").count()
    assert salted_join(li, o_half, ["l_orderkey"], how="left", salt_buckets=4).count() == plain_left


def test_salted_join_rejects_right_outer(spark, sf_dir):
    import pytest

    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("l_orderkey"))
    for bad in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(li, o, ["l_orderkey"], how=bad)


def test_gold_table_and_analyze(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS gold_test")
    df = spark.createDataFrame(
        [("Austin", "2024-03-01T10:05:00Z", "2024-03-01", "10", 20.0)],
        "city string, fetched_at_utc string, dt string, hour string, temp_c double",
    )
    create_gold_table(spark, df, "gold_test")
    assert spark.table("gold_test").count() == 1
    # stats recorded (ANALYZE ran)
    stats = spark.sql("DESCRIBE EXTENDED gold_test").filter(
        F.col("col_name") == "Statistics"
    )
    assert stats.count() == 1
    spark.sql("DROP TABLE gold_test")


def test_compaction_reduces_files(spark, tmp_path):
    path = str(tmp_path / "gold")
    df = spark.range(2000).select(
        F.concat(F.lit("c"), (F.col("id") % 7).cast("string")).alias("city"),
        F.lit("x").alias("fetched_at_utc"),
        F.col("id").cast("double").alias("v"),
        F.lit("2024-03-01").alias("dt"),
        F.lit("10").alias("hour"),
    )
    # fragment: many small files in one partition
    df.repartition(24).write.partitionBy("dt", "hour").parquet(path)
    before = partition_file_stats(spark, path).agg(F.sum("n_files")).head()[0]
    assert before >= 24

    n = compact_partitions(spark, path, dt="2024-03-01", hour="10")
    assert n == 1
    after = partition_file_stats(spark, path).agg(F.sum("n_files")).head()[0]
    assert after == 1
    out = spark.read.option("basePath", path).parquet(path)
    assert out.count() == 2000  # no data loss


def test_merge_upsert_ddb_putitem_semantics(spark):
    """PutItem by (pk, sk): same key replaces, new key appends."""
    spark.sql("DROP TABLE IF EXISTS upsert_test")
    spark.sql("DROP TABLE IF EXISTS upsert_test__stage")
    base = spark.createDataFrame(
        [("Austin", "t1", 10.0), ("Austin", "t2", 11.0), ("Chicago", "t1", 5.0)],
        "pk string, sk string, v double",
    )
    base.write.format("parquet").saveAsTable("upsert_test")
    updates = spark.createDataFrame(
        [("Austin", "t2", 99.0), ("Denver", "t1", 7.0)],
        "pk string, sk string, v double",
    )
    merge_upsert(spark, "upsert_test", updates, keys=["pk", "sk"])
    got = {(r["pk"], r["sk"]): r["v"] for r in spark.table("upsert_test").collect()}
    assert got == {
        ("Austin", "t1"): 10.0,
        ("Austin", "t2"): 99.0,  # replaced
        ("Chicago", "t1"): 5.0,
        ("Denver", "t1"): 7.0,  # appended
    }
    # idempotent: re-applying the same updates changes nothing
    merge_upsert(spark, "upsert_test", updates, keys=["pk", "sk"])
    assert spark.table("upsert_test").count() == 4
    spark.sql("DROP TABLE upsert_test")


def test_merge_upsert_recovers_from_crash_between_drop_and_rename(spark):
    """Simulate a crash in the shim's DROP->RENAME window: target gone,
    __stage holds the complete merged result. The next merge_upsert must
    first promote the stage automatically (no data loss, no manual step)."""
    from rxlan_aws_lakehouse_spark.warehouse import recover_stage

    spark.sql("DROP TABLE IF EXISTS crash_test")
    spark.sql("DROP TABLE IF EXISTS crash_test__stage")
    merged = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "pk string, v double"
    )
    # crashed predecessor state: stage written, target already dropped
    merged.write.format("parquet").saveAsTable("crash_test__stage")
    assert not spark.catalog.tableExists("crash_test")

    assert recover_stage(spark, "crash_test") is True
    assert spark.catalog.tableExists("crash_test")
    assert spark.table("crash_test").count() == 2

    # and the merge path itself performs the recovery when called cold
    spark.sql("ALTER TABLE crash_test RENAME TO crash_test__stage")
    updates = spark.createDataFrame([("b", 9.0)], "pk string, v double")
    merge_upsert(spark, "crash_test", updates, keys=["pk"])
    got = {r["pk"]: r["v"] for r in spark.table("crash_test").collect()}
    assert got == {"a": 1.0, "b": 9.0}
    spark.sql("DROP TABLE crash_test")


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on the join key join without any shuffle —
    the pay-once co-location strategy for repeated fact-fact joins."""
    import shutil

    from rxlan_aws_lakehouse_spark.catalog import load

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a previously failed run can leave the managed location behind
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    create_bucketed_table(
        spark, load(spark, sf_dir, "orders"), "b_orders", "o_orderkey", 8
    )
    create_bucketed_table(
        spark,
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem",
        "l_orderkey",
        8,
    )
    # disable broadcast so the planner must consider the shuffle it would
    # otherwise need — bucketing removes it
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # no shuffle: co-located
        assert "Bucketed: true" in plan
        assert joined.count() == load(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")


def test_parquet_schema_evolution(spark, tmp_path):
    """Adding a column to a partitioned table must not break old readers:
    mergeSchema unions the schemas, old files read NULL for the new col."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame(
        [("Austin", 20.0, "2024-03-01", "10")],
        "city string, temp_c double, dt string, hour string",
    )
    v1.write.partitionBy("dt", "hour").parquet(path)
    v2 = spark.createDataFrame(
        [("Chicago", 5.0, 55, "2024-03-01", "11")],
        "city string, temp_c double, humidity int, dt string, hour string",
    )
    v2.write.mode("append").partitionBy("dt", "hour").parquet(path)
    out = spark.read.option("mergeSchema", "true").option("basePath", path).parquet(path)
    assert "humidity" in out.columns
    rows = {r["city"]: r for r in out.collect()}
    assert rows["Austin"]["humidity"] is None  # old file: typed NULL
    assert rows["Chicago"]["humidity"] == 55


def test_approx_sketches_within_tolerance(spark, sf_dir):
    """approx_count_distinct (HLL++) and approx_percentile (t-digest-ish):
    the 100 TB substitutes for exact distinct/percentile. Tolerance-checked
    because sketches are estimation, not computation."""
    e = load(spark, sf_dir, "events")
    exact = e.agg(
        F.count_distinct("user_id").alias("d"),
        F.percentile("value", 0.5).alias("p50"),
    ).head()
    approx = e.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("d"),
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
    ).head()
    assert abs(approx["d"] - exact["d"]) <= max(2, 0.05 * exact["d"])
    assert abs(approx["p50"] - exact["p50"]) <= 0.02 * max(1.0, abs(exact["p50"]))


def test_hll_sketches_merge_exactly_like_one_pass(spark):
    """Mergeable distinct-count sketches (Apache DataSketches HLL via the
    built-in hll_sketch_agg/hll_union_agg): partial sketches built per
    partition-slice and UNIONED must yield the IDENTICAL estimate as one
    global pass — the property that lets 1000 executors pre-aggregate
    distincts and a coordinator merge |slices| tiny buffers instead of
    reshuffling 100 TB of raw keys. Estimate accuracy asserted vs exact."""
    from pyspark.sql import functions as F

    df = spark.range(2_000_000).select(
        (F.col("id") % 250_000).alias("k"),
        (F.col("id") % 8).alias("slice"),
    )
    one_pass = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("est")
    ).first()["est"]
    merged = (
        df.groupBy("slice")
        .agg(F.hll_sketch_agg("k").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    assert merged == one_pass  # merge-invariance, bit-exact
    assert abs(merged - 250_000) / 250_000 < 0.05  # sketch accuracy
