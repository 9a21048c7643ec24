"""Incremental materialized aggregate: change-feed refresh vs full recompute."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.ops.incremental import IncrementalAggregate
from rxlan_aws_lakehouse_spark.txn import TxnTable


def _batch(spark, lo, n, tag="a"):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") * 2).cast("double").alias("v"),
        F.lit(tag).alias("tag"),
    )


def _expected(spark, source):
    return {
        (r["grp"], r["n_rows"], r["sum_v"])
        for r in source.read(spark)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .collect()
    }


def _got(spark, inc):
    return {
        (r["grp"], r["n_rows"], r["sum_v"])
        for r in inc.read(spark).collect()
    }


def test_incremental_refresh_tracks_appends(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    src.commit(_batch(spark, 0, 50))
    inc = IncrementalAggregate(src, str(tmp_path / "agg"), ["grp"], ["v"])
    assert inc.refresh(spark) is not None
    assert _got(spark, inc) == _expected(spark, src)
    # already current: no-op, cursor check short-circuits
    assert inc.refresh(spark) is None

    src.append(_batch(spark, 50, 30, tag="b"))
    src.append(_batch(spark, 80, 7, tag="c"))
    v = inc.refresh(spark)
    assert v is not None
    assert _got(spark, inc) == _expected(spark, src)
    # the fold was a merge commit, not a full rebuild
    assert inc.target._meta(v)["operation"] == "merge_upsert"
    # cursor rode inside the same commit (exactly-once coupling)
    assert inc.cursor() == src.current_version()


def test_incremental_reads_only_the_delta_files(spark, tmp_path):
    """The refresh consumes the change feed — bytes proportional to the
    appended batch, never a source re-scan. Proven by dropping the source's
    ORIGINAL data files from disk: only the appended files remain readable,
    and the incremental refresh still succeeds."""
    src = TxnTable(str(tmp_path / "src"))
    v1 = src.commit(_batch(spark, 0, 50).coalesce(1))
    inc = IncrementalAggregate(src, str(tmp_path / "agg"), ["grp"], ["v"])
    inc.refresh(spark)
    src.append(_batch(spark, 50, 10, tag="b").coalesce(1))
    # simulate expired base files: remove v1's data file payloads
    root = os.path.join(src.root, "_versions", v1)
    for r, _d, ns in os.walk(root):
        for n in ns:
            if n.endswith(".parquet"):
                os.truncate(os.path.join(r, n), 0)
    v = inc.refresh(spark)
    assert v is not None
    agg = {r["grp"]: r["n_rows"] for r in inc.read(spark).collect()}
    assert sum(agg.values()) == 60


def test_non_append_history_falls_back_to_full_recompute(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    src.commit(_batch(spark, 0, 50))
    inc = IncrementalAggregate(src, str(tmp_path / "agg"), ["grp"], ["v"])
    inc.refresh(spark)
    # rewrite history under the rollup: SCD1 update of 3 keys
    upd = _batch(spark, 0, 3, tag="upd").withColumn(
        "v", F.col("v") + F.lit(1000.0)
    )
    src.merge_upsert(spark, upd, keys=["k"])
    v = inc.refresh(spark)
    assert inc.target._meta(v)["operation"] == "incremental_full"
    assert _got(spark, inc) == _expected(spark, src)
    # back to incremental for subsequent appends
    src.append(_batch(spark, 100, 10, tag="d"))
    v2 = inc.refresh(spark)
    assert inc.target._meta(v2)["operation"] == "merge_upsert"
    assert _got(spark, inc) == _expected(spark, src)


def test_aggregate_table_merge_is_file_granular(spark, tmp_path):
    """An append touching one group rewrites only that group's aggregate
    file — untouched groups' files carry by reference."""
    src = TxnTable(str(tmp_path / "src"))
    src.commit(_batch(spark, 0, 50))
    inc = IncrementalAggregate(src, str(tmp_path / "agg"), ["grp"], ["v"])
    inc.refresh(spark)
    # repartition the aggregate by group so groups live in separate files
    t = inc.target
    t.commit(t.read(spark).repartition(5, "grp"))
    # delta hits group '0' only (ids 50,55 -> grp 0... id%5: 50->0, 55->0)
    src.append(
        spark.createDataFrame(
            [(1000, "0", 8.0, "e")], "k long, grp string, v double, tag string"
        )
    )
    v = inc.refresh(spark)
    meta = inc.target._meta(v)
    assert meta["n_files_carried"] >= 3  # most group files untouched
    assert _got(spark, inc) == _expected(spark, src)


def test_min_max_aggregates_fold_incrementally(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    src.commit(_batch(spark, 0, 40))
    inc = IncrementalAggregate(
        src, str(tmp_path / "agg"), ["grp"], ["v"],
        min_cols=["v"], max_cols=["v"],
    )
    inc.refresh(spark)
    src.append(_batch(spark, 40, 25, tag="b"))
    inc.refresh(spark)
    want = {
        (r["grp"], r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
        for r in src.read(spark)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    got = {
        (r["grp"], r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
        for r in inc.read(spark).collect()
    }
    assert got == want


def test_transform_enables_incremental_join_aggregate(spark, tmp_path):
    """Round 8: the row-local transform hook makes incremental
    JOIN+aggregate views expressible — each delta is broadcast-enriched
    against a fixed dimension before aggregation, and the maintained
    rollup equals the full recompute of agg(fact ⋈ dim) after every
    refresh, including the full-recompute fallback path."""
    dim = spark.createDataFrame(
        [(str(i), f"region_{i % 2}") for i in range(5)],
        "grp string, region string",
    )

    def enrich(df):
        return df.join(F.broadcast(dim), "grp")

    src = TxnTable(str(tmp_path / "src"))
    src.commit(_batch(spark, 0, 40))
    inc = IncrementalAggregate(
        src,
        str(tmp_path / "agg"),
        group_cols=["region"],
        sum_cols=["v"],
        transform=enrich,
    )
    inc.refresh(spark)

    def expected():
        return {
            (r["region"], r["n_rows"], r["sum_v"])
            for r in src.read(spark)
            .join(F.broadcast(dim), "grp")
            .groupBy("region")
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
            .collect()
        }

    def got():
        return {
            (r["region"], r["n_rows"], r["sum_v"])
            for r in inc.read(spark).collect()
        }

    assert got() == expected()
    src.append(_batch(spark, 40, 25, tag="b"))
    inc.refresh(spark)
    assert got() == expected()
    # non-append history (delete) -> full recompute path, still enriched
    src.delete_where(spark, F.col("k") < 10)
    inc.refresh(spark)
    assert got() == expected()
