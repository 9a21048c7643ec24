"""TxnTable: atomic snapshot commits — the property the reference's staged
Redshift COPY gives its gold layer (glue/bronze_to_silver_openweather.py:
134-148): a reader concurrent with a rewrite never observes a torn table."""

from __future__ import annotations

import os
import shutil
import threading

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.txn import ConcurrentCommitError, TxnTable
from rxlan_aws_lakehouse_spark import warehouse


def _drop(spark, *tables):
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)


def _df(spark, n, tag="a"):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.lit(tag).alias("tag"),
        (F.col("id") % 3).cast("string").alias("dt"),
    )


def test_commit_read_roundtrip_and_history(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    assert t.current_version() is None
    v1 = t.commit(_df(spark, 10))
    assert v1 == "v00000001" and t.read(spark).count() == 10
    v2 = t.commit(_df(spark, 25))
    assert t.current_version() == v2
    assert t.read(spark).count() == 25
    # snapshot read: explicit old version still intact
    assert t.read(spark, v1).count() == 10
    hist = t.history()
    assert [h["version"] for h in hist] == [v1, v2]
    assert hist[1]["parent"] == v1


def test_partition_spec_survives_merge_and_compact(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.commit(_df(spark, 30), partition_by=["dt"])
    updates = _df(spark, 5, tag="upd")
    t.merge_upsert(spark, updates, keys=["k"])
    t.compact(spark)
    # every snapshot dir after the rewrites is still hive-partitioned on dt
    for meta in t.history():
        assert meta["partition_by"] == ["dt"]
    data = os.path.join(t.root, "_versions", t.current_version())
    assert any(d.startswith("dt=") for d in os.listdir(data))
    got = t.read(spark)
    assert got.count() == 30
    assert got.filter(F.col("tag") == "upd").count() == 5


def test_merge_upsert_replaces_and_appends(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.commit(_df(spark, 10))
    updates = spark.range(8, 14).select(
        F.col("id").alias("k"), F.lit("new").alias("tag"),
        F.lit("0").alias("dt"),
    )
    t.merge_upsert(spark, updates, keys=["k"])
    got = t.read(spark)
    assert got.count() == 14  # 10 originals, 2 replaced, 4 appended
    assert got.filter(F.col("tag") == "new").count() == 6


def test_reader_never_sees_torn_table(spark, tmp_path):
    """Interleave snapshot reads with commits: every observed row count must
    be exactly one committed version's count — no partial directories."""
    t = TxnTable(str(tmp_path / "t"))
    sizes = [10, 40, 70, 100, 130]
    t.commit(_df(spark, sizes[0]))
    committed = {sizes[0]}
    lock = threading.Lock()
    stop = threading.Event()
    errors: list[str] = []

    def writer():
        try:
            for n in sizes[1:]:
                # register BEFORE the swap: a reader may legally see the new
                # version the instant the pointer lands
                with lock:
                    committed.add(n)
                t.commit(_df(spark, n))
        finally:
            stop.set()

    w = threading.Thread(target=writer)
    w.start()
    while not stop.is_set():
        n = t.read(spark).count()
        with lock:
            ok = n in committed
        if not ok:
            errors.append(f"torn read: {n} rows not a committed size")
            break
    w.join()
    assert not errors, errors
    assert t.read(spark).count() == sizes[-1]


def test_failed_commit_leaves_pointer_and_no_debris(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    v1 = t.commit(_df(spark, 10))
    # force the next version's write to fail: mode("error") + existing dir
    os.makedirs(os.path.join(t.root, "_versions", "v00000002"))
    with pytest.raises(Exception):
        t.commit(_df(spark, 20))
    assert t.current_version() == v1
    assert t.read(spark).count() == 10
    assert os.listdir(os.path.join(t.root, "_versions")) == [v1]


def test_concurrent_commit_detected(spark, tmp_path):
    t1 = TxnTable(str(tmp_path / "t"))
    t1.commit(_df(spark, 10))
    with pytest.raises(ConcurrentCommitError):
        t1._swap_pointer("v00000009", expect=None)  # stale expectation


def test_vacuum_keeps_live_and_newest(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    for n in (5, 10, 15, 20):
        t.commit(_df(spark, n))
    removed = t.vacuum(keep=2)
    assert removed == ["v00000001", "v00000002"]
    assert t.read(spark).count() == 20
    assert t.read(spark, "v00000003").count() == 15


def test_metastore_merge_upsert_preserves_partitioning(spark, tmp_path):
    tbl = "gold_part_upsert_test"
    _drop(spark, tbl, f"{tbl}__stage")
    _df(spark, 30).write.partitionBy("dt").format("parquet").saveAsTable(tbl)
    updates = _df(spark, 5, tag="upd")
    warehouse.merge_upsert(spark, tbl, updates, keys=["k"])
    part_cols = [c.name for c in spark.catalog.listColumns(tbl) if c.isPartition]
    assert part_cols == ["dt"]
    got = spark.table(tbl)
    assert got.count() == 30
    assert got.filter(F.col("tag") == "upd").count() == 5
    spark.sql(f"DROP TABLE {tbl}")


def test_metastore_merge_upsert_preserves_bucketing(spark, tmp_path):
    tbl = "gold_bucket_upsert_test"
    _drop(spark, tbl, f"{tbl}__stage")
    df = _df(spark, 30)
    df.write.format("parquet").bucketBy(4, "k").sortBy("k").saveAsTable(tbl)
    warehouse.merge_upsert(spark, tbl, _df(spark, 5, tag="upd"), keys=["k"])
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
    info = {r.col_name: (r.data_type or "") for r in rows}
    assert info.get("Num Buckets", "").strip() == "4"
    assert "k" in info.get("Bucket Columns", "")
    assert spark.table(tbl).count() == 30
    spark.sql(f"DROP TABLE {tbl}")
