"""Foreign RESTORE (round 16 — the undo verb on attachments):
``restore_delta`` commits a file-diff that makes the live state equal
to an earlier version (history preserved, CDF synthesizable);
``restore_iceberg`` re-points ``current-snapshot-id`` per the spec's
rollback, O(metadata)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.delta_export import (
    delete_delta,
    export_delta,
    import_delta,
    overwrite_delta,
    read_delta_cdf,
    restore_delta,
    vacuum_delta,
)
from rxlan_aws_lakehouse_spark.iceberg_export import (
    append_iceberg,
    export_iceberg,
    restore_iceberg,
)
from rxlan_aws_lakehouse_spark.iceberg_import import (
    import_iceberg,
    load_table_metadata,
)
from rxlan_aws_lakehouse_spark.txn import TxnTable


def _rows(df):
    return {(r["k"], r["v"]) for r in df.collect()}


def _src(spark, tmp_path, name):
    t = TxnTable(str(tmp_path / f"src_{name}"))
    df = spark.range(10).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 10).cast("long").alias("v"),
    )
    t.commit(df.repartition(2))
    return t


def test_restore_delta_after_overwrite(spark, tmp_path):
    t = _src(spark, tmp_path, "d")
    dest = str(tmp_path / "d")
    export_delta(t, dest)
    base = _rows(import_delta(spark, dest))
    overwrite_delta(
        spark, dest, spark.createDataFrame([(100, -1)], "k LONG, v LONG")
    )
    out = restore_delta(spark, dest, 0)
    assert out["version"] == 2 and out["restored_version"] == 0
    assert out["n_files_added"] >= 2 and out["n_files_removed"] == 1
    assert _rows(import_delta(spark, dest)) == base
    # history preserved: the overwritten state still time-travels
    assert _rows(import_delta(spark, dest, version=1)) == {(100, -1)}
    # CDF synthesis across the restore commit
    cdf = read_delta_cdf(spark, dest, starting_commit=2)
    got = {(r["k"], r["_change_type"]) for r in cdf.collect()}
    assert (100, "delete") in got and len(
        {k for k, c in got if c == "insert"}
    ) == 10


def test_restore_delta_dv_swap_and_refusals(spark, tmp_path):
    t = _src(spark, tmp_path, "dv")
    dest = str(tmp_path / "dv")
    export_delta(t, dest)
    base = _rows(import_delta(spark, dest))
    delete_delta(spark, dest, "k % 2 = 0", mode="dv")
    # restore un-deletes: the DV-bearing incarnations swap back
    out = restore_delta(spark, dest, 0)
    assert _rows(import_delta(spark, dest)) == base
    assert out["n_files_added"] == out["n_files_removed"] == 2
    with pytest.raises(ValueError, match="not in the log"):
        restore_delta(spark, dest, 99)


def test_restore_delta_vacuumed_refuses(spark, tmp_path):
    t = _src(spark, tmp_path, "vac")
    dest = str(tmp_path / "vac")
    export_delta(t, dest)
    overwrite_delta(
        spark, dest, spark.createDataFrame([(100, -1)], "k LONG, v LONG")
    )
    vacuum_delta(spark, dest, retain_hours=0)
    with pytest.raises(ValueError, match="vacuumed"):
        restore_delta(spark, dest, 0)


def test_restore_iceberg_rollback_and_forward(spark, tmp_path):
    t = _src(spark, tmp_path, "i")
    dest = str(tmp_path / "i")
    export_iceberg(t, dest)
    base = _rows(import_iceberg(spark, dest))
    s0 = load_table_metadata(dest)["current-snapshot-id"]
    append_iceberg(
        spark, dest, spark.createDataFrame([(100, -1)], "k LONG, v LONG")
    )
    s1 = load_table_metadata(dest)["current-snapshot-id"]
    out = restore_iceberg(spark, dest, s0)
    assert out["previous_snapshot_id"] == s1
    assert _rows(import_iceberg(spark, dest)) == base
    # roll FORWARD works the same way (snapshots list untouched)
    restore_iceberg(spark, dest, s1)
    assert _rows(import_iceberg(spark, dest)) == base | {(100, -1)}
    with pytest.raises(ValueError, match="not in the table"):
        restore_iceberg(spark, dest, 12345)


def test_sql_restore_foreign(spark, tmp_path):
    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter

    t = _src(spark, tmp_path, "sql")
    ddest, idest = str(tmp_path / "sd"), str(tmp_path / "si")
    export_delta(t, ddest)
    export_iceberg(t, idest)
    router = TxnSqlRouter(spark)
    router.sql(f"CREATE TABLE fd USING DELTA_IMPORT LOCATION '{ddest}'")
    router.sql(
        f"CREATE TABLE fi USING ICEBERG_IMPORT LOCATION '{idest}'"
    )
    router.sql("DELETE FROM fd WHERE k < 5")
    out = router.sql("RESTORE TABLE fd TO VERSION AS OF 0").collect()[0]
    assert out["operation"] == "restore_foreign_delta"
    assert (
        router.sql("SELECT count(*) AS n FROM fd").collect()[0]["n"]
        == 10
    )
    s0 = load_table_metadata(idest)["current-snapshot-id"]
    router.sql("INSERT INTO fi VALUES (100, -1)")
    out = router.sql(
        f"RESTORE TABLE fi TO VERSION AS OF {s0}"
    ).collect()[0]
    assert out["operation"] == "restore_foreign_iceberg"
    assert (
        router.sql("SELECT count(*) AS n FROM fi").collect()[0]["n"]
        == 10
    )
    router.sql("DROP TABLE fd")
    router.sql("DROP TABLE fi")
