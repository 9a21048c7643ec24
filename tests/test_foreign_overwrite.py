"""Foreign INSERT OVERWRITE (round 16 — ``overwrite_delta`` /
``overwrite_iceberg`` + the SQL verb): ONE commit tombstones every
live file and lands the new rows as fresh adds; CDF readers
synthesize delete/insert rows from the protocol's dataChange rule;
streaming tails refuse the commit (an overwrite retracts rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.delta_export import (
    delete_delta,
    export_delta,
    import_delta,
    overwrite_delta,
    read_delta_cdf,
    replay_delta_log,
)
from rxlan_aws_lakehouse_spark.iceberg_export import (
    export_iceberg,
    overwrite_iceberg,
)
from rxlan_aws_lakehouse_spark.iceberg_import import (
    iceberg_live_files,
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


NEW = [(100, -1), (101, -2), (102, -3)]


def test_overwrite_delta_replaces_all(spark, tmp_path):
    t = _src(spark, tmp_path, "d")
    dest = str(tmp_path / "d")
    export_delta(t, dest)
    new = spark.createDataFrame(NEW, "k LONG, v LONG")
    out = overwrite_delta(spark, dest, new)
    assert out["n_files_removed"] >= 2 and out["n_rows"] == 3
    assert _rows(import_delta(spark, dest)) == set(NEW)
    # time travel still reads the pre-overwrite rows
    assert len(_rows(import_delta(spark, dest, version=0))) == 10
    # CDF synthesis: the overwrite commit derives 10 deletes + 3 inserts
    cdf = read_delta_cdf(spark, dest, starting_commit=out["version"])
    got = {
        (r["k"], r["_change_type"]) for r in cdf.collect()
    }
    assert sum(1 for _, c in got if c == "delete") == 10
    assert {k for k, c in got if c == "insert"} == {100, 101, 102}


def test_overwrite_delta_carries_dv_on_removes(spark, tmp_path):
    t = _src(spark, tmp_path, "dv")
    dest = str(tmp_path / "dv")
    export_delta(t, dest)
    delete_delta(spark, dest, "k % 2 = 0", mode="dv")
    new = spark.createDataFrame(NEW, "k LONG, v LONG")
    overwrite_delta(spark, dest, new)
    assert _rows(import_delta(spark, dest)) == set(NEW)
    state = replay_delta_log(dest)
    assert not any(
        a.get("deletionVector") for a in state["adds"].values()
    )


def test_overwrite_delta_refusals(spark, tmp_path):
    t = _src(spark, tmp_path, "ref")
    dest = str(tmp_path / "ref")
    export_delta(t, dest)
    bad = spark.createDataFrame([(1, 2.0)], "k LONG, zz DOUBLE")
    with pytest.raises(ValueError, match="do not match"):
        overwrite_delta(spark, dest, bad)


def test_overwrite_iceberg_replaces_all_and_truncates(spark, tmp_path):
    t = _src(spark, tmp_path, "i")
    dest = str(tmp_path / "i")
    export_iceberg(t, dest)
    new = spark.createDataFrame(NEW, "k LONG, v LONG")
    out = overwrite_iceberg(spark, dest, new)
    assert out["n_files_removed"] >= 2 and out["n_rows"] == 3
    assert _rows(import_iceberg(spark, dest)) == set(NEW)
    snaps = load_table_metadata(dest)["snapshots"]
    assert snaps[-1]["summary"]["operation"] == "overwrite"
    # empty overwrite = truncate
    out2 = overwrite_iceberg(
        spark, dest, spark.createDataFrame([], "k LONG, v LONG")
    )
    assert out2["n_files"] == 0 and out2["n_files_removed"] == len(
        [None] * out["n_files"]
    )
    assert not iceberg_live_files(dest)["files"]
    assert import_iceberg(spark, dest).count() == 0


def test_sql_insert_overwrite_foreign(spark, tmp_path):
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
    out = router.sql(
        "INSERT OVERWRITE fd VALUES (7, 70), (8, 80)"
    ).collect()[0]
    assert out["operation"] == "overwrite_foreign_delta"
    assert {
        (r["k"], r["v"])
        for r in router.sql("SELECT k, v FROM fd").collect()
    } == {(7, 70), (8, 80)}
    out = router.sql(
        "INSERT OVERWRITE fi SELECT k, v FROM fd"
    ).collect()[0]
    assert out["operation"] == "overwrite_foreign_iceberg"
    assert {
        (r["k"], r["v"])
        for r in router.sql("SELECT k, v FROM fi").collect()
    } == {(7, 70), (8, 80)}
    router.sql("DROP TABLE fd")
    router.sql("DROP TABLE fi")


def test_sql_truncate_native_and_foreign(spark, tmp_path):
    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter

    t = _src(spark, tmp_path, "tr")
    ddest, idest = str(tmp_path / "td"), str(tmp_path / "ti")
    export_delta(t, ddest)
    export_iceberg(t, idest)
    router = TxnSqlRouter(spark)
    router.register("nt", t)
    out = router.sql("TRUNCATE TABLE nt").collect()[0]
    assert out["operation"] == "truncate"
    assert (
        router.sql("SELECT count(*) AS n FROM nt").collect()[0]["n"]
        == 0
    )
    router.sql(f"CREATE TABLE fd USING DELTA_IMPORT LOCATION '{ddest}'")
    router.sql(
        f"CREATE TABLE fi USING ICEBERG_IMPORT LOCATION '{idest}'"
    )
    out = router.sql("TRUNCATE TABLE fd").collect()[0]
    assert out["operation"] == "truncate_foreign_delta"
    assert (
        router.sql("SELECT count(*) AS n FROM fd").collect()[0]["n"]
        == 0
    )
    out = router.sql("TRUNCATE TABLE fi").collect()[0]
    assert out["operation"] == "truncate_foreign_iceberg"
    assert (
        router.sql("SELECT count(*) AS n FROM fi").collect()[0]["n"]
        == 0
    )
    # history intact: version 0 still reads 10 rows on the delta side
    assert len(_rows(import_delta(spark, ddest, version=0))) == 10
    router.sql("DROP TABLE fd")
    router.sql("DROP TABLE fi")
