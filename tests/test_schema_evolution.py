"""ALTER TABLE / CTAS / persistent catalog (round 11).

SQL-first schema evolution (r10 verdict task 2): ``ALTER TABLE ADD
COLUMNS`` must be a METADATA-ONLY commit (the machinery additive
``mergeSchema`` writes already use, txn.py — carried files read the new
columns as typed NULLs), ``RENAME COLUMN`` an atomic rewrite (no
id-based column mapping in this format, so metadata-only rename is
impossible without lying to the parquet footers), CTAS one planned
write, and every non-additive ALTER a loud error. Plus the persistent
catalog (task 4): name→root mappings that survive the session.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter
from rxlan_aws_lakehouse_spark.txn import TxnTable


def _fresh(spark, tmp_path, n=50):
    t = TxnTable(str(tmp_path / "t"))
    t.commit(
        spark.range(n).select(
            F.col("id"), (F.col("id") * 2.0).alias("v")
        )
    )
    return t


# -- TxnTable.add_columns ------------------------------------------------


def test_add_columns_is_metadata_only(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    files_before = t.files()
    v = t.add_columns(spark, "tag STRING, score DOUBLE")
    assert t.files(v) == files_before  # every file carried by reference
    meta = t._meta(v)
    assert meta["n_files_written"] == 0
    assert meta["operation"] == "add_columns"
    assert meta["extra"]["columns_added"] == ["tag", "score"]
    df = t.read(spark)
    assert df.columns == ["id", "v", "tag", "score"]
    # carried files read the new columns as typed NULLs
    row = df.filter(F.col("id") == 1).collect()[0]
    assert row["tag"] is None and row["score"] is None
    assert dict(df.dtypes)["score"] == "double"


def test_add_columns_rejects_existing_and_duplicates(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    with pytest.raises(ValueError, match="already exist"):
        t.add_columns(spark, "V INT")  # case-insensitive clash
    with pytest.raises(ValueError, match="duplicate"):
        t.add_columns(spark, "a INT, A STRING")
    with pytest.raises(ValueError, match="at least one"):
        t.add_columns(spark, [])


def test_add_columns_then_write_and_time_travel(spark, tmp_path):
    t = _fresh(spark, tmp_path, n=10)
    pre = t.current_version()
    t.add_columns(spark, "tag STRING")
    t.append(
        spark.range(10, 20).select(
            F.col("id"), (F.col("id") * 2.0).alias("v"),
            F.lit("new").alias("tag"),
        )
    )
    df = t.read(spark)
    assert df.count() == 20
    assert df.filter(F.col("tag") == "new").count() == 10
    assert df.filter(F.col("tag").isNull()).count() == 10
    # time travel BEFORE the ALTER: the old schema, not the evolved one
    assert t.read(spark, pre).columns == ["id", "v"]


# -- TxnTable.rename_column ----------------------------------------------


def test_rename_column_rewrites_atomically(spark, tmp_path):
    t = _fresh(spark, tmp_path, n=30)
    pre = t.current_version()
    v = t.rename_column(spark, "v", "doubled")
    df = t.read(spark)
    assert df.columns == ["id", "doubled"]
    assert df.agg(F.sum("doubled")).collect()[0][0] == sum(
        i * 2.0 for i in range(30)
    )
    assert t._meta(v)["extra"]["column_renamed"] == ["v", "doubled"]
    # pre-rename snapshot still reads under its own schema
    assert t.read(spark, pre).columns == ["id", "v"]


def test_rename_column_refusals(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    with pytest.raises(ValueError, match="equal"):
        t.rename_column(spark, "v", "V")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column(spark, "ghost", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column(spark, "v", "id")
    t.add_check_constraint(spark, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.rename_column(spark, "v", "w")


def test_rename_partition_column_renames_spec(spark, tmp_path):
    t = TxnTable(str(tmp_path / "p"))
    t.commit(
        spark.range(40).select(
            F.col("id"), (F.col("id") % 4).alias("bucket")
        ),
        partition_by=["bucket"],
    )
    t.rename_column(spark, "bucket", "grp")
    assert t._meta(t.current_version())["partition_by"] == ["grp"]
    df = t.read(spark)
    assert df.groupBy("grp").count().count() == 4
    assert all("grp=" in rel for rel in t.files())


# -- router: ALTER / CTAS / SHOW TABLES ------------------------------------


def test_router_alter_add_and_rename(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    router = TxnSqlRouter(spark)
    router.register("evo", t)
    router.sql("ALTER TABLE evo ADD COLUMNS (tag STRING)")
    assert spark.table("evo").columns == ["id", "v", "tag"]
    router.sql("ALTER TABLE evo RENAME COLUMN tag TO label")
    assert spark.table("evo").columns == ["id", "v", "label"]
    with pytest.raises(ValueError, match="only additive"):
        router.sql("ALTER TABLE evo DROP COLUMN label")
    with pytest.raises(ValueError, match="not a supported widening"):
        router.sql("ALTER TABLE evo ALTER COLUMN v TYPE STRING")


def test_router_ctas(spark, tmp_path):
    router = TxnSqlRouter(spark)
    spark.range(25).selectExpr(
        "id", "id % 5 AS g", "id * 1.5 AS x"
    ).createOrReplaceTempView("ctas_src")
    root = str(tmp_path / "c")
    router.sql(
        "CREATE TABLE ctas_t USING TXN PARTITIONED BY (g) "
        f"LOCATION '{root}' AS SELECT * FROM ctas_src"
    )
    t = TxnTable(root)
    assert t._meta(t.current_version())["operation"] == "ctas"
    assert t._meta(t.current_version())["partition_by"] == ["g"]
    got = spark.table("ctas_t")
    assert got.count() == 25
    assert got.agg(F.sum("x")).collect()[0][0] == sum(
        i * 1.5 for i in range(25)
    )
    # schema history: DESCRIBE HISTORY surfaces per-snapshot columns
    router.sql("ALTER TABLE ctas_t ADD COLUMNS (note STRING)")
    hist = {
        r["version"]: r
        for r in router.sql("DESCRIBE HISTORY ctas_t").collect()
    }
    assert hist["v00000001"]["n_cols"] == 3
    assert hist["v00000002"]["added_columns"] == "note"
    assert hist["v00000002"]["n_cols"] == 4


def test_router_create_needs_columns_or_select(spark, tmp_path):
    router = TxnSqlRouter(spark)
    with pytest.raises(ValueError, match="column list or AS SELECT"):
        router.sql(
            f"CREATE TABLE nope USING TXN LOCATION '{tmp_path}/n'"
        )


# -- persistent catalog ----------------------------------------------------


def test_catalog_survives_sessions(spark, tmp_path):
    cat = str(tmp_path / "cat")
    t = _fresh(spark, tmp_path)
    r1 = TxnSqlRouter(spark, catalog_dir=cat)
    r1.register("persisted", t)
    assert os.path.exists(os.path.join(cat, "persisted.json"))

    # a FRESH router (new session in deployment terms) resolves the name
    # from the catalog dir alone and can run DML against it
    r2 = TxnSqlRouter(spark, catalog_dir=cat)
    assert r2.sql("SELECT count(*) AS n FROM persisted").collect()[0][
        "n"
    ] == 50
    spark.createDataFrame(
        [(1, 999.0)], "id long, v double"
    ).createOrReplaceTempView("cat_updates")
    r2.sql(
        "MERGE INTO persisted t USING cat_updates s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert t.read(spark).filter(
        F.col("id") == 1
    ).collect()[0]["v"] == 999.0

    rows = {r["name"]: r for r in r2.sql("SHOW TABLES").collect()}
    assert rows["persisted"]["location"] == t.root
    assert rows["persisted"]["version"] == t.current_version()

    # DROP removes the catalog entry; a third session no longer sees it
    r2.sql("DROP TABLE persisted")
    assert not os.path.exists(os.path.join(cat, "persisted.json"))
    r3 = TxnSqlRouter(spark, catalog_dir=cat)
    with pytest.raises(ValueError, match="not a registered"):
        r3.sql("DELETE FROM persisted WHERE id = 1")


def test_use_statement_attaches_catalog(spark, tmp_path):
    cat = str(tmp_path / "cat2")
    t = _fresh(spark, tmp_path)
    TxnSqlRouter(spark, catalog_dir=cat).register("via_use", t)
    router = TxnSqlRouter(spark)
    with pytest.raises(ValueError, match="not a registered"):
        router.sql("DESCRIBE HISTORY via_use")
    out = router.sql(f"USE '{cat}'").collect()[0]
    assert (out["operation"], out["version"]) == ("use_catalog", "1")
    assert router.sql("DESCRIBE HISTORY via_use").count() >= 1


def test_torn_catalog_entry_is_skipped(spark, tmp_path):
    cat = str(tmp_path / "cat3")
    os.makedirs(cat)
    with open(os.path.join(cat, "broken.json"), "w") as f:
        f.write('{"name": "broken"')  # torn write: no root, bad JSON
    router = TxnSqlRouter(spark, catalog_dir=cat)
    assert router.sql("SHOW TABLES").count() == 0


def test_describe_detail(spark, tmp_path):
    """DESCRIBE DETAIL: one manifest-only summary row (Delta analogue)."""
    t = TxnTable(str(tmp_path / "d"))
    t.commit(
        spark.range(40).select(
            F.col("id"), (F.col("id") % 2).alias("g")
        ),
        partition_by=["g"],
    )
    t.add_check_constraint(spark, "id_pos", "id >= 0")
    t.delete_where_deferred(spark, F.col("id") == 5)
    router = TxnSqlRouter(spark)
    router.register("det", t)
    row = router.sql("DESCRIBE DETAIL det").collect()[0]
    assert row["format"] == "txn"
    assert row["location"] == t.root
    assert row["version"] == t.current_version()
    assert row["num_files"] == len(t.files())
    assert row["num_rows"] == 40  # manifest counts keep suppressed rows
    assert row["partition_columns"] == ["g"]
    assert row["n_cols"] == 2
    assert row["check_constraints"] == ["id_pos"]
    assert row["cdf_enabled"] is False
    assert row["has_deletion_vectors"] is True


# -- type widening ----------------------------------------------------------


def test_widen_column_type_is_metadata_only(spark, tmp_path):
    t = TxnTable(str(tmp_path / "w"))
    t.commit(
        spark.range(30).selectExpr(
            "CAST(id AS INT) AS a", "CAST(id AS FLOAT) AS b"
        )
    )
    files_before = t.files()
    v = t.widen_column_type(spark, "a", "BIGINT")
    t.widen_column_type(spark, "b", "DOUBLE")
    assert t.files(v) == files_before
    meta = t._meta(v)
    assert meta["n_files_written"] == 0
    assert meta["operation"] == "widen_type"
    assert meta["extra"]["type_widened"] == ["a", "integer", "long"]
    df = t.read(spark)
    assert dict(df.dtypes) == {"a": "bigint", "b": "double"}
    # narrow on-disk values upcast exactly
    assert df.agg(F.sum("a")).collect()[0][0] == sum(range(30))
    # mixed generations: append WIDE data, both read under one schema
    t.append(
        spark.range(30, 40).selectExpr(
            "id AS a", "CAST(id AS DOUBLE) AS b"
        )
    )
    assert t.read(spark).count() == 40
    assert t.read(spark).agg(F.sum("b")).collect()[0][0] == sum(
        float(i) for i in range(40)
    )


def test_widen_refusals_and_idempotence(spark, tmp_path):
    t = TxnTable(str(tmp_path / "w"))
    t.commit(
        spark.range(10).selectExpr(
            "id AS a", "CAST(id AS INT) AS g"
        ).repartition("g"),
        partition_by=["g"],
    )
    with pytest.raises(ValueError, match="not a supported widening"):
        t.widen_column_type(spark, "a", "INT")  # narrowing
    with pytest.raises(ValueError, match="not a supported widening"):
        t.widen_column_type(spark, "a", "DOUBLE")  # long->double lossy
    with pytest.raises(ValueError, match="partition/generated"):
        t.widen_column_type(spark, "g", "BIGINT")
    with pytest.raises(ValueError, match="no column"):
        t.widen_column_type(spark, "ghost", "BIGINT")
    v = t.current_version()
    assert t.widen_column_type(spark, "a", "BIGINT") == v  # idempotent


def test_router_widen_and_time_travel(spark, tmp_path):
    t = TxnTable(str(tmp_path / "w"))
    t.commit(spark.range(20).selectExpr("CAST(id AS INT) AS a"))
    pre = t.current_version()
    router = TxnSqlRouter(spark)
    router.register("wt", t)
    row = router.sql("ALTER TABLE wt ALTER COLUMN a TYPE BIGINT").collect()[0]
    assert row["operation"] == "widen_type"
    assert dict(spark.table("wt").dtypes) == {"a": "bigint"}
    # the pre-widen snapshot keeps its narrow schema (time travel)
    assert dict(t.read(spark, pre).dtypes) == {"a": "int"}


def test_router_add_drop_constraint(spark, tmp_path):
    from rxlan_aws_lakehouse_spark.txn import ConstraintViolationError

    t = _fresh(spark, tmp_path)
    router = TxnSqlRouter(spark)
    router.register("ck", t)
    row = router.sql(
        "ALTER TABLE ck ADD CONSTRAINT v_nonneg CHECK (v >= 0)"
    ).collect()[0]
    assert row["operation"] == "add_constraint"
    assert t.constraints() == {"v_nonneg": "v >= 0"}
    # the constraint is ENFORCED on the SQL write path
    spark.createDataFrame(
        [(999, -5.0)], "id long, v double"
    ).createOrReplaceTempView("bad_rows")
    with pytest.raises(ConstraintViolationError):
        router.sql("INSERT INTO ck SELECT * FROM bad_rows")
    # existing violations block the add
    with pytest.raises(ConstraintViolationError):
        router.sql("ALTER TABLE ck ADD CONSTRAINT v_big CHECK (v > 10)")
    router.sql("ALTER TABLE ck DROP CONSTRAINT v_nonneg")
    assert t.constraints() == {}
    router.sql("INSERT INTO ck SELECT * FROM bad_rows")  # now allowed
    assert t.read(spark).count() == 51
