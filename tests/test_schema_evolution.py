"""ALTER TABLE / CTAS / persistent catalog (rounds 11-12).

SQL-first schema evolution: ``ALTER TABLE ADD COLUMNS`` is a
METADATA-ONLY commit (carried files read the new columns as typed
NULLs), and — since round 12's id-based column mapping (Delta
``columnMapping.mode=name`` / Iceberg field ids, txn.py) — so are
``RENAME COLUMN`` and ``DROP COLUMN``: the recorded schema keeps
logical names, the mapping freezes each field's physical parquet name,
readers scan physical and alias back, and a re-added name after a drop
maps to a FRESH physical name so dropped bytes never resurrect. CTAS
is one planned write; narrowing/lossy ALTERs stay loud errors. Plus
the persistent catalog: name→root mappings that survive the session.
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


def test_rename_column_is_metadata_only(spark, tmp_path):
    t = _fresh(spark, tmp_path, n=30)
    pre = t.current_version()
    files_before = t.files()
    v = t.rename_column(spark, "v", "doubled")
    meta = t._meta(v)
    assert meta["n_files_written"] == 0  # zero data IO
    assert t.files(v) == files_before  # every file carried by reference
    # the mapping pins the frozen physical name under the new logical
    assert meta["column_mapping"]["fields"]["doubled"]["physical"] == "v"
    df = t.read(spark)
    assert df.columns == ["id", "doubled"]
    assert df.agg(F.sum("doubled")).collect()[0][0] == sum(
        i * 2.0 for i in range(30)
    )
    assert meta["extra"]["column_renamed"] == ["v", "doubled"]
    # pre-rename snapshot still reads under its own schema
    assert t.read(spark, pre).columns == ["id", "v"]
    # writes after the rename land under the physical name and read back
    t.append(
        spark.range(30, 35).select(
            F.col("id"), (F.col("id") * 2.0).alias("doubled")
        )
    )
    assert t.read(spark).filter(F.col("id") >= 30).agg(
        F.sum("doubled")
    ).collect()[0][0] == sum(i * 2.0 for i in range(30, 35))


def test_rename_then_prune_and_merge(spark, tmp_path):
    """Manifest pruning and keyed merges must translate logical
    predicates through the mapping: stats and blooms stay keyed by the
    frozen physical name."""
    t = TxnTable(str(tmp_path / "m"))
    t.commit(
        spark.range(64).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).repartitionByRange(4, "k"),
        sort_within=["k"],
        bloom_cols=["k"],
    )
    t.rename_column(spark, "k", "key")
    kept, total = t.pruned_files([("key", ">=", 48)])
    assert total == 4 and len(kept) == 1  # range stats still prune
    kept2, _ = t.pruned_files_in("key", [3])
    assert len(kept2) == 1  # bloom still prunes point lookups
    assert t.read_pruned(spark, [("key", ">=", 48)]).count() == 16
    t.merge_upsert(
        spark,
        spark.createDataFrame([(3, 99.0)], "key long, v double"),
        ["key"],
    )
    got = t.read(spark).filter(F.col("key") == 3).collect()
    assert len(got) == 1 and got[0]["v"] == 99.0
    # merge only rewrote the candidate file(s), not the table
    assert t._meta(t.current_version())["n_files_carried"] >= 3


def test_drop_column_metadata_only_and_no_resurrection(spark, tmp_path):
    t = _fresh(spark, tmp_path, n=20)
    files_before = t.files()
    v = t.drop_column(spark, "v")
    meta = t._meta(v)
    assert meta["n_files_written"] == 0
    assert t.files(v) == files_before
    assert t.read(spark).columns == ["id"]
    # re-adding the SAME spelling maps to a fresh physical name: the
    # dropped column's bytes in carried files must not resurrect
    t.add_columns(spark, "v DOUBLE")
    cm = t._meta(t.current_version())["column_mapping"]
    assert cm["fields"]["v"]["physical"] != "v"
    assert "v" in cm["used_phys"]
    df = t.read(spark)
    assert df.filter(F.col("v").isNotNull()).count() == 0
    # and the re-added column is writable/readable under its fresh name
    t.merge_upsert(
        spark,
        spark.createDataFrame([(1, 7.0)], "id long, v double"),
        ["id"],
    )
    assert t.read(spark).filter(F.col("v").isNotNull()).count() == 1


def test_drop_column_refusals(spark, tmp_path):
    t = TxnTable(str(tmp_path / "p"))
    t.commit(
        spark.range(12).select(
            F.col("id"), (F.col("id") % 3).alias("b")
        ),
        partition_by=["b"],
    )
    with pytest.raises(ValueError, match="no column"):
        t.drop_column(spark, "ghost")
    with pytest.raises(ValueError, match="partition"):
        t.drop_column(spark, "b")
    t.add_check_constraint(spark, "id_pos", "id >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.drop_column(spark, "id")
    t2 = TxnTable(str(tmp_path / "single"))
    t2.commit(spark.range(3))
    with pytest.raises(ValueError, match="only column"):
        t2.drop_column(spark, "id")


def test_mapped_table_gates_and_materialize(spark, tmp_path):
    """Surfaces that bind raw physical names refuse DIVERGED mappings
    loudly (the Delta exporter instead emits a spec-correct
    columnMapping=name table — test_delta_import covers the round
    trip); rewrite_layout materializes logical names and retires the
    mapping."""
    t = _fresh(spark, tmp_path, n=10)
    t.rename_column(spark, "v", "val")
    with pytest.raises(ValueError, match="column-mapped"):
        t.register(spark, "cm_reg_refused")
    with pytest.raises(ValueError, match="columnMapping"):
        t.commit_staged(str(tmp_path / "nowhere"))
    # the escape hatch: one full rewrite re-aligns physical == logical
    t.rewrite_layout(spark)
    assert "column_mapping" not in t._meta(t.current_version())
    df = t.read(spark)
    assert df.columns == ["id", "val"]
    assert df.count() == 10
    t.register(spark, "cm_reg_ok")  # now representable
    spark.sql("DROP TABLE IF EXISTS cm_reg_ok")


def test_restore_across_mapping_boundary(spark, tmp_path):
    t = _fresh(spark, tmp_path, n=10)
    pre = t.current_version()
    t.rename_column(spark, "v", "val")
    t.drop_column(spark, "val")
    # restore to the pre-mapping snapshot: plain-names table again
    t.restore(spark, pre)
    meta = t._meta(t.current_version())
    assert "column_mapping" not in meta
    assert sorted(t.read(spark).columns) == ["id", "v"]
    assert t.read(spark).count() == 10


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
    # directory layout keeps the FROZEN physical spelling — that is
    # exactly what makes the rename metadata-only — and later writes
    # land under the same physical dirs
    assert all("bucket=" in rel for rel in t.files())
    t.append(
        spark.range(40, 44).select(
            F.col("id"), (F.col("id") % 4).alias("grp")
        )
    )
    assert all("bucket=" in rel for rel in t.files())
    assert t.read(spark).count() == 44
    # partition predicates on the LOGICAL name still prune directories
    kept, total = t.pruned_files([("grp", "=", 2)])
    assert 0 < len(kept) < total


# -- router: ALTER / CTAS / SHOW TABLES ------------------------------------


def test_router_alter_add_and_rename(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    router = TxnSqlRouter(spark)
    router.register("evo", t)
    router.sql("ALTER TABLE evo ADD COLUMNS (tag STRING)")
    assert spark.table("evo").columns == ["id", "v", "tag"]
    router.sql("ALTER TABLE evo RENAME COLUMN tag TO label")
    assert spark.table("evo").columns == ["id", "v", "label"]
    router.sql("ALTER TABLE evo DROP COLUMN label")
    assert spark.table("evo").columns == ["id", "v"]
    with pytest.raises(ValueError, match="not a supported widening"):
        router.sql("ALTER TABLE evo ALTER COLUMN v TYPE STRING")
    with pytest.raises(ValueError, match="unsupported ALTER"):
        router.sql("ALTER TABLE evo SET TBLPROPERTIES ('a'='b')")


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
    with pytest.raises(
        ValueError,
        match="column list, AS SELECT, FROM DELTA .* or FROM ICEBERG",
    ):
        router.sql(
            f"CREATE TABLE nope USING TXN LOCATION '{tmp_path}/n'"
        )


# -- persistent catalog ----------------------------------------------------


def test_catalog_survives_sessions(spark, tmp_path):
    cat = str(tmp_path / "cat")
    t = _fresh(spark, tmp_path)
    r1 = TxnSqlRouter(spark, catalog_dir=cat)
    r1.register("persisted", t)
    # catalog entries are keyed by QUALIFIED name since namespaces
    assert os.path.exists(os.path.join(cat, "default.persisted.json"))

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
    assert not os.path.exists(os.path.join(cat, "default.persisted.json"))
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
