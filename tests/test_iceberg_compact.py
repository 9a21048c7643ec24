"""Foreign Iceberg data-file compaction (round 16 —
``compact_data_files_iceberg``, the data half of OPTIMIZE;
``rewrite_manifests_iceberg`` is the metadata half).

Bin-packs undersized live files (plus any file carrying applicable
deletes, purging the dead rows) into fresh files under the current
default spec, committed as ONE ``replace`` snapshot that streaming
tails skip by the incremental-append-scan rule.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.iceberg_export import (
    compact_data_files_iceberg,
    delete_iceberg,
    export_iceberg,
)
from rxlan_aws_lakehouse_spark.iceberg_import import (
    iceberg_live_files,
    import_iceberg,
    load_table_metadata,
)
from rxlan_aws_lakehouse_spark.txn import TxnTable


def _rows(df):
    return {(r["k"], r["v"]) for r in df.collect()}


def _foreign(spark, tmp_path, name="t", parts=4):
    t = TxnTable(str(tmp_path / f"src_{name}"))
    df = spark.range(40).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 10).cast("long").alias("v"),
    )
    t.commit(df.repartition(parts))
    dest = str(tmp_path / name)
    export_iceberg(t, dest)
    return dest


def test_compact_binpacks_small_files(spark, tmp_path):
    dest = _foreign(spark, tmp_path)
    before = _rows(import_iceberg(spark, dest))
    n_before = len(iceberg_live_files(dest)["files"])
    assert n_before >= 4
    out = compact_data_files_iceberg(spark, dest)
    assert out["n_rewritten"] == n_before
    assert out["n_files_after"] < n_before
    assert (
        len(iceberg_live_files(dest)["files"]) == out["n_files_after"]
    )
    assert _rows(import_iceberg(spark, dest)) == before
    snaps = load_table_metadata(dest)["snapshots"]
    assert snaps[-1]["summary"]["operation"] == "replace"


def test_compact_purges_position_deletes(spark, tmp_path):
    dest = _foreign(spark, tmp_path, name="pd")
    d = delete_iceberg(spark, dest, "k % 4 = 0")
    assert d["n_matched"] == 10
    before = _rows(import_iceberg(spark, dest))
    assert len(before) == 30
    st0 = iceberg_live_files(dest)
    assert st0["delete_files"]
    out = compact_data_files_iceberg(spark, dest)
    assert out["n_delete_files_dropped"] >= 1
    st1 = iceberg_live_files(dest)
    assert not st1["delete_files"]
    assert _rows(import_iceberg(spark, dest)) == before
    # the rewritten files carry ONLY the live rows
    assert (
        sum(int(e["record_count"]) for e in st1["entries"]) == 30
    )


def test_compact_noop_and_refusals(spark, tmp_path):
    dest = _foreign(spark, tmp_path, name="noop")
    out = compact_data_files_iceberg(spark, dest, target_bytes=0)
    assert out["snapshot_id"] is None and out["n_rewritten"] == 0
    # v3 refuses: id-preserving rewrites are not produced
    mdir = os.path.join(dest, "metadata")
    with open(os.path.join(mdir, "v1.metadata.json")) as f:
        meta = json.load(f)
    meta["format-version"] = 3
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="row lineage"):
        compact_data_files_iceberg(spark, dest)


def test_compact_applies_equality_deletes_keeps_eq_file(
    spark, tmp_path
):
    from tests.test_iceberg_import import Ice

    t = Ice(str(tmp_path / "eqc"))
    f1 = t.write_file("a.parquet", [1, 2, 3], "x")
    f2 = t.write_file("b.parquet", [4, 5], "x")
    ed = t.write_eq_delete(
        "ed.parquet",
        {"k": (1, __import__("pyarrow").int64(), [2])},
    )
    m1 = t.manifest(
        "m1.avro",
        [t.entry(f1, [1, 2, 3], "x"), t.entry(f2, [4, 5], "x")],
        ["x"],
        seq=1,
    )
    md = t.manifest(
        "md.avro",
        [t.del_entry(ed, 2, seq=2, equality_ids=[1], partition=False)],
        ["x"],
        content=1,
        seq=2,
        spec_id=1,
    )
    t.snapshot(1, [m1, md])
    t.metadata(
        1, current_sid=1, extra_specs=[{"spec-id": 1, "fields": []}]
    )
    before = {
        r["k"] for r in import_iceberg(spark, t.root).collect()
    }
    assert before == {1, 3, 4, 5}
    out = compact_data_files_iceberg(spark, t.root)
    assert out["n_rewritten"] == 2
    # eq delete file STAYS (it scopes by sequence, not by reference)
    st = iceberg_live_files(t.root)
    assert any(d["content"] == 2 for d in st["delete_files"])
    assert {
        r["k"] for r in import_iceberg(spark, t.root).collect()
    } == before


def test_stream_skips_replace_snapshot(spark, tmp_path):
    """A compaction mid-stream emits NOTHING; a later append still
    streams — the incremental-append-scan rule."""
    from rxlan_aws_lakehouse_spark.iceberg_export import append_iceberg
    from rxlan_aws_lakehouse_spark.sources.iceberg_import_source import (
        register_iceberg_import_source,
    )

    register_iceberg_import_source(spark)
    dest = _foreign(spark, tmp_path, name="strm")
    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        q = (
            spark.readStream.format("iceberg_import")
            .option("startingSnapshot", "earliest")
            .load(dest)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_stream()
    assert len(_rows(spark.read.parquet(out_dir))) == 40
    compact_data_files_iceberg(spark, dest)
    run_stream()  # replace snapshot: no new rows
    assert len(_rows(spark.read.parquet(out_dir))) == 40
    append_iceberg(
        spark,
        dest,
        spark.createDataFrame([(100, -100)], "k LONG, v LONG"),
    )
    run_stream()
    got = _rows(spark.read.parquet(out_dir))
    assert len(got) == 41 and (100, -100) in got


def test_sql_optimize_compact_verb(spark, tmp_path):
    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter

    dest = _foreign(spark, tmp_path, name="sqlc")
    before = _rows(import_iceberg(spark, dest))
    router = TxnSqlRouter(spark)
    router.sql(
        f"CREATE TABLE fic USING ICEBERG_IMPORT LOCATION '{dest}'"
    )
    out = router.sql("OPTIMIZE fic COMPACT").collect()[0]
    assert out["operation"] == "compact_foreign_iceberg"
    assert out["n_compacted"] == 4
    assert {
        (r["k"], r["v"])
        for r in router.sql("SELECT k, v FROM fic").collect()
    } == before
    router.sql("DROP TABLE fic")
