"""Foreign-table MAINTENANCE ops (round 16, r15 verdict task 7).

An attached foreign table could be appended, deleted-from and updated
— but never maintained in place.  This adds the monthly-ops surface:

* Delta: ``optimize_delta`` (bin-packed compaction, a pure
  ``dataChange=false`` commit streaming tails skip) and
  ``vacuum_delta`` (unreferenced-file GC honoring
  ``delta.deletedFileRetentionDuration``);
* Iceberg: ``rewrite_manifests_iceberg`` (merge data manifests, an
  O(metadata) ``replace`` snapshot) and ``expire_snapshots_iceberg``
  (snapshot expiry + only-they-reference file GC).

Round-trips verify reads are IDENTICAL before/after through the
engine's importer AND DuckDB's independent log replay.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.delta_export import (
    delete_delta,
    export_delta,
    import_delta,
    optimize_delta,
    replay_delta_log,
    vacuum_delta,
)
from rxlan_aws_lakehouse_spark.iceberg_export import (
    append_iceberg,
    expire_snapshots_iceberg,
    export_iceberg,
    rewrite_manifests_iceberg,
)
from rxlan_aws_lakehouse_spark.iceberg_import import (
    iceberg_live_files,
    import_iceberg,
    load_table_metadata,
)
from rxlan_aws_lakehouse_spark.txn import TxnTable


def _rows(df, cols=("k", "seg", "v")):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def _foreign(spark, tmp_path, name="t", partition_by=None, n_files=8):
    t = TxnTable(str(tmp_path / f"src_{name}"))
    df = (
        spark.range(80)
        .select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") % 2).cast("int").alias("seg"),
            (F.col("id") * 1.5).alias("v"),
        )
        .repartition(n_files)
    )
    t.commit(df, partition_by=partition_by)
    dest = str(tmp_path / name)
    export_delta(t, dest)
    return dest


def _duckdb_live_agg(dest):
    """DuckDB's independent replay: live file set from _delta_log
    (adds minus removes — each path here is added once and removed at
    most once), then one aggregate over exactly those parquet files."""
    con = duckdb.connect()
    try:
        files = con.execute(
            """
            SELECT json_extract_string(add, '$.path') AS path
            FROM read_json(?, format='newline_delimited',
                           columns={'add': 'JSON', 'remove': 'JSON'})
            WHERE add IS NOT NULL
              AND json_extract_string(add, '$.path') NOT IN (
                SELECT json_extract_string(remove, '$.path')
                FROM read_json(?, format='newline_delimited',
                               columns={'add': 'JSON',
                                        'remove': 'JSON'})
                WHERE remove IS NOT NULL
            )
            """,
            [
                os.path.join(dest, "_delta_log", "*.json"),
                os.path.join(dest, "_delta_log", "*.json"),
            ],
        ).fetchall()
        paths = [os.path.join(dest, p) for (p,) in files]
        return con.execute(
            "SELECT count(*), sum(k), round(sum(v), 2) "
            "FROM read_parquet(?, union_by_name=true)",
            [paths],
        ).fetchone()
    finally:
        con.close()


def test_optimize_delta_roundtrip(spark, tmp_path):
    """Bin-pack compaction: fewer files, identical reads via the
    importer AND DuckDB's log replay, every action dataChange=false,
    partition dirs respected."""
    dest = _foreign(spark, tmp_path, partition_by=["seg"], n_files=8)
    before = _rows(import_delta(spark, dest))
    n_before = len(replay_delta_log(dest)["files"])
    duck_before = _duckdb_live_agg(dest)
    out = optimize_delta(spark, dest, target_bytes=1 << 20)
    assert out["version"] == 1 and out["n_files_added"] >= 1
    state = replay_delta_log(dest)
    assert len(state["files"]) < n_before
    assert _rows(import_delta(spark, dest)) == before
    assert _duckdb_live_agg(dest) == duck_before
    # the commit is pure compaction: every add/remove dataChange=false
    import json as _json

    with open(
        os.path.join(
            dest, "_delta_log", f"{out['version']:020d}.json"
        )
    ) as f:
        acts = [_json.loads(x) for x in f]
    for a in acts:
        for kind in ("add", "remove"):
            if kind in a:
                assert a[kind]["dataChange"] is False
    # partition values survived on the compacted files
    assert {
        (a.get("partitionValues") or {}).get("seg")
        for a in state["adds"].values()
    } == {"0", "1"}


def test_optimize_purges_deletion_vectors(spark, tmp_path):
    """A DV-bearing file is always a compaction candidate; the rewrite
    PURGES its dead rows — compacted adds carry no deletionVector and
    the live rows are unchanged."""
    dest = _foreign(spark, tmp_path, name="dv", n_files=4)
    delete_delta(spark, dest, "k < 10", mode="dv")
    live = _rows(import_delta(spark, dest))
    out = optimize_delta(spark, dest, target_bytes=1 << 20)
    assert out["version"] == 2
    state = replay_delta_log(dest)
    assert not any(
        a.get("deletionVector") for a in state["adds"].values()
    )
    assert _rows(import_delta(spark, dest)) == live


def test_streaming_tail_skips_optimize_commit(spark, tmp_path):
    """The delta_import streaming source never re-emits an OPTIMIZE:
    a tail started below the compaction commit delivers each row
    exactly once."""
    from rxlan_aws_lakehouse_spark.sources.delta_import_source import (
        register_delta_import_source,
    )

    register_delta_import_source(spark)
    dest = _foreign(spark, tmp_path, name="st", n_files=4)
    out = optimize_delta(spark, dest, target_bytes=1 << 20)
    assert out["version"] == 1
    sink = str(tmp_path / "sink")
    q = (
        spark.readStream.format("delta_import")
        .option("startingVersion", "earliest")
        .load(dest)
        .writeStream.format("parquet")
        .option("path", sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = [r["k"] for r in spark.read.parquet(sink).collect()]
    assert sorted(got) == list(range(80))  # once each — no re-emit


def test_vacuum_delta_gc(spark, tmp_path):
    """After OPTIMIZE the superseded files are tombstoned; VACUUM with
    a zero window deletes exactly them (live files + the log remain),
    and the table still reads identically.  dry_run only reports."""
    dest = _foreign(spark, tmp_path, name="vac", n_files=4)
    before = _rows(import_delta(spark, dest))
    old_rels = set(replay_delta_log(dest)["files"])
    optimize_delta(spark, dest, target_bytes=1 << 20)
    dry = vacuum_delta(spark, dest, retain_hours=0, dry_run=True)
    assert set(dry["removed"]) == old_rels and dry["dry_run"]
    assert all(os.path.exists(os.path.join(dest, r)) for r in old_rels)
    res = vacuum_delta(spark, dest, retain_hours=0)
    assert set(res["removed"]) == old_rels
    assert not any(
        os.path.exists(os.path.join(dest, r)) for r in old_rels
    )
    assert _rows(import_delta(spark, dest)) == before
    # default retention honors the table property / 168 h floor
    res2 = vacuum_delta(spark, dest)
    assert res2["n_removed"] == 0 and res2["retain_hours"] == 168.0


def test_rewrite_manifests_iceberg(spark, tmp_path):
    """Three appends -> three data manifests; the rewrite merges them
    into ONE (per spec) of EXISTING entries with explicit sequence
    numbers, operation=replace, zero added files, identical reads."""
    t = TxnTable(str(tmp_path / "src_i"))
    t.commit(
        spark.range(20).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    for lo in (20, 40):
        append_iceberg(
            spark,
            dest,
            spark.range(lo, lo + 20).select(
                F.col("id").cast("long").alias("k"),
                (F.col("id") * 1.5).alias("v"),
            ),
        )
    before = _rows(import_iceberg(spark, dest), ("k", "v"))
    out = rewrite_manifests_iceberg(spark, dest)
    assert out["n_manifests_before"] == 3
    assert out["n_manifests_after"] == 1
    assert _rows(import_iceberg(spark, dest), ("k", "v")) == before
    meta = load_table_metadata(dest)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert snap["summary"]["operation"] == "replace"
    # a second rewrite is a noop (already one manifest)
    out2 = rewrite_manifests_iceberg(spark, dest)
    assert out2["snapshot_id"] is None


def test_expire_snapshots_iceberg(spark, tmp_path):
    """Expiry keeps the current snapshot, drops the rest from the
    metadata, and deletes ONLY files no kept snapshot references —
    shared data files survive, superseded manifest lists go."""
    t = TxnTable(str(tmp_path / "src_e"))
    t.commit(
        spark.range(10).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    dest = str(tmp_path / "ice_e")
    export_iceberg(t, dest)
    append_iceberg(
        spark,
        dest,
        spark.range(10, 20).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 1.5).alias("v"),
        ),
    )
    meta0 = load_table_metadata(dest)
    assert len(meta0["snapshots"]) == 2
    old_ml = next(
        s
        for s in meta0["snapshots"]
        if s["snapshot-id"] != meta0["current-snapshot-id"]
    )["manifest-list"]
    before = _rows(import_iceberg(spark, dest), ("k", "v"))
    dry = expire_snapshots_iceberg(
        spark, dest, older_than_ms=1 << 62, dry_run=True
    )
    assert dry["n_expired"] == 1 and dry["dry_run"]
    assert os.path.exists(os.path.join(dest, old_ml))
    res = expire_snapshots_iceberg(spark, dest, older_than_ms=1 << 62)
    assert res["n_expired"] == 1
    meta1 = load_table_metadata(dest)
    assert len(meta1["snapshots"]) == 1
    assert (
        meta1["snapshots"][0]["snapshot-id"]
        == meta0["current-snapshot-id"]
    )
    # the expired snapshot's manifest list is gone; shared data files
    # (referenced by the kept snapshot too) survive
    assert not os.path.exists(os.path.join(dest, old_ml))
    assert _rows(import_iceberg(spark, dest), ("k", "v")) == before
    st = iceberg_live_files(dest)
    assert all(os.path.exists(p) for p in st["files"])
    # noop when nothing is expirable
    res2 = expire_snapshots_iceberg(spark, dest, older_than_ms=0)
    assert res2["n_expired"] == 0


def test_sql_verbs_on_attachments(spark, tmp_path):
    """OPTIMIZE / VACUUM route onto the foreign maintenance ops for
    both formats; pinned attachments refuse."""
    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter

    dest = _foreign(spark, tmp_path, name="sqlm", n_files=4)
    t = TxnTable(str(tmp_path / "src_sqlm"))  # reuse src for iceberg
    idest = str(tmp_path / "sqlm_ice")
    ti = TxnTable(str(tmp_path / "src_sqlm_i"))
    ti.commit(
        spark.range(10).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    export_iceberg(ti, idest)
    append_iceberg(
        spark,
        idest,
        spark.range(10, 20).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 1.5).alias("v"),
        ),
    )
    router = TxnSqlRouter(spark)
    router.sql(f"CREATE TABLE md USING DELTA_IMPORT LOCATION '{dest}'")
    router.sql(
        f"CREATE TABLE mi USING ICEBERG_IMPORT LOCATION '{idest}'"
    )
    out = router.sql("OPTIMIZE md").collect()[0]
    assert out["operation"] == "optimize_foreign_delta"
    assert (
        router.sql("SELECT count(*) AS n FROM md").collect()[0]["n"]
        == 80
    )
    out = router.sql("VACUUM md RETAIN 0 HOURS").collect()[0]
    assert out["operation"] == "vacuum_foreign_delta"
    out = router.sql("OPTIMIZE mi").collect()[0]
    assert out["operation"] == "optimize_foreign_iceberg"
    assert (
        router.sql("SELECT count(*) AS n FROM mi").collect()[0]["n"]
        == 20
    )
    out = router.sql("VACUUM mi RETAIN 0 HOURS").collect()[0]
    assert out["operation"] == "vacuum_foreign_iceberg"
    assert (
        router.sql("SELECT count(*) AS n FROM mi").collect()[0]["n"]
        == 20
    )
    # ZORDER is a Delta layout op; the Iceberg attachment refuses it
    with pytest.raises(ValueError, match="Delta layout op"):
        router.sql("OPTIMIZE mi ZORDER BY (k)")
    router.sql("DROP TABLE md")
    router.sql("DROP TABLE mi")


def test_optimize_zorder_foreign_delta(spark, tmp_path):
    """OPTIMIZE ZORDER BY on an attachment (round 16): every live file
    rewritten, rows clustered by the Morton interleave of (k, v) —
    per-file k-ranges come out ~disjoint, so a k-slice predicate can
    skip files; reads identical; still dataChange=false throughout."""
    import json as _json

    import pyarrow.parquet as _pq

    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter

    dest = _foreign(spark, tmp_path, name="z", n_files=8)
    before = _rows(import_delta(spark, dest))
    router = TxnSqlRouter(spark)
    router.sql(f"CREATE TABLE fz USING DELTA_IMPORT LOCATION '{dest}'")
    out = router.sql("OPTIMIZE fz ZORDER BY (k, v)").collect()[0]
    router.sql("DROP TABLE fz")
    assert out["operation"] == "optimize_foreign_delta"
    assert out["n_compacted"] == 8  # EVERY live file is a candidate
    assert _rows(import_delta(spark, dest)) == before
    with open(
        os.path.join(dest, "_delta_log", "00000000000000000001.json")
    ) as f:
        acts = [_json.loads(x) for x in f]
    ci = next(a for a in acts if "commitInfo" in a)
    assert "zOrderBy" in ci["commitInfo"]["operationParameters"]
    for a in acts:
        for kind in ("add", "remove"):
            if kind in a:
                assert a[kind]["dataChange"] is False
    # clustering: re-cluster a fresh 8-file fixture into MULTIPLE
    # z-ranged outputs (tiny target -> one bin per input file); with a
    # monotone id column the z-sorted files cover NON-OVERLAPPING k
    # ranges, while the 8 round-robin inputs all spanned the full range
    dest2 = _foreign(spark, tmp_path, name="z2", n_files=8)
    out2 = optimize_delta(
        spark, dest2, target_bytes=1, zorder_by=["k", "v"]
    )
    assert out2["n_files_added"] >= 2
    assert _rows(import_delta(spark, dest2)) == before
    state = replay_delta_log(dest2)
    spans = []
    for rel in state["files"]:
        md = _pq.ParquetFile(os.path.join(dest2, rel)).metadata
        ks = [
            md.row_group(i).column(0).statistics
            for i in range(md.num_row_groups)
        ]
        spans.append(
            (min(s.min for s in ks), max(s.max for s in ks))
        )
    spans.sort()
    overlaps = sum(
        1
        for (a1, b1), (a2, _b2) in zip(spans, spans[1:])
        if a2 <= b1
    )
    assert len(spans) >= 2 and overlaps == 0


def test_optimize_zorder_refusals(spark, tmp_path):
    from rxlan_aws_lakehouse_spark.delta_export import optimize_delta

    dest = _foreign(
        spark, tmp_path, name="zr", partition_by=["seg"], n_files=4
    )
    with pytest.raises(ValueError, match="unknown ZORDER column"):
        optimize_delta(spark, dest, zorder_by=["nope"])
    with pytest.raises(ValueError, match="partition column"):
        optimize_delta(spark, dest, zorder_by=["seg"])
