"""Foreign Delta row-level DELETE (round 15, r14 verdict task 2).

``delete_delta`` commits a spec DELETE against a foreign ``_delta_log``
two ways: a deletion-vector write (the modern engines' default — the
delta_dv codec's ENCODE half, previously fixture/native-only) and a
copy-on-write remove+add rewrite for tables whose protocol can't take
DVs.  The checks read the mutated table back through ``import_delta``
AND independently re-decode the committed DV bytes straight from the
spec codec — never through the writer's own state.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.delta_export import (
    append_delta,
    delete_delta,
    export_delta,
    import_delta,
    read_delta_cdf,
    replay_delta_log,
)
from rxlan_aws_lakehouse_spark.delta_dv import deleted_rows, descriptor_spec
from rxlan_aws_lakehouse_spark.txn import TxnTable
from tests.test_delta_dv import _dv_table


def _rows(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def _plain_foreign(spark, tmp_path, name="t", partition_by=None):
    """A foreign-shape Delta table via the engine's own export (plain
    (1,2) protocol — no DV feature)."""
    t = TxnTable(str(tmp_path / f"src_{name}"))
    df = (
        spark.range(20)
        .select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") % 4).cast("int").alias("seg"),
            (F.col("id") * 1.5).alias("v"),
        )
        .repartition(2)
    )
    t.commit(df, partition_by=partition_by)
    dest = str(tmp_path / name)
    export_delta(t, dest)
    return dest


def test_delete_cow_plain_table(spark, tmp_path):
    """auto mode on a (1,2)-protocol table takes copy-on-write: the
    protocol is untouched, survivors are rewritten, time travel still
    reads the pre-delete version."""
    dest = _plain_foreign(spark, tmp_path)
    out = delete_delta(spark, dest, "k % 2 = 0")
    assert out["mode"] == "cow" and out["n_matched"] == 10
    assert out["version"] == 1
    df = import_delta(spark, dest)
    assert {r["k"] for r in df.collect()} == set(range(1, 20, 2))
    state = replay_delta_log(dest)
    assert int(state["protocol"].get("minReaderVersion") or 1) == 1
    assert not any(
        a.get("deletionVector") for a in state["adds"].values()
    )
    # pre-delete version intact
    assert import_delta(spark, dest, version=0).count() == 20


def test_delete_cow_partitioned_predicate(spark, tmp_path):
    """CoW on a partitioned table: only touched partitions' files are
    rewritten; untouched files survive byte-identical; partition
    values stay authoritative in the log."""
    dest = _plain_foreign(
        spark, tmp_path, name="p", partition_by=["seg"]
    )
    before = replay_delta_log(dest)
    out = delete_delta(spark, dest, "seg = 2 AND k >= 10")
    assert out["mode"] == "cow"
    df = import_delta(spark, dest)
    got = _rows(df, ["k", "seg"])
    assert got == {
        (k, k % 4) for k in range(20) if not (k % 4 == 2 and k >= 10)
    }
    after = replay_delta_log(dest)
    # files of other segments carried over untouched
    untouched = [
        rel
        for rel, a in before["adds"].items()
        if (a.get("partitionValues") or {}).get("seg") != "2"
    ]
    assert all(rel in after["adds"] for rel in untouched)


def test_delete_cow_null_predicate_rows_survive(spark, tmp_path):
    """A predicate that evaluates NULL (e.g. ``v = 3.0`` when v IS
    NULL) matches nothing, so NULL-evaluating rows must SURVIVE the
    copy-on-write rewrite — survivors are NOT(cond IS TRUE), not
    ~cond (which is also NULL and would silently drop the row)."""
    t = TxnTable(str(tmp_path / "src_nullpred"))
    df = spark.range(10).select(
        F.col("id").cast("int").alias("k"),
        F.when(F.col("id") % 3 == 0, F.col("id").cast("double")).alias(
            "v"
        ),
    )
    t.commit(df)
    dest = str(tmp_path / "nullpred")
    export_delta(t, dest)
    out = delete_delta(spark, dest, "v = 3.0", mode="cow")
    assert out["n_matched"] == 1
    got = _rows(import_delta(spark, dest), ["k", "v"])
    assert got == {
        (k, float(k) if k % 3 == 0 else None)
        for k in range(10)
        if k != 3
    }
    # same semantics in DV mode (matched side already NULL-safe)
    dest2 = str(tmp_path / "nullpred_dv")
    export_delta(t, dest2)
    out2 = delete_delta(spark, dest2, "v = 3.0", mode="dv")
    assert out2["n_matched"] == 1
    assert _rows(import_delta(spark, dest2), ["k", "v"]) == got


def test_delete_dv_mode_upgrades_protocol(spark, tmp_path):
    """mode='dv' on a legacy-protocol table commits a table-features
    protocol upgrade (legacy implied features enumerated) + spec DV
    descriptors; the data files are NOT rewritten; the committed
    vector re-decodes through the spec codec alone."""
    dest = _plain_foreign(spark, tmp_path, name="dv")
    before = set(replay_delta_log(dest)["files"])
    out = delete_delta(spark, dest, "k < 5", mode="dv")
    assert out["mode"] == "dv" and out["n_matched"] == 5
    state = replay_delta_log(dest)
    proto = state["protocol"]
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "deletionVectors" in proto["readerFeatures"]
    assert "deletionVectors" in proto["writerFeatures"]
    # legacy writer version 2 implied features survive the upgrade
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])
    # no data file was REWRITTEN: every live file predates the delete
    # (fully-deleted files may drop out entirely)
    assert set(state["files"]) <= before
    dv_adds = {
        rel: a
        for rel, a in state["adds"].items()
        if a.get("deletionVector")
    }
    assert dv_adds
    # independent spec decode of every committed descriptor
    all_deleted = []
    for rel, a in dv_adds.items():
        desc = a["deletionVector"]
        assert desc["storageType"] == "u"
        idx = deleted_rows(descriptor_spec(dest, desc))
        assert len(idx) == desc["cardinality"]
        all_deleted.extend(idx)
        st = json.loads(a["stats"])
        assert st["tightBounds"] is False
        assert st["numRecords"] > desc["cardinality"]
    assert sum(len(deleted_rows(descriptor_spec(dest, a["deletionVector"])))
               for a in dv_adds.values()) == 5
    df = import_delta(spark, dest)
    assert {r["k"] for r in df.collect()} == set(range(5, 20))
    assert import_delta(spark, dest, version=0).count() == 20


def test_delete_dv_union_with_existing_vector(spark, tmp_path):
    """A second DV delete UNIONS with the file's existing vector, and
    already-deleted rows never re-match (n_matched counts live rows
    only).  Runs on the hand-authored DV fixture table."""
    f = _dv_table(tmp_path)  # live: (2,x) (4,y) (6,y) (8,y)
    out = delete_delta(spark, f.root, "k <= 4", mode="dv")
    # k=1,3 were already dead; only live 2 and 4 match
    assert out["n_matched"] == 2 and out["mode"] == "dv"
    df = import_delta(spark, f.root)
    assert {(r["k"], r["cat"]) for r in df.collect()} == {
        (6, "y"), (8, "y")
    }
    state = replay_delta_log(f.root)
    # f1 held rows 1,2,3 with DV {0,2}; deleting k=2 (ordinal 1)
    # completes the file -> bare remove, no re-add
    assert not any("part-aaa" in rel for rel in state["files"])
    # f2 (rows 4,5; DV {1}) unions to {0,1} -> also fully deleted
    assert not any("part-bbb" in rel for rel in state["files"])


def test_delete_dv_auto_on_dv_capable_table(spark, tmp_path):
    """auto mode picks DV when the protocol already carries the
    feature both sides (never rewrites data files)."""
    f = _dv_table(tmp_path)
    before = set(replay_delta_log(f.root)["files"])
    out = delete_delta(spark, f.root, "k = 6")
    assert out["mode"] == "dv"
    state = replay_delta_log(f.root)
    assert set(state["files"]) == before
    assert {r["k"] for r in import_delta(spark, f.root).collect()} == {
        2, 4, 8,
    }


def test_delete_append_only_refuses(spark, tmp_path):
    dest = _plain_foreign(spark, tmp_path, name="ao")
    # flip the config via a metaData re-commit
    state = replay_delta_log(dest)
    with open(
        os.path.join(dest, "_delta_log", f"{state['n_commits']:020d}.json"),
        "w",
    ) as fh:
        md = {
            "metaData": {
                "id": state["meta_id"],
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(state["schema"]),
                "partitionColumns": state["partition_columns"],
                "configuration": {"delta.appendOnly": "true"},
            }
        }
        fh.write(json.dumps(md) + "\n")
    with pytest.raises(ValueError, match="appendOnly"):
        delete_delta(spark, dest, "k = 1")


def test_delete_no_match_is_noop(spark, tmp_path):
    dest = _plain_foreign(spark, tmp_path, name="nm")
    out = delete_delta(spark, dest, "k > 1000")
    assert out["version"] is None and out["n_matched"] == 0
    assert replay_delta_log(dest)["n_commits"] == 1


def test_delete_emits_cdf_when_enabled(spark, tmp_path):
    """delta.enableChangeDataFeed tables get spec cdc files for the
    deleted rows in the same commit; read_delta_cdf surfaces them as
    _change_type='delete'."""
    dest = _plain_foreign(spark, tmp_path, name="cdf")
    state = replay_delta_log(dest)
    with open(
        os.path.join(dest, "_delta_log", f"{state['n_commits']:020d}.json"),
        "w",
    ) as fh:
        md = {
            "metaData": {
                "id": state["meta_id"],
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(state["schema"]),
                "partitionColumns": state["partition_columns"],
                "configuration": {"delta.enableChangeDataFeed": "true"},
            }
        }
        fh.write(json.dumps(md) + "\n")
    out = delete_delta(spark, dest, "k < 3", mode="cow")
    assert out["n_matched"] == 3
    state = replay_delta_log(dest)
    assert os.path.isdir(os.path.join(dest, "_change_data"))
    ch = read_delta_cdf(
        spark, dest, starting_commit=out["version"],
        ending_commit=out["version"],
    )
    dels = ch.filter(F.col("_change_type") == "delete")
    assert {r["k"] for r in dels.collect()} == {0, 1, 2}
    assert import_delta(spark, dest).count() == 17


def test_delete_lost_race_conflict_detection(spark, tmp_path):
    """A commit racing into the slot that REMOVES a touched file makes
    the delete refuse (re-run) instead of committing over it; a racing
    blind APPEND is retried through transparently."""
    dest = _plain_foreign(spark, tmp_path, name="race")
    state = replay_delta_log(dest)
    rel = state["files"][0]
    # occupy the next slot with a remove of a file the delete touches
    with open(
        os.path.join(dest, "_delta_log", f"{state['n_commits']:020d}.json"),
        "w",
    ) as fh:
        fh.write(
            json.dumps(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": 1,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    # force the writer to see the PRE-race state
    import rxlan_aws_lakehouse_spark.delta_export as de

    real_replay = de.replay_delta_log
    calls = {"n": 0}

    def stale_then_real(path, up_to=None):
        calls["n"] += 1
        if calls["n"] == 1:
            return state
        return real_replay(path, up_to=up_to)

    de_replay = de.replay_delta_log
    try:
        de.replay_delta_log = stale_then_real
        with pytest.raises(ValueError, match="concurrent"):
            de.delete_delta(spark, dest, "k >= 0", mode="cow")
    finally:
        de.replay_delta_log = de_replay


def test_streaming_foreign_cdf_tail(spark, tmp_path):
    """readChangeFeed=true on format('delta_import') (r14 verdict task
    6): tails a foreign table's CHANGE FEED — recorded cdc files
    verbatim, insert derivation for append commits, exactly-once
    across a restart, and a loud failure on a changeful commit
    without cdc."""
    from rxlan_aws_lakehouse_spark.sources.delta_import_source import (
        register_delta_import_source,
    )

    register_delta_import_source(spark)
    dest = _plain_foreign(spark, tmp_path, name="cdft")
    # enable CDF via a metaData re-commit (schema unchanged)
    state = replay_delta_log(dest)
    with open(
        os.path.join(dest, "_delta_log", f"{state['n_commits']:020d}.json"),
        "w",
    ) as fh:
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": state["meta_id"],
                        "format": {
                            "provider": "parquet",
                            "options": {},
                        },
                        "schemaString": json.dumps(state["schema"]),
                        "partitionColumns": state["partition_columns"],
                        "configuration": {
                            "delta.enableChangeDataFeed": "true"
                        },
                    }
                }
            )
            + "\n"
        )
    extra = spark.createDataFrame(
        [(100, 1, 5.0), (101, 2, 6.0)], "k INT, seg INT, v DOUBLE"
    )
    r_app = append_delta(spark, dest, extra)  # commit 2: blind append
    r_del = delete_delta(spark, dest, "k < 3", mode="cow")  # commit 3: cdc
    assert r_del["n_matched"] == 3

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("delta_import")
            .option("readChangeFeed", "true")
            .option("startingVersion", "earliest")
            .load(dest)
            .writeStream.format("parquet")
            .option("path", out)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["k"], r["_change_type"], r["_commit_version"])
            for r in spark.read.parquet(out).collect()
        }

    got = drain()
    # commit 0: 20 inserts; commit 2: 2 inserts; commit 3: 3 deletes
    assert {(100, "insert", 2), (101, "insert", 2)} <= got
    assert {(0, "delete", 3), (1, "delete", 3), (2, "delete", 3)} <= got
    assert sum(1 for _, t, v in got if t == "insert" and v == 0) == 20
    assert len(got) == 25
    # restart: only the NEW commit's changes land (exactly-once)
    append_delta(
        spark,
        dest,
        spark.createDataFrame([(200, 3, 7.0)], "k INT, seg INT, v DOUBLE"),
    )
    got2 = drain()
    assert got2 - got == {(200, "insert", 4)}
    # changeful commit WITHOUT cdc fails loudly: flip CDF off, delete
    state = replay_delta_log(dest)
    with open(
        os.path.join(dest, "_delta_log", f"{state['n_commits']:020d}.json"),
        "w",
    ) as fh:
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": state["meta_id"],
                        "format": {
                            "provider": "parquet",
                            "options": {},
                        },
                        "schemaString": json.dumps(state["schema"]),
                        "partitionColumns": state["partition_columns"],
                        "configuration": {},
                    }
                }
            )
            + "\n"
        )
    delete_delta(spark, dest, "k = 5", mode="cow")
    q = (
        spark.readStream.format("delta_import")
        .option("readChangeFeed", "true")
        .option("startingVersion", "earliest")
        .load(dest)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out2"))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    with pytest.raises(Exception, match="recorded no cdc"):
        q.awaitTermination(120)
        raise RuntimeError("stream should have failed")
    # batch reads refuse the streaming-only option loudly
    with pytest.raises(Exception, match="STREAMING option"):
        spark.read.format("delta_import").option(
            "readChangeFeed", "true"
        ).load(dest).collect()


def test_delete_empty_table_is_noop(spark, tmp_path):
    """A DELETE against a table with zero live files is a no-op (no
    scan, no commit)."""
    import json as _json

    dest = str(tmp_path / "empty")
    os.makedirs(os.path.join(dest, "_delta_log"))
    with open(
        os.path.join(dest, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 2,
                    }
                }
            )
            + "\n"
        )
        fh.write(
            _json.dumps(
                {
                    "metaData": {
                        "id": "e-1",
                        "format": {
                            "provider": "parquet",
                            "options": {},
                        },
                        "schemaString": _json.dumps(
                            {
                                "type": "struct",
                                "fields": [
                                    {
                                        "name": "k",
                                        "type": "integer",
                                        "nullable": True,
                                        "metadata": {},
                                    }
                                ],
                            }
                        ),
                        "partitionColumns": [],
                        "configuration": {},
                    }
                }
            )
            + "\n"
        )
    out = delete_delta(spark, dest, "k = 1")
    assert out["version"] is None and out["n_matched"] == 0
    assert replay_delta_log(dest)["n_commits"] == 1
