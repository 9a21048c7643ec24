"""Foreign Iceberg row-level DELETE (round 15 — the Iceberg twin of
``delete_delta``; write interop now covers row-level ops on BOTH open
formats).

``delete_iceberg`` commits merge-on-read deletes against a foreign
metadata tree: spec POSITION-delete parquet on v2 tables, Puffin
DELETION VECTORS on v3 — each read back through the engine's own
importer AND decoded independently through the spec codecs.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.iceberg_export import (
    delete_iceberg,
    export_iceberg,
)
from rxlan_aws_lakehouse_spark.iceberg_import import (
    iceberg_live_files,
    import_iceberg,
    load_table_metadata,
)
from rxlan_aws_lakehouse_spark.txn import TxnTable


def _export_fixture(spark, tmp_path, name="t", partition_by=None):
    t = TxnTable(str(tmp_path / f"src_{name}"))
    df = (
        spark.range(20)
        .select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") % 4).cast("int").alias("seg"),
            (F.col("id") * 1.5).alias("v"),
        )
        .repartition(2)
    )
    t.commit(df, partition_by=partition_by)
    dest = str(tmp_path / name)
    export_iceberg(t, dest)
    return dest


def test_delete_pos_v2_plain(spark, tmp_path):
    """auto mode on a v2 table writes ONE spec position-delete file
    (reserved field ids, sorted) under an unpartitioned spec; the
    importer masks it; time travel still reads the pre-delete
    snapshot; a second delete stacks."""
    dest = _export_fixture(spark, tmp_path)
    pre_sid = load_table_metadata(dest)["current-snapshot-id"]
    out = delete_iceberg(spark, dest, "k % 2 = 0")
    assert out["mode"] == "pos" and out["n_matched"] == 10
    df = import_iceberg(spark, dest)
    assert {r["k"] for r in df.collect()} == set(range(1, 20, 2))
    # the delete file is spec-shaped: reserved ids, sorted rows
    st = iceberg_live_files(dest)
    assert len(st["delete_files"]) == 1
    d = st["delete_files"][0]
    assert d["content"] == 1 and d["global"]
    sch = pq.read_schema(d["abs"])
    fids = {
        f.name: int((f.metadata or {})[b"PARQUET:field_id"])
        for f in sch
    }
    assert fids == {"file_path": 2147483546, "pos": 2147483545}
    t = pq.read_table(d["abs"])
    pairs = list(
        zip(
            t.column("file_path").to_pylist(),
            t.column("pos").to_pylist(),
        )
    )
    assert pairs == sorted(pairs) and len(pairs) == 10
    # pre-delete snapshot intact
    assert (
        import_iceberg(spark, dest, snapshot_id=pre_sid).count() == 20
    )
    # second delete stacks; already-dead rows never re-match
    out2 = delete_iceberg(spark, dest, "k <= 5")
    assert out2["n_matched"] == 3  # 1, 3, 5 (evens already dead)
    assert {r["k"] for r in import_iceberg(spark, dest).collect()} == {
        7, 9, 11, 13, 15, 17, 19,
    }


def test_delete_pos_v2_partitioned_predicate(spark, tmp_path):
    """Partitioned (identity, id-less name-mapped files): predicates
    over the partition column resolve through the lineage scan's
    metadata constants; the global delete masks across partitions."""
    dest = _export_fixture(
        spark, tmp_path, name="p", partition_by=["seg"]
    )
    out = delete_iceberg(spark, dest, "seg = 2 AND k >= 10")
    assert out["mode"] == "pos" and out["n_matched"] > 0
    got = {
        (r["k"], r["seg"])
        for r in import_iceberg(spark, dest).collect()
    }
    assert got == {
        (k, k % 4)
        for k in range(20)
        if not (k % 4 == 2 and k >= 10)
    }


def test_delete_dv_v3(spark, tmp_path):
    """On a v3 table the delete writes Puffin DELETION VECTORS; a
    second delete UNIONS each touched file's vector and drops the
    fully-superseded previous DV manifest from the manifest list."""
    import json as _json

    dest = _export_fixture(spark, tmp_path, name="v3")
    # bump the engine-exported table to format-version 3 (the metadata
    # is otherwise v3-compatible for reading)
    mdir = os.path.join(dest, "metadata")
    with open(os.path.join(mdir, "v1.metadata.json")) as f:
        meta = _json.load(f)
    meta["format-version"] = 3
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        _json.dump(meta, f)
    out = delete_iceberg(spark, dest, "k < 5")
    assert out["mode"] == "dv" and out["n_matched"] == 5
    st = iceberg_live_files(dest)
    dvs = [d for d in st["delete_files"] if d.get("dv")]
    assert dvs and all(d["content"] == 1 for d in dvs)
    # blobs re-decode through the spec codec alone
    from rxlan_aws_lakehouse_spark.puffin_lite import read_dv_blob

    n_dv = sum(
        len(read_dv_blob(d["abs"], d["offset"], d["size"])) for d in dvs
    )
    assert n_dv == 5
    assert {r["k"] for r in import_iceberg(spark, dest).collect()} == set(
        range(5, 20)
    )
    ml_before = load_table_metadata(dest)["snapshots"][-1][
        "manifest-list"
    ]
    out2 = delete_iceberg(spark, dest, "k < 8")
    assert out2["n_matched"] == 3
    assert {r["k"] for r in import_iceberg(spark, dest).collect()} == set(
        range(8, 20)
    )
    st2 = iceberg_live_files(dest)
    dvs2 = [d for d in st2["delete_files"] if d.get("dv")]
    # each touched file carries exactly ONE dv (the union); the old
    # manifest was dropped, not layered
    refs = [d["referenced"] for d in dvs2]
    assert len(refs) == len(set(refs))
    total = sum(
        len(read_dv_blob(d["abs"], d["offset"], d["size"]))
        for d in dvs2
    )
    assert total == 8


def _bump_v3(dest):
    import json as _json

    mdir = os.path.join(dest, "metadata")
    with open(os.path.join(mdir, "v1.metadata.json")) as f:
        meta = _json.load(f)
    meta["format-version"] = 3
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        _json.dump(meta, f)


def test_delete_dv_never_collects_ordinals(spark, tmp_path, monkeypatch):
    """Scale guard (round 16): the v3 DV delete encodes roaring
    vectors EXECUTOR-side — the driver's only row-bearing collect is
    one compact (path, blob, cardinality) row per touched file, never
    the matched-row ordinals (``__ic_ri``).  A DELETE matching 10^8
    rows must not OOM the driver."""
    # Spark 4: the concrete class (pyspark.sql.DataFrame is abstract)
    from pyspark.sql.classic.dataframe import DataFrame

    dest = _export_fixture(spark, tmp_path, name="noord")
    _bump_v3(dest)
    seen = []
    orig = DataFrame.collect

    def spy(self):
        seen.append([f.name for f in self.schema.fields])
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    out = delete_iceberg(spark, dest, "k < 5")
    monkeypatch.undo()
    assert out["mode"] == "dv" and out["n_matched"] == 5
    assert seen, "expected the encode collect to be observed"
    assert all("__ic_ri" not in cols for cols in seen), seen
    assert ["fp", "dv", "card", "n_new"] in seen


def test_delete_dv_puffin_blob_lineage(spark, tmp_path):
    """The Puffin footer's blob FileMetadata carries the COMMITTING
    snapshot-id and sequence-number (not hardcoded 0) — what footer-
    reading engines use for DV lineage."""
    import json as _json
    import struct as _struct

    dest = _export_fixture(spark, tmp_path, name="lineage")
    _bump_v3(dest)
    out = delete_iceberg(spark, dest, "k < 5")
    st = iceberg_live_files(dest)
    dvs = [d for d in st["delete_files"] if d.get("dv")]
    puf = dvs[0]["abs"]
    with open(puf, "rb") as f:
        raw = f.read()
    assert raw[-4:] == b"PFA1" and raw[:4] == b"PFA1"
    (plen,) = _struct.unpack("<i", raw[-12:-8])
    payload = _json.loads(raw[-12 - plen : -12])
    assert payload["blobs"]
    for b in payload["blobs"]:
        assert b["snapshot-id"] == out["snapshot_id"]
        assert b["sequence-number"] == out["snapshot_seq"]


def test_delete_dv_v3_supersedes_position_deletes(spark, tmp_path):
    """A v3 DV delete folds a touched file's prior POSITION deletes
    into the union (the replacement rule) and drops their manifest
    when fully superseded."""
    import json as _json

    dest = _export_fixture(spark, tmp_path, name="v3p")
    mdir = os.path.join(dest, "metadata")
    # first, a v2-era position delete (written while the table was v2)
    out1 = delete_iceberg(spark, dest, "k = 0")
    assert out1["mode"] == "pos"
    # upgrade to v3, then DV-delete more rows from the same file(s)
    vcur = max(
        int(n[1:].split(".")[0])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".metadata.json")
    )
    with open(os.path.join(mdir, f"v{vcur}.metadata.json")) as f:
        meta = _json.load(f)
    meta["format-version"] = 3
    with open(os.path.join(mdir, f"v{vcur}.metadata.json"), "w") as f:
        _json.dump(meta, f)
    out2 = delete_iceberg(spark, dest, "k < 6")
    assert out2["mode"] == "dv" and out2["n_matched"] == 5  # 1..5
    assert {r["k"] for r in import_iceberg(spark, dest).collect()} == set(
        range(6, 20)
    )
    # if the old pos-delete file's rows all landed in touched files,
    # its manifest is gone; either way no position file is applied to
    # a DV-bearing file (the importer's replacement rule is separately
    # tested) and counts are exact
    st = iceberg_live_files(dest)
    dvs = [d for d in st["delete_files"] if d.get("dv")]
    from rxlan_aws_lakehouse_spark.puffin_lite import read_dv_blob

    total = sum(
        len(read_dv_blob(d["abs"], d["offset"], d["size"]))
        for d in dvs
    )
    assert total == 6  # union carries k=0 too


def test_delete_refusals(spark, tmp_path):
    import json as _json

    dest = _export_fixture(spark, tmp_path, name="rf")
    mdir = os.path.join(dest, "metadata")
    with open(os.path.join(mdir, "v1.metadata.json")) as f:
        meta = _json.load(f)
    # v2 table refuses mode='dv'
    with pytest.raises(ValueError, match="format-version 3"):
        delete_iceberg(spark, dest, "k = 1", mode="dv")
    # v1 refuses entirely
    meta1 = dict(meta)
    meta1["format-version"] = 1
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        _json.dump(meta1, f)
    with pytest.raises(ValueError, match="format-version 1"):
        delete_iceberg(spark, dest, "k = 1")
    # restore v2; no-match is a no-op
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        _json.dump(meta, f)
    out = delete_iceberg(spark, dest, "k > 1000")
    assert out["snapshot_seq"] is None and out["n_matched"] == 0


def test_delete_eq_bearing_table_lands_correct_rows(spark, tmp_path):
    """Equality-delete-bearing snapshots no longer refuse (round 16,
    r15 verdict task 3 — Flink CDC writers produce them by default):
    the lineage scan applies the eq deletes distributed
    (``_apply_eq_exclusion``), so (a) a DELETE matching a live row
    lands, (b) an already-equality-deleted row never re-matches, and
    (c) the eq delete file stays live in the manifests and keeps
    applying on read."""
    from tests.test_iceberg_import import Ice

    def eq_table(name):
        t = Ice(str(tmp_path / name))
        f1 = t.write_file("a.parquet", [1, 2, 3], "x")
        ed = t.write_eq_delete(
            "ed.parquet",
            {"k": (1, __import__("pyarrow").int64(), [2])},
        )
        m1 = t.manifest(
            "m1.avro", [t.entry(f1, [1, 2, 3], "x")], ["x"], seq=1
        )
        md = t.manifest(
            "md.avro",
            [
                t.del_entry(
                    ed, 2, seq=2, equality_ids=[1], partition=False
                )
            ],
            ["x"],
            content=1,
            seq=2,
            spec_id=1,
        )
        t.snapshot(1, [m1, md])
        t.metadata(
            1, current_sid=1, extra_specs=[{"spec-id": 1, "fields": []}]
        )
        return t

    # live rows are {1, 3} (k=2 equality-deleted)
    t = eq_table("eq")
    out = delete_iceberg(spark, t.root, "k = 1")
    assert out["mode"] == "pos" and out["n_matched"] == 1
    assert {r["k"] for r in import_iceberg(spark, t.root).collect()} == {
        3
    }
    st = iceberg_live_files(t.root)
    assert any(d["content"] == 2 for d in st["delete_files"])

    # a predicate matching ONLY the equality-deleted row is a noop
    t2 = eq_table("eq2")
    out2 = delete_iceberg(spark, t2.root, "k = 2")
    assert out2["n_matched"] == 0 and out2["snapshot_id"] is None
    assert {
        r["k"] for r in import_iceberg(spark, t2.root).collect()
    } == {1, 3}
