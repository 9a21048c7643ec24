"""Foreign-Delta IMPORT (round 12, r11 verdict task 2).

``import_delta`` must replay an ARBITRARY conformant ``_delta_log`` the
engine did not write: checkpoint parquet (single or multi-part) + JSON
tail, add−remove reconciliation, authoritative ``partitionValues``
(files deliberately NOT laid out hive-style here, so nothing can leak
from path inference), time travel, ``columnMapping.mode=name``
resolution (physicalName field metadata), and LOUD refusals for reader
features the engine does not implement (deletion vectors, ID-mode
column mapping, v2 checkpoints). The logs in these tests are hand-authored
from the public protocol spec — never produced by ``export_delta`` —
so they exercise the importer, not the exporter.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.delta_export import (
    export_delta,
    import_delta,
    replay_delta_log,
)
from rxlan_aws_lakehouse_spark.txn import TxnTable

SCHEMA = {
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        {"name": "cat", "type": "string", "nullable": True, "metadata": {}},
    ],
}

# spec-shaped checkpoint arrow schema: configuration / partitionValues
# are map<string,string>, exactly what real writers emit
CKPT_SCHEMA = pa.schema(
    [
        (
            "add",
            pa.struct(
                [
                    ("path", pa.string()),
                    ("partitionValues", pa.map_(pa.string(), pa.string())),
                    ("size", pa.int64()),
                    ("modificationTime", pa.int64()),
                    ("dataChange", pa.bool_()),
                ]
            ),
        ),
        (
            "remove",
            pa.struct(
                [
                    ("path", pa.string()),
                    ("deletionTimestamp", pa.int64()),
                    ("dataChange", pa.bool_()),
                ]
            ),
        ),
        (
            "metaData",
            pa.struct(
                [
                    ("id", pa.string()),
                    ("format", pa.struct([("provider", pa.string())])),
                    ("schemaString", pa.string()),
                    ("partitionColumns", pa.list_(pa.string())),
                    ("configuration", pa.map_(pa.string(), pa.string())),
                    ("createdTime", pa.int64()),
                ]
            ),
        ),
        (
            "protocol",
            pa.struct(
                [
                    ("minReaderVersion", pa.int32()),
                    ("minWriterVersion", pa.int32()),
                ]
            ),
        ),
        ("txn", pa.struct([("appId", pa.string()), ("version", pa.int64())])),
    ]
)


def _meta_action():
    return {
        "metaData": {
            "id": "foreign-1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(SCHEMA),
            "partitionColumns": ["cat"],
            "configuration": {},
            "createdTime": 0,
        }
    }


def _add(p, pv):
    return {
        "add": {
            "path": p,
            "partitionValues": pv,
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


class Foreign:
    """Hand-authored foreign Delta table: flat ``data/`` file layout
    (no hive dirs), partition values only in the log."""

    def __init__(self, root: str):
        self.root = root
        self.log = os.path.join(root, "_delta_log")
        os.makedirs(self.log)
        os.makedirs(os.path.join(root, "data"))

    def write_file(self, name, ks):
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int64()),
                    "v": pa.array([float(x) * 1.5 for x in ks], pa.float64()),
                }
            ),
            os.path.join(self.root, "data", name),
        )
        return f"data/{name}"

    def commit(self, n, actions):
        with open(os.path.join(self.log, f"{n:020d}.json"), "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    def checkpoint(self, version, adds, parts=None):
        rows = [
            {
                "metaData": {
                    "id": "foreign-1",
                    "format": {"provider": "parquet"},
                    "schemaString": json.dumps(SCHEMA),
                    "partitionColumns": ["cat"],
                    "configuration": [],
                    "createdTime": 0,
                }
            },
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        ] + [
            {
                "add": {
                    "path": p,
                    "partitionValues": list(pv.items()),
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
            for p, pv in adds
        ]
        if parts is None:
            pq.write_table(
                pa.Table.from_pylist(rows, schema=CKPT_SCHEMA),
                os.path.join(self.log, f"{version:020d}.checkpoint.parquet"),
            )
            meta = {"version": version, "size": len(rows)}
        else:
            per = -(-len(rows) // parts)
            for i in range(parts):
                pq.write_table(
                    pa.Table.from_pylist(
                        rows[i * per : (i + 1) * per], schema=CKPT_SCHEMA
                    ),
                    os.path.join(
                        self.log,
                        f"{version:020d}.checkpoint."
                        f"{i + 1:010d}.{parts:010d}.parquet",
                    ),
                )
            meta = {"version": version, "size": len(rows), "parts": parts}
        with open(os.path.join(self.log, "_last_checkpoint"), "w") as fh:
            json.dump(meta, fh)


@pytest.fixture
def foreign(tmp_path):
    f = Foreign(str(tmp_path / "foreign"))
    f1 = f.write_file("part-aaa.parquet", [1, 2, 3])
    f2 = f.write_file("part-bbb.parquet", [4, 5])
    f3 = f.write_file("part-ccc.parquet", [6])
    f4 = f.write_file("part-ddd.parquet", [7, 8])
    f.commit(
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta_action(),
            _add(f1, {"cat": "x"}),
            _add(f2, {"cat": "y"}),
        ],
    )
    f.commit(1, [_add(f3, {"cat": None})])
    f.checkpoint(
        1, [(f1, {"cat": "x"}), (f2, {"cat": "y"}), (f3, {"cat": None})]
    )
    f.commit(
        2,
        [
            {"remove": {"path": f2, "deletionTimestamp": 1, "dataChange": True}},
            _add(f4, {"cat": "y"}),
        ],
    )
    return f


def test_import_checkpoint_plus_tail(spark, foreign):
    df = import_delta(spark, foreign.root)
    assert sorted(df.columns) == ["cat", "k", "v"]
    got = {(r["k"], r["cat"]) for r in df.collect()}
    # f2 removed by the tail commit; f3's partition value is JSON null
    assert got == {
        (1, "x"), (2, "x"), (3, "x"), (6, None), (7, "y"), (8, "y")
    }
    total = df.agg(F.sum("v")).collect()[0][0]
    assert abs(total - sum(x * 1.5 for x in [1, 2, 3, 6, 7, 8])) < 1e-9


def test_import_time_travel(spark, foreign):
    # exactly at the checkpoint
    d1 = import_delta(spark, foreign.root, version=1)
    assert {r["k"] for r in d1.collect()} == {1, 2, 3, 4, 5, 6}
    # BEFORE the checkpoint: replay restarts from commit 0
    d0 = import_delta(spark, foreign.root, version=0)
    assert {r["k"] for r in d0.collect()} == {1, 2, 3, 4, 5}
    # cleaned history past the checkpoint refuses reconstructably
    os.unlink(os.path.join(foreign.log, f"{0:020d}.json"))
    with pytest.raises(FileNotFoundError, match="not reconstructable"):
        import_delta(spark, foreign.root, version=0)
    # ... while the checkpoint keeps the head readable
    assert import_delta(spark, foreign.root).count() == 6


def test_import_multipart_checkpoint(spark, foreign):
    # re-publish the same checkpoint as 2 parts, drop the single file
    os.unlink(os.path.join(foreign.log, f"{1:020d}.checkpoint.parquet"))
    foreign.checkpoint(
        1,
        [
            ("data/part-aaa.parquet", {"cat": "x"}),
            ("data/part-bbb.parquet", {"cat": "y"}),
            ("data/part-ccc.parquet", {"cat": None}),
        ],
        parts=2,
    )
    state = replay_delta_log(foreign.root)
    assert len(state["files"]) == 3  # checkpoint seeded across parts
    df = import_delta(spark, foreign.root)
    assert {r["k"] for r in df.collect()} == {1, 2, 3, 6, 7, 8}


def test_import_refusals_by_feature_name(spark, foreign):
    # deletion vector on an add action
    a = _add("data/part-eee.parquet", {"cat": "z"})
    a["add"]["deletionVector"] = {
        "storageType": "u",
        "pathOrInlineDv": "x",
        "offset": 1,
        "sizeInBytes": 1,
        "cardinality": 1,
    }
    foreign.commit(3, [a])
    with pytest.raises(ValueError, match="deletionVector"):
        import_delta(spark, foreign.root)
    # ID-mode column mapping (parquet field-id resolution) is refused;
    # name mode is supported (test_import_column_mapping_name_mode)
    md = _meta_action()
    md["metaData"]["configuration"] = {"delta.columnMapping.mode": "id"}
    foreign.commit(4, [md])
    with pytest.raises(ValueError, match="columnMapping"):
        import_delta(spark, foreign.root)
    # reader features beyond what the importer implements
    foreign.commit(
        6,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            }
        ],
    )
    with pytest.raises(ValueError, match="deletionVectors"):
        import_delta(spark, foreign.root)
    # but time travel BEFORE the feature commits still reads
    assert import_delta(spark, foreign.root, version=2).count() == 6


def test_import_unpartitioned_and_collision_fallback(spark, tmp_path):
    f = Foreign(str(tmp_path / "f2"))
    p1 = f.write_file("same-name.parquet", [1, 2])
    os.makedirs(os.path.join(f.root, "other"))
    pq.write_table(
        pa.table(
            {
                "k": pa.array([3, 4], pa.int64()),
                "v": pa.array([4.5, 6.0], pa.float64()),
            }
        ),
        os.path.join(f.root, "other", "same-name.parquet"),
    )
    p2 = "other/same-name.parquet"
    meta = _meta_action()
    f.commit(
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            meta,
            _add(p1, {"cat": "a"}),
            _add(p2, {"cat": "b"}),
        ],
    )
    # duplicate basenames: the importer falls back to exact
    # per-partition-group scans
    df = import_delta(spark, f.root)
    got = {(r["k"], r["cat"]) for r in df.collect()}
    assert got == {(1, "a"), (2, "a"), (3, "b"), (4, "b")}

    # unpartitioned table: plain one-scan path
    g = Foreign(str(tmp_path / "f3"))
    q1 = g.write_file("u1.parquet", [10, 11])
    meta2 = _meta_action()
    meta2["metaData"]["partitionColumns"] = []
    schema2 = {
        "type": "struct",
        "fields": [fld for fld in SCHEMA["fields"] if fld["name"] != "cat"],
    }
    meta2["metaData"]["schemaString"] = json.dumps(schema2)
    g.commit(
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            meta2,
            _add(q1, {}),
        ],
    )
    dg = import_delta(spark, g.root)
    assert dg.columns == ["k", "v"]
    assert {r["k"] for r in dg.collect()} == {10, 11}


def test_import_reads_own_export(spark, tmp_path):
    """Bridging check: the generic importer reads the engine's own
    export (hive layout, url-encoded partition paths, checkpoint) and
    matches TxnTable.read exactly."""
    t = TxnTable(str(tmp_path / "t"))
    t.commit(
        spark.range(60).select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * 2.0).alias("x"),
        ),
        partition_by=["g"],
    )
    dest = str(tmp_path / "mirror")
    export_delta(t, dest)
    imp = import_delta(spark, dest)
    a = sorted(
        tuple(r) for r in imp.select("id", "g", "x").collect()
    )
    b = sorted(
        tuple(r) for r in t.read(spark).select("id", "g", "x").collect()
    )
    assert a == b


def test_format_delta_import_source(spark, foreign):
    """format("delta_import"): same replay through the Spark source
    surface, plus metadata-level file skipping on pushed filters."""
    from rxlan_aws_lakehouse_spark.sources.delta_import_source import (
        DeltaImportReader,
        register_delta_import_source,
    )

    register_delta_import_source(spark)
    df = spark.read.format("delta_import").load(foreign.root)
    assert df.columns == ["k", "v", "cat"]
    got = {(r["k"], r["cat"]) for r in df.collect()}
    assert got == {
        (1, "x"), (2, "x"), (3, "x"), (6, None), (7, "y"), (8, "y")
    }
    # filters are correct THROUGH the source (re-applied row-level)
    assert (
        spark.read.format("delta_import")
        .load(foreign.root)
        .filter(F.col("cat") == "y")
        .count()
        == 2
    )
    assert (
        spark.read.format("delta_import")
        .load(foreign.root)
        .filter(F.col("cat").isNull())
        .count()
        == 1
    )
    # time travel option
    d1 = (
        spark.read.format("delta_import")
        .option("version", 1)
        .load(foreign.root)
    )
    assert {r["k"] for r in d1.collect()} == {1, 2, 3, 4, 5, 6}
    # partition-value file skipping: planning drops non-matching files
    r = DeltaImportReader({"path": foreign.root}, None)
    r._triples = [("cat", "=", "y")]
    assert len(r.partitions()) == 1  # only the post-remove 'y' file
    # a comparison on the partition column prunes the null partition
    r2 = DeltaImportReader({"path": foreign.root}, None)
    r2._triples = [("cat", "=", "zzz")]
    assert len(r2.partitions()) == 0


def test_delta_import_stats_skipping(spark, tmp_path):
    """add.stats minValues/maxValues/nullCount prune data-column
    ranges at plan time — the file-skipping a foreign 100 TB mirror
    needs before Spark plans a task."""
    from rxlan_aws_lakehouse_spark.sources.delta_import_source import (
        DeltaImportReader,
    )

    f = Foreign(str(tmp_path / "s"))
    p1 = f.write_file("s1.parquet", [1, 2, 3])
    p2 = f.write_file("s2.parquet", [100, 101])

    def add_stats(p, kmin, kmax, n):
        a = _add(p, {"cat": "a"})
        a["add"]["stats"] = json.dumps(
            {
                "numRecords": n,
                "minValues": {"k": kmin},
                "maxValues": {"k": kmax},
                "nullCount": {"k": 0},
            }
        )
        return a

    f.commit(
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta_action(),
            add_stats(p1, 1, 3, 3),
            add_stats(p2, 100, 101, 2),
        ],
    )
    r = DeltaImportReader({"path": f.root}, None)
    r._triples = [("k", ">=", 50)]
    assert len(r.partitions()) == 1
    r2 = DeltaImportReader({"path": f.root}, None)
    r2._triples = [("k", "<=", 0)]
    assert len(r2.partitions()) == 0
    # and the rows stay correct through the source with the filter
    from rxlan_aws_lakehouse_spark.sources.delta_import_source import (
        register_delta_import_source,
    )

    register_delta_import_source(spark)
    assert (
        spark.read.format("delta_import")
        .load(f.root)
        .filter(F.col("k") >= 50)
        .count()
        == 2
    )


def test_import_column_mapping_name_mode(spark, tmp_path):
    """A hand-authored columnMapping.mode=name table (protocol (2,5),
    physicalName field metadata, PHYSICAL partitionValues keys) reads
    with logical names — and stats/partition skipping translates."""
    from rxlan_aws_lakehouse_spark.sources.delta_import_source import (
        DeltaImportReader,
        register_delta_import_source,
    )

    f = Foreign(str(tmp_path / "cm"))
    # physical on-disk names differ from the logical schema
    p1 = f.write_file("m1.parquet", [1, 2])   # columns k, v (physical)
    p2 = f.write_file("m2.parquet", [50, 51])
    mapped_schema = {
        "type": "struct",
        "fields": [
            {"name": "key", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "k"}},
            {"name": "val", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "v"}},
            {"name": "category", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "cat"}},
        ],
    }

    def add_cm(p, pv_phys, kmin, kmax, n):
        return {
            "add": {
                "path": p,
                "partitionValues": pv_phys,  # PHYSICAL keys per spec
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": n,
                        "minValues": {"k": kmin},   # physical keys
                        "maxValues": {"k": kmax},
                        "nullCount": {"k": 0},
                    }
                ),
            }
        }

    f.commit(
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "cm-1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(mapped_schema),
                    "partitionColumns": ["category"],
                    "configuration": {
                        "delta.columnMapping.mode": "name",
                        "delta.columnMapping.maxColumnId": "3",
                    },
                    "createdTime": 0,
                }
            },
            add_cm(p1, {"cat": "a"}, 1, 2, 2),
            add_cm(p2, {"cat": "b"}, 50, 51, 2),
        ],
    )
    df = import_delta(spark, f.root)
    assert df.columns == ["key", "val", "category"]
    got = {(r["key"], r["category"]) for r in df.collect()}
    assert got == {(1, "a"), (2, "a"), (50, "b"), (51, "b")}
    # through the format, with logical-name filters
    register_delta_import_source(spark)
    sdf = spark.read.format("delta_import").load(f.root)
    assert sdf.columns == ["key", "val", "category"]
    assert sdf.filter(F.col("category") == "b").count() == 2
    assert sdf.filter(F.col("key") >= 50).count() == 2
    # plan-time skipping translates logical predicates to physical keys
    from pyspark.sql.types import StructType

    logical = StructType.fromJson(mapped_schema)
    r = DeltaImportReader({"path": f.root}, logical)
    r._triples = [("key", ">=", 40)]
    assert len(r.partitions()) == 1
    r2 = DeltaImportReader({"path": f.root}, logical)
    r2._triples = [("category", "=", "a")]
    assert len(r2.partitions()) == 1


def test_mapped_export_round_trips(spark, tmp_path):
    """A txn table with a DIVERGED column mapping exports as a
    spec-correct columnMapping=name Delta table — zero-copy (files
    already carry physical names) — and the importer reads it back
    identical to TxnTable.read; a mirror sync carries a metadata-only
    rename as pure metadata + protocol upgrade."""
    from rxlan_aws_lakehouse_spark.delta_export import (
        export_delta_sync,
        write_delta_checkpoint,
    )

    t = TxnTable(str(tmp_path / "t"))
    t.commit(
        spark.range(40).select(
            F.col("id"),
            (F.col("id") % 4).cast("string").alias("g"),
            (F.col("id") * 2.0).alias("x"),
        ),
        partition_by=["g"],
    )
    dest = str(tmp_path / "mirror")
    export_delta_sync(t, dest)  # bootstrap: plain (1,2) table
    state0 = replay_delta_log(dest)
    assert (state0["protocol"] or {}).get("minReaderVersion", 1) == 1
    # metadata-only rename on the source, then sync: the mirror gains
    # a protocol upgrade + mapped metaData, NO data files move
    t.rename_column(spark, "x", "score")
    out = export_delta_sync(t, dest)
    assert out["schema_changed"] is True
    assert out["n_adds"] == 0 and out["n_removes"] == 0
    state1 = replay_delta_log(dest)
    assert state1["protocol"]["minReaderVersion"] == 2
    cfg = state1["configuration"]
    assert cfg["delta.columnMapping.mode"] == "name"
    fields = {f["name"]: f for f in state1["schema"]["fields"]}
    assert (
        fields["score"]["metadata"]["delta.columnMapping.physicalName"]
        == "x"
    )
    imp = import_delta(spark, dest)
    assert sorted(imp.columns) == ["g", "id", "score"]
    a = sorted(tuple(r) for r in imp.select("id", "g", "score").collect())
    b = sorted(
        tuple(r)
        for r in t.read(spark).select("id", "g", "score").collect()
    )
    assert a == b
    # a checkpoint must preserve the upgraded protocol + configuration
    write_delta_checkpoint(dest)
    for n in os.listdir(os.path.join(dest, "_delta_log")):
        if n.endswith(".json"):
            os.unlink(os.path.join(dest, "_delta_log", n))
    state2 = replay_delta_log(dest)
    assert state2["protocol"]["minReaderVersion"] == 2
    assert (
        state2["configuration"]["delta.columnMapping.mode"] == "name"
    )
    imp2 = import_delta(spark, dest)
    assert imp2.count() == 40
    # a FRESH export of a mapped table is mapped from commit 0 too
    dest2 = str(tmp_path / "mirror2")
    export_delta(t, dest2)
    st = replay_delta_log(dest2)
    assert st["protocol"]["minReaderVersion"] == 2
    assert import_delta(spark, dest2).count() == 40


def test_router_attach_delta_import(spark, foreign):
    """CREATE TABLE ... USING DELTA_IMPORT attaches a foreign Delta
    table as a read-only SQL view; VERSION AS OF pins time travel;
    DROP TABLE detaches without touching the foreign log."""
    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter

    router = TxnSqlRouter(spark)
    router.sql(
        "CREATE TABLE fdelta USING DELTA_IMPORT "
        f"LOCATION '{foreign.root}'"
    )
    got = {
        (r["k"], r["cat"])
        for r in router.sql("SELECT k, cat FROM fdelta").collect()
    }
    assert got == {
        (1, "x"), (2, "x"), (3, "x"), (6, None), (7, "y"), (8, "y")
    }
    router.sql(
        "CREATE TABLE fdelta_v1 USING DELTA_IMPORT "
        f"LOCATION '{foreign.root}' VERSION AS OF 1"
    )
    assert (
        router.sql("SELECT count(*) AS n FROM fdelta_v1").collect()[0]["n"]
        == 6
    )
    router.sql("DROP TABLE fdelta")
    router.sql("DROP TABLE fdelta_v1")
    # the foreign log is untouched by the detach
    assert os.path.exists(
        os.path.join(foreign.log, f"{2:020d}.json")
    )


def test_streaming_foreign_delta(spark, tmp_path):
    """readStream.format("delta_import"): tail a foreign commit log —
    dataChange=false compaction rewrites are never re-emitted,
    restarts resume exactly-once from the checkpoint, removes refuse
    without ignoreDeletes, and a mid-stream schema change fails
    loudly (Delta streaming-source semantics)."""
    from rxlan_aws_lakehouse_spark.sources.delta_import_source import (
        register_delta_import_source,
    )

    register_delta_import_source(spark)
    f = Foreign(str(tmp_path / "ft"))
    meta = _meta_action()

    def dc_add(p, pv, dc=True):
        a = _add(p, pv)
        a["add"]["dataChange"] = dc
        return a

    f.commit(
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            meta,
            dc_add(f.write_file("a.parquet", [1, 2]), {"cat": "x"}),
        ],
    )
    f.commit(1, [dc_add(f.write_file("b.parquet", [3]), {"cat": "y"})])
    # compaction rewrite: same rows, dataChange=false — must be skipped
    f.commit(
        2,
        [dc_add(f.write_file("c.parquet", [1, 2, 3]), {"cat": "x"}, False)],
    )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("delta_import")
            .option("startingVersion", "earliest")
            .load(f.root)
            .writeStream.format("parquet")
            .option("path", out)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["k"], r["cat"]) for r in spark.read.parquet(out).collect()
        }

    assert drain() == {(1, "x"), (2, "x"), (3, "y")}
    # new commit + restart: exactly-once, only the new rows land
    f.commit(3, [dc_add(f.write_file("d.parquet", [9]), {"cat": None})])
    assert drain() == {(1, "x"), (2, "x"), (3, "y"), (9, None)}

    # a remove fails the stream unless ignoreDeletes
    f.commit(
        4,
        [
            {
                "remove": {
                    "path": "data/b.parquet",
                    "deletionTimestamp": 1,
                    "dataChange": True,
                }
            }
        ],
    )
    q = (
        spark.readStream.format("delta_import")
        .option("startingVersion", "earliest")
        .load(f.root)
        .writeStream.format("memory")
        .queryName("fdel_stream_err")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_err"))
        .start()
    )
    with pytest.raises(Exception, match="ignoreDeletes"):
        q.awaitTermination(120)
    q2 = (
        spark.readStream.format("delta_import")
        .option("startingVersion", "earliest")
        .option("ignoreDeletes", "true")
        .load(f.root)
        .writeStream.format("memory")
        .queryName("fdel_stream_ok")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ok"))
        .start()
    )
    q2.awaitTermination(120)
    assert spark.table("fdel_stream_ok").count() == 4

    # a schema change MID-STREAM (after the reader planned) fails
    # loudly: the plan pinned the old schema, the tail commit carries a
    # new schemaString — restart to pick it up (Delta's own semantics)
    import time as _time

    q3 = (
        spark.readStream.format("delta_import")
        .option("startingVersion", "latest")
        .option("ignoreDeletes", "true")
        .load(f.root)
        .writeStream.format("memory")
        .queryName("fdel_stream_schema")
        .trigger(processingTime="1 second")
        .option("checkpointLocation", str(tmp_path / "ckpt_schema"))
        .start()
    )
    try:
        deadline = _time.time() + 60
        while q3.lastProgress is None and _time.time() < deadline:
            _time.sleep(0.2)  # reader planned, stream live
        schema2 = {
            "type": "struct",
            "fields": SCHEMA["fields"]
            + [
                {
                    "name": "extra",
                    "type": "double",
                    "nullable": True,
                    "metadata": {},
                }
            ],
        }
        meta2 = {
            "metaData": {
                **meta["metaData"], "schemaString": json.dumps(schema2)
            }
        }
        f.commit(5, [meta2])
        while q3.exception() is None and _time.time() < deadline:
            _time.sleep(0.2)
        exc = q3.exception()
        assert exc is not None and "schema change" in str(exc)
    finally:
        q3.stop()


def test_convert_from_delta_zero_copy(spark, foreign, tmp_path):
    """convert_from_delta adopts a foreign table's files by hard link
    under a hive layout derived from the log's partitionValues, with
    stats translated from add.stats — and the converted table is a
    full txn citizen (reads, prunes, merges, time-travels)."""
    from rxlan_aws_lakehouse_spark.delta_export import convert_from_delta

    t = convert_from_delta(spark, foreign.root, str(tmp_path / "conv"))
    meta = t._meta(t.current_version())
    assert meta["operation"] == "convert_from_delta"
    assert meta["n_files_written"] == 0  # zero-copy: links only
    assert meta["partition_by"] == ["cat"]
    df = t.read(spark)
    got = {(r["k"], r["cat"]) for r in df.collect()}
    assert got == {
        (1, "x"), (2, "x"), (3, "x"), (6, None), (7, "y"), (8, "y")
    }
    # the adopted files are the SAME inodes as the source's
    src_inode = os.stat(
        os.path.join(foreign.root, "data", "part-aaa.parquet")
    ).st_ino
    assert src_inode in {
        os.stat(os.path.join(t.root, "_versions", t.current_version(), r)).st_ino
        for r in t.files()
    }
    # partition pruning off the adopted layout
    kept, total = t.pruned_files([("cat", "=", "y")])
    assert 0 < len(kept) < total
    # null partition round-trips through the hive sentinel
    assert df.filter(F.col("cat").isNull()).count() == 1
    # the converted table takes ordinary txn writes
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(1, 999.0, "x")], "k long, v double, cat string"
        ),
        ["k"],
    )
    assert t.read(spark).filter(F.col("k") == 1).first()["v"] == 999.0


def test_convert_mapped_delta_full_fidelity(spark, tmp_path):
    """A columnMapping=name source converts at full fidelity: its
    physical names and field ids become the txn column_mapping, so the
    logical schema reads without touching a single file — and a
    re-export round-trips the mapping."""
    from rxlan_aws_lakehouse_spark.delta_export import (
        convert_from_delta,
        export_delta,
        import_delta,
        replay_delta_log,
    )

    # build a mapped source the honest way: a txn table with a
    # metadata-only rename, exported as columnMapping=name
    src = TxnTable(str(tmp_path / "src"))
    src.commit(
        spark.range(30).select(
            F.col("id"), (F.col("id") * 3.0).alias("x")
        )
    )
    src.rename_column(spark, "x", "score")
    mirror = str(tmp_path / "mirror")
    export_delta(src, mirror)
    assert replay_delta_log(mirror)["protocol"]["minReaderVersion"] == 2

    t = convert_from_delta(spark, mirror, str(tmp_path / "conv"))
    meta = t._meta(t.current_version())
    assert meta["n_files_written"] == 0
    cm = meta["column_mapping"]
    assert cm["fields"]["score"]["physical"] == "x"
    df = t.read(spark)
    assert df.columns == ["id", "score"]
    assert df.agg(F.sum("score")).collect()[0][0] == sum(
        i * 3.0 for i in range(30)
    )
    # stats came from add.stats: range pruning works without a rescan
    kept, total = t.pruned_files([("score", ">", 10_000.0)])
    assert kept == [] and total > 0
    # and the converted table re-exports as a mapped Delta table that
    # the importer reads back identically
    mirror2 = str(tmp_path / "mirror2")
    export_delta(t, mirror2)
    imp = import_delta(spark, mirror2)
    assert sorted(tuple(r) for r in imp.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_router_create_from_delta(spark, foreign, tmp_path):
    """CREATE TABLE ... USING TXN LOCATION ... FROM DELTA '<src>':
    the zero-copy conversion through the SQL surface, immediately
    queryable and DML-able as a txn table."""
    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter

    router = TxnSqlRouter(spark)
    root = str(tmp_path / "conv_sql")
    res = router.sql(
        f"CREATE TABLE conv USING TXN LOCATION '{root}' "
        f"FROM DELTA '{foreign.root}'"
    ).collect()[0]
    assert res["operation"] == "convert_from_delta"
    got = {
        (r["k"], r["cat"])
        for r in router.sql("SELECT k, cat FROM conv").collect()
    }
    assert got == {
        (1, "x"), (2, "x"), (3, "x"), (6, None), (7, "y"), (8, "y")
    }
    router.sql("DELETE FROM conv WHERE k = 7")
    assert (
        router.sql("SELECT count(*) AS n FROM conv").collect()[0]["n"] == 5
    )
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        router.sql(
            f"CREATE TABLE conv2 USING TXN PARTITIONED BY (cat) "
            f"LOCATION '{root}2' FROM DELTA '{foreign.root}'"
        )
