"""Foreign-Delta IMPORT (round 12, r11 verdict task 2).

``import_delta`` must replay an ARBITRARY conformant ``_delta_log`` the
engine did not write: checkpoint parquet (single or multi-part) + JSON
tail, add−remove reconciliation, authoritative ``partitionValues``
(files deliberately NOT laid out hive-style here, so nothing can leak
from path inference), time travel, and LOUD refusals for reader
features the engine does not implement (deletion vectors, column
mapping, v2 checkpoints). The logs in these tests are hand-authored
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
    # column mapping via table configuration
    md = _meta_action()
    md["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
    foreign.commit(4, [md])
    with pytest.raises(ValueError, match="columnMapping"):
        import_delta(spark, foreign.root)
    # reader version 2 == column mapping
    foreign.commit(
        5, [{"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}]
    )
    with pytest.raises(ValueError, match="minReaderVersion=2"):
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
