"""Read-only Iceberg import (round 13, r12 verdict task 2).

Every fixture is hand-authored from the PUBLIC Iceberg table spec
(metadata.json tree + Avro manifest list + Avro manifests via
avro_lite) — never written by an Iceberg library — so these tests
exercise the importer's replay of the spec, not a library round-trip.
Data files carry parquet FIELD IDS and deliberately mismatched column
names where noted: Iceberg's reader contract is id-based binding.
"""

from __future__ import annotations

import json
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rxlan_aws_lakehouse_spark.avro_lite import read_avro, write_avro
from rxlan_aws_lakehouse_spark.iceberg_import import (
    iceberg_live_files,
    import_iceberg,
    load_table_metadata,
)

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
        {
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "field_summary",
                        "fields": [
                            {"name": "contains_null", "type": "boolean"},
                            {
                                "name": "contains_nan",
                                "type": ["null", "boolean"],
                            },
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                            },
                        ],
                    },
                },
            ],
        },
    ],
}


def manifest_schema(part_fields):
    """Manifest-entry writer schema with the given partition record
    fields (spec: the partition struct is per-spec)."""
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "sequence_number", "type": ["null", "long"]},
            {"name": "file_sequence_number", "type": ["null", "long"]},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": part_fields,
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {
                            "name": "equality_ids",
                            "type": [
                                "null",
                                {"type": "array", "items": "int"},
                            ],
                        },
                        {
                            "name": "null_value_counts",
                            "type": [
                                "null",
                                {
                                    "type": "array",
                                    "items": {
                                        "type": "record",
                                        "name": "k121_v122",
                                        "fields": [
                                            {"name": "key", "type": "int"},
                                            {
                                                "name": "value",
                                                "type": "long",
                                            },
                                        ],
                                    },
                                },
                            ],
                        },
                        {
                            "name": "lower_bounds",
                            "type": [
                                "null",
                                {
                                    "type": "array",
                                    "items": {
                                        "type": "record",
                                        "name": "k126_v127",
                                        "fields": [
                                            {"name": "key", "type": "int"},
                                            {
                                                "name": "value",
                                                "type": "bytes",
                                            },
                                        ],
                                    },
                                },
                            ],
                        },
                        {
                            "name": "upper_bounds",
                            "type": [
                                "null",
                                {
                                    "type": "array",
                                    "items": {
                                        "type": "record",
                                        "name": "k129_v130",
                                        "fields": [
                                            {"name": "key", "type": "int"},
                                            {
                                                "name": "value",
                                                "type": "bytes",
                                            },
                                        ],
                                    },
                                },
                            ],
                        },
                        # v3 deletion-vector fields (143/144/145)
                        {
                            "name": "referenced_data_file",
                            "type": ["null", "string"],
                        },
                        {
                            "name": "content_offset",
                            "type": ["null", "long"],
                        },
                        {
                            "name": "content_size_in_bytes",
                            "type": ["null", "long"],
                        },
                    ],
                },
            },
        ],
    }


def _long_le(v):
    return struct.pack("<q", v)


def _str_b(s):
    return s.encode("utf-8")


class Ice:
    """Hand-authored Iceberg v2 table: schema (k long, v double,
    cat string), identity-partitioned by cat, field ids 1/2/3."""

    SCHEMA_FIELDS = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "double"},
        {"id": 3, "name": "cat", "required": False, "type": "string"},
    ]

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "metadata"))
        os.makedirs(os.path.join(root, "data"))
        self.snapshots: list[dict] = []

    def write_file(self, name, ks, cat, *, scramble_names=False):
        """Data file WITH field ids; Iceberg data files hold identity
        partition columns too.  ``scramble_names`` gives the columns
        file-local names so only id resolution can bind them."""
        pre = f"x_{name.split('.')[0]}_" if scramble_names else ""
        sch = pa.schema(
            [
                pa.field(
                    f"{pre}k" if scramble_names else "k",
                    pa.int64(),
                    metadata={b"PARQUET:field_id": b"1"},
                ),
                pa.field(
                    f"{pre}v" if scramble_names else "v",
                    pa.float64(),
                    metadata={b"PARQUET:field_id": b"2"},
                ),
                pa.field(
                    f"{pre}cat" if scramble_names else "cat",
                    pa.string(),
                    metadata={b"PARQUET:field_id": b"3"},
                ),
            ]
        )
        pq.write_table(
            pa.table(
                [
                    pa.array(ks, pa.int64()),
                    pa.array([x * 1.5 for x in ks], pa.float64()),
                    pa.array([cat] * len(ks), pa.string()),
                ],
                schema=sch,
            ),
            os.path.join(self.root, "data", name),
        )
        return f"data/{name}"

    def entry(self, rel, ks, cat, status=1, seq=None):
        return {
            "status": status,
            "snapshot_id": None,
            "sequence_number": seq,
            "file_sequence_number": None,
            "data_file": {
                "content": 0,
                "file_path": rel,
                "file_format": "PARQUET",
                "partition": {"cat": cat},
                "record_count": len(ks),
                "file_size_in_bytes": 1,
                "lower_bounds": [
                    {"key": 1, "value": _long_le(min(ks))},
                    {
                        "key": 3,
                        "value": _str_b(cat if cat is not None else ""),
                    },
                ],
                "upper_bounds": [
                    {"key": 1, "value": _long_le(max(ks))},
                    {
                        "key": 3,
                        "value": _str_b(cat if cat is not None else ""),
                    },
                ],
            },
        }

    def write_pos_delete(self, name, pairs):
        """Spec POSITION delete file: (file_path, pos) rows with the
        reserved field ids 2147483546/2147483545, sorted."""
        sch = pa.schema(
            [
                pa.field(
                    "file_path",
                    pa.string(),
                    metadata={b"PARQUET:field_id": b"2147483546"},
                ),
                pa.field(
                    "pos",
                    pa.int64(),
                    metadata={b"PARQUET:field_id": b"2147483545"},
                ),
            ]
        )
        pairs = sorted(pairs)
        pq.write_table(
            pa.table(
                [
                    pa.array([p for p, _ in pairs], pa.string()),
                    pa.array([i for _, i in pairs], pa.int64()),
                ],
                schema=sch,
            ),
            os.path.join(self.root, "data", name),
        )
        return f"data/{name}"

    def write_eq_delete(self, name, cols):
        """Spec EQUALITY delete file: ``{file_col_name: (field_id,
        pa_type, values)}`` — the column names may be scrambled; the
        field ids are the binding."""
        fields, arrays = [], []
        for cname, (fid, typ, vals) in cols.items():
            fields.append(
                pa.field(
                    cname,
                    typ,
                    metadata={b"PARQUET:field_id": str(fid).encode()},
                )
            )
            arrays.append(pa.array(vals, typ))
        pq.write_table(
            pa.table(arrays, schema=pa.schema(fields)),
            os.path.join(self.root, "data", name),
        )
        return f"data/{name}"

    def del_entry(
        self, rel, content, cat=None, seq=None, equality_ids=None,
        partition=True, bounds=None, nulls=None,
    ):
        """Manifest entry for a delete file (content 1=position,
        2=equality); ``partition=False`` for a GLOBAL delete written
        under an unpartitioned spec.  ``bounds`` = {fid: (lo_bytes,
        hi_bytes)} and ``nulls`` = {fid: n} drive the scan-planning
        bounds skip."""
        return {
            "status": 1,
            "snapshot_id": None,
            "sequence_number": seq,
            "file_sequence_number": None,
            "data_file": {
                "content": content,
                "file_path": rel,
                "file_format": "PARQUET",
                "partition": {"cat": cat} if partition else {},
                "record_count": 1,
                "file_size_in_bytes": 1,
                "equality_ids": list(equality_ids)
                if equality_ids
                else None,
                "null_value_counts": [
                    {"key": k, "value": v} for k, v in nulls.items()
                ]
                if nulls
                else None,
                "lower_bounds": [
                    {"key": k, "value": lo}
                    for k, (lo, _) in bounds.items()
                ]
                if bounds
                else None,
                "upper_bounds": [
                    {"key": k, "value": hi}
                    for k, (_, hi) in bounds.items()
                ]
                if bounds
                else None,
            },
        }

    def manifest(
        self, name, entries, cats, added_sid=1, content=0, seq=1,
        spec_id=0, part_fields=None,
    ):
        """One manifest + its manifest-list row (field summaries over
        the cat partition values it holds)."""
        if part_fields is None:
            part_fields = [{"name": "cat", "type": ["null", "string"]}]
        path = f"metadata/{name}"
        write_avro(
            os.path.join(self.root, path),
            manifest_schema(part_fields),
            entries,
        )
        non_null = [c for c in cats if c is not None]
        return {
            "manifest_path": path,
            "manifest_length": os.path.getsize(
                os.path.join(self.root, path)
            ),
            "partition_spec_id": spec_id,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": added_sid,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 1,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": [
                {
                    "contains_null": any(c is None for c in cats),
                    "contains_nan": None,
                    "lower_bound": _str_b(min(non_null))
                    if non_null
                    else None,
                    "upper_bound": _str_b(max(non_null))
                    if non_null
                    else None,
                }
            ]
            if part_fields
            else None,
        }

    def snapshot(self, sid, manifest_rows):
        ml = f"metadata/snap-{sid}.avro"
        write_avro(
            os.path.join(self.root, ml),
            MANIFEST_LIST_SCHEMA,
            manifest_rows,
        )
        self.snapshots.append(
            {
                "snapshot-id": sid,
                "timestamp-ms": sid,
                "sequence-number": sid,
                "summary": {"operation": "append"},
                "manifest-list": ml,
                "schema-id": 0,
            }
        )

    def metadata(
        self, version, current_sid, format_version=2, extra_specs=(),
        snapshot_log=None,
    ):
        meta = {
            "format-version": format_version,
            "table-uuid": "0185a0a0-0000-0000-0000-000000000000",
            "location": self.root,
            "last-sequence-number": len(self.snapshots),
            "last-updated-ms": 0,
            "last-column-id": 3,
            "schemas": [
                {
                    "type": "struct",
                    "schema-id": 0,
                    "fields": self.SCHEMA_FIELDS,
                }
            ],
            "current-schema-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": "cat",
                            "transform": "identity",
                            "source-id": 3,
                            "field-id": 1000,
                        }
                    ],
                }
            ],
            "default-spec-id": 0,
            "last-partition-id": 1000,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "properties": {},
            "current-snapshot-id": current_sid,
            "snapshots": self.snapshots,
        }
        if extra_specs:
            meta["partition-specs"] = meta["partition-specs"] + list(
                extra_specs
            )
        if snapshot_log is not None:
            meta["snapshot-log"] = snapshot_log
        with open(
            os.path.join(
                self.root, "metadata", f"v{version}.metadata.json"
            ),
            "w",
        ) as f:
            json.dump(meta, f)
        with open(
            os.path.join(self.root, "metadata", "version-hint.text"), "w"
        ) as f:
            f.write(str(version))


@pytest.fixture
def ice(tmp_path):
    t = Ice(str(tmp_path / "ice"))
    f1 = t.write_file("a.parquet", [1, 2, 3], "x", scramble_names=True)
    f2 = t.write_file("b.parquet", [10, 11], "y", scramble_names=True)
    m1 = t.manifest(
        "m1.avro",
        [t.entry(f1, [1, 2, 3], "x"), t.entry(f2, [10, 11], "y")],
        ["x", "y"],
    )
    t.snapshot(1, [m1])
    f3 = t.write_file("c.parquet", [20], "z")
    m2 = t.manifest("m2.avro", [t.entry(f3, [20], "z")], ["z"])
    t.snapshot(2, [m1, m2])
    t.metadata(2, current_sid=2)
    return t


def test_import_current_snapshot_field_id_binding(spark, ice):
    df = import_iceberg(spark, ice.root)
    assert df.columns == ["k", "v", "cat"]
    got = {(r["k"], r["cat"]) for r in df.collect()}
    # a/b have SCRAMBLED column names: only field-id binding reads them
    assert got == {
        (1, "x"), (2, "x"), (3, "x"), (10, "y"), (11, "y"), (20, "z")
    }


def test_import_snapshot_time_travel(spark, ice):
    d1 = import_iceberg(spark, ice.root, snapshot_id=1)
    assert {r["k"] for r in d1.collect()} == {1, 2, 3, 10, 11}
    with pytest.raises(ValueError, match="snapshot 99"):
        import_iceberg(spark, ice.root, snapshot_id=99)


def test_metadata_level_pruning(spark, ice):
    # partition predicate: manifest m2 (only 'z') is skipped UNREAD by
    # the manifest-list field summaries; file b pruned by its
    # partition value; file a kept
    st = iceberg_live_files(ice.root, filters=[("cat", "=", "x")])
    assert st["n_manifests_skipped"] == 1
    assert len(st["files"]) == 1 and st["files"][0].endswith("a.parquet")
    # stats range predicate on a data column (field-id keyed bounds)
    st2 = iceberg_live_files(ice.root, filters=[("k", ">=", 15)])
    assert [os.path.basename(p) for p in st2["files"]] == ["c.parquet"]
    assert st2["n_total"] == 3
    # pruning is IO-only: the read + row-level predicate still agrees
    df = import_iceberg(spark, ice.root, filters=[("k", ">=", 15)])
    assert {r["k"] for r in df.filter(df.k >= 15).collect()} == {20}


def test_refusals_by_name(spark, ice, tmp_path):
    # format-version 4 (v3 READS as of round 15 — deletion vectors)
    t4 = Ice(str(tmp_path / "v4r"))
    t4.snapshot(1, [])
    t4.metadata(1, current_sid=1, format_version=4)
    with pytest.raises(ValueError, match="format-version 4"):
        import_iceberg(spark, t4.root)
    # a DELETE manifest whose entries are DATA files is malformed
    bad = Ice(str(tmp_path / "del"))
    rel = bad.write_file("a.parquet", [1], "x")
    m = bad.manifest("m.avro", [bad.entry(rel, [1], "x")], ["x"])
    m["content"] = 1
    bad.snapshot(1, [m])
    bad.metadata(1, current_sid=1)
    with pytest.raises(ValueError, match="delete manifest entry"):
        import_iceberg(spark, bad.root)
    # ... as is a DATA manifest carrying a delete file
    bad2 = Ice(str(tmp_path / "del2"))
    rel2 = bad2.write_file("a.parquet", [1], "x")
    e = bad2.entry(rel2, [1], "x")
    e["data_file"]["content"] = 1
    bad2.snapshot(1, [bad2.manifest("m.avro", [e], ["x"])])
    bad2.metadata(1, current_sid=1)
    with pytest.raises(ValueError, match="DATA manifest"):
        import_iceberg(spark, bad2.root)
    # unknown manifest-list content refuses by number
    bad4 = Ice(str(tmp_path / "c9"))
    rel4 = bad4.write_file("a.parquet", [1], "x")
    m4 = bad4.manifest("m.avro", [bad4.entry(rel4, [1], "x")], ["x"])
    m4["content"] = 9
    bad4.snapshot(1, [m4])
    bad4.metadata(1, current_sid=1)
    with pytest.raises(ValueError, match="content=9"):
        import_iceberg(spark, bad4.root)
    # non-parquet file format
    bad3 = Ice(str(tmp_path / "orc"))
    rel3 = bad3.write_file("a.parquet", [1], "x")
    e3 = bad3.entry(rel3, [1], "x")
    e3["data_file"]["file_format"] = "ORC"
    bad3.snapshot(1, [bad3.manifest("m.avro", [e3], ["x"])])
    bad3.metadata(1, current_sid=1)
    with pytest.raises(ValueError, match="ORC"):
        import_iceberg(spark, bad3.root)


def test_deleted_status_and_null_partition(spark, tmp_path):
    """status=2 (DELETED) entries drop from the live set; a null
    partition value still reads (identity partition data rides the
    data file itself in Iceberg)."""
    t = Ice(str(tmp_path / "nullp"))
    f1 = t.write_file("a.parquet", [1, 2], "x")
    f2 = t.write_file("b.parquet", [3], None)
    m = t.manifest(
        "m.avro",
        [
            t.entry(f1, [1, 2], "x", status=2),  # deleted
            t.entry(f2, [3], None),
        ],
        ["x", None],
    )
    t.snapshot(1, [m])
    t.metadata(1, current_sid=1)
    df = import_iceberg(spark, t.root)
    assert {(r["k"], r["cat"]) for r in df.collect()} == {(3, None)}
    # null partition prunes an equality predicate on cat
    st = iceberg_live_files(t.root, filters=[("cat", "=", "x")])
    assert st["files"] == []


def test_avro_deflate_codec(tmp_path):
    """A deflate-compressed manifest (the other codec real writers
    emit) decodes identically; unknown codecs refuse by name."""
    import zlib

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    p = str(tmp_path / "t.avro")
    write_avro(p, schema, [{"x": 7}, {"x": -9}])
    # recompress the single block as deflate by hand
    with open(p, "rb") as f:
        raw = f.read()
    _, recs = read_avro(p)
    assert recs == [{"x": 7}, {"x": -9}]
    from rxlan_aws_lakehouse_spark.avro_lite import _Reader, _Writer

    r = _Reader(raw)
    r.read(4)
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        for _ in range(abs(n)):
            k = r.read(r.long()).decode()
            meta[k] = r.read(r.long())
    sync = r.read(16)
    count = r.long()
    size = r.long()
    payload = r.read(size)
    w = _Writer()
    w.write(b"Obj\x01")
    meta["avro.codec"] = b"deflate"
    w.long(len(meta))
    for k, v in meta.items():
        w.encode("string", k)
        w.long(len(v))
        w.write(v)
    w.long(0)
    w.write(sync)
    comp = zlib.compress(payload)[2:-4]  # raw deflate
    w.long(count)
    w.long(len(comp))
    w.write(comp)
    w.write(sync)
    p2 = str(tmp_path / "t2.avro")
    with open(p2, "wb") as f:
        f.write(w.out.getvalue())
    _, recs2 = read_avro(p2)
    assert recs2 == recs
    # unknown codec refuses by name
    meta["avro.codec"] = b"snappy"
    w2 = _Writer()
    w2.write(b"Obj\x01")
    w2.long(len(meta))
    for k, v in meta.items():
        w2.encode("string", k)
        w2.long(len(v))
        w2.write(v)
    w2.long(0)
    w2.write(sync)
    p3 = str(tmp_path / "t3.avro")
    with open(p3, "wb") as f:
        f.write(w2.out.getvalue())
    with pytest.raises(ValueError, match="snappy"):
        read_avro(p3)


def test_version_hint_and_latest_fallback(tmp_path, ice):
    meta = load_table_metadata(ice.root)
    assert meta["current-snapshot-id"] == 2
    # without the hint: highest v<N> wins
    os.unlink(os.path.join(ice.root, "metadata", "version-hint.text"))
    assert load_table_metadata(ice.root)["current-snapshot-id"] == 2


def test_format_iceberg_import_source(spark, ice):
    """format("iceberg_import"): same rows as import_iceberg (field-id
    binding included), snapshotId time travel, and pushed filters
    prune the planned file partitions at the metadata level."""
    from rxlan_aws_lakehouse_spark.sources.iceberg_import_source import (
        IcebergImportReader,
        register_iceberg_import_source,
    )

    register_iceberg_import_source(spark)
    df = spark.read.format("iceberg_import").load(ice.root)
    assert {(r["k"], r["cat"]) for r in df.collect()} == {
        (1, "x"), (2, "x"), (3, "x"), (10, "y"), (11, "y"), (20, "z")
    }
    d1 = (
        spark.read.format("iceberg_import")
        .option("snapshotId", 1)
        .load(ice.root)
    )
    assert {r["k"] for r in d1.collect()} == {1, 2, 3, 10, 11}
    # row-level re-application above the metadata prune
    assert {
        r["k"] for r in df.filter(df.cat == "x").collect()
    } == {1, 2, 3}
    # the reader's planned partitions shrink under pushed predicates
    rd = IcebergImportReader({"path": ice.root}, df.schema)
    assert len(rd.partitions()) == 3
    rd._triples = [("cat", "=", "x")]
    assert len(rd.partitions()) == 1


def test_router_attach_iceberg_import(spark, ice, tmp_path):
    """CREATE TABLE ... USING ICEBERG_IMPORT attaches a read-only SQL
    view; SNAPSHOT AS OF pins time travel; the shadow guard and DROP
    detach mirror the DELTA_IMPORT verb."""
    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter

    router = TxnSqlRouter(spark)
    router.sql(
        "CREATE TABLE fice USING ICEBERG_IMPORT "
        f"LOCATION '{ice.root}'"
    )
    got = {
        (r["k"], r["cat"])
        for r in router.sql("SELECT k, cat FROM fice").collect()
    }
    assert got == {
        (1, "x"), (2, "x"), (3, "x"), (10, "y"), (11, "y"), (20, "z")
    }
    router.sql(
        "CREATE TABLE fice_s1 USING ICEBERG_IMPORT "
        f"LOCATION '{ice.root}' SNAPSHOT AS OF 1"
    )
    assert (
        router.sql("SELECT count(*) AS n FROM fice_s1").collect()[0]["n"]
        == 5
    )
    with pytest.raises(ValueError, match="already exists"):
        router.sql(
            "CREATE TABLE fice USING ICEBERG_IMPORT "
            f"LOCATION '{ice.root}'"
        )
    res = router.sql(
        "CREATE TABLE IF NOT EXISTS fice USING ICEBERG_IMPORT "
        f"LOCATION '{ice.root}'"
    ).collect()[0]
    assert res["operation"] == "attach_iceberg_import_exists"
    router.sql("DROP TABLE fice")
    router.sql("DROP TABLE fice_s1")
    # the foreign metadata tree is untouched by the detach
    assert os.path.exists(
        os.path.join(ice.root, "metadata", "v2.metadata.json")
    )


def test_convert_from_iceberg_zero_copy(spark, ice, tmp_path):
    """Hard-link adoption of the current snapshot; manifest bounds
    become txn per-file stats (pruning works with zero data IO ever
    having happened); the table stays DML-able as a txn table."""
    from pyspark.sql import functions as F

    from rxlan_aws_lakehouse_spark.iceberg_import import (
        convert_from_iceberg,
    )

    # NB: the `ice` fixture's a/b files scramble names PER FILE, which
    # must refuse (ambiguous adoption) — covered below. Build a
    # consistent table here.
    t = Ice(str(tmp_path / "cons"))
    f1 = t.write_file("a.parquet", [1, 2, 3], "x")
    f2 = t.write_file("b.parquet", [10, 11], "y")
    m = t.manifest(
        "m.avro",
        [t.entry(f1, [1, 2, 3], "x"), t.entry(f2, [10, 11], "y")],
        ["x", "y"],
    )
    t.snapshot(1, [m])
    t.metadata(1, current_sid=1)
    conv = convert_from_iceberg(
        spark, t.root, str(tmp_path / "conv")
    )
    meta = conv._meta(conv.current_version())
    assert meta["operation"] == "convert_from_iceberg"
    assert meta["n_files_written"] == 0  # zero-copy held
    got = {(r["k"], r["cat"]) for r in conv.read(spark).collect()}
    assert got == {(1, "x"), (2, "x"), (3, "x"), (10, "y"), (11, "y")}
    # adopted manifest bounds prune: k range and cat equality
    kept, total = conv.pruned_files([("k", ">=", 10)])
    assert total == 2 and len(kept) == 1
    kept2, _ = conv.pruned_files([("cat", "=", "x")])
    assert len(kept2) == 1
    # ordinary txn DML on the adopted files
    conv.delete_where(spark, F.col("k") == 2)
    assert {r["k"] for r in conv.read(spark).collect()} == {1, 3, 10, 11}


def test_convert_from_iceberg_adopts_field_id_mapping(spark, tmp_path):
    """Files whose parquet column names differ from the Iceberg field
    names (uniformly) adopt as a txn column_mapping: logical names keep
    working, physical file bytes untouched."""
    from rxlan_aws_lakehouse_spark.iceberg_import import (
        convert_from_iceberg,
    )

    t = Ice(str(tmp_path / "mapped"))
    # uniform physical names p1/p2/p3 across every file
    sch = pa.schema(
        [
            pa.field("p1", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field("p2", pa.float64(), metadata={b"PARQUET:field_id": b"2"}),
            pa.field("p3", pa.string(), metadata={b"PARQUET:field_id": b"3"}),
        ]
    )
    for name, ks, cat in (("a.parquet", [1, 2], "x"), ("b.parquet", [5], "y")):
        pq.write_table(
            pa.table(
                [
                    pa.array(ks, pa.int64()),
                    pa.array([x * 1.5 for x in ks], pa.float64()),
                    pa.array([cat] * len(ks), pa.string()),
                ],
                schema=sch,
            ),
            os.path.join(t.root, "data", name),
        )
    m = t.manifest(
        "m.avro",
        [
            t.entry("data/a.parquet", [1, 2], "x"),
            t.entry("data/b.parquet", [5], "y"),
        ],
        ["x", "y"],
    )
    t.snapshot(1, [m])
    t.metadata(1, current_sid=1)
    conv = convert_from_iceberg(spark, t.root, str(tmp_path / "conv2"))
    cmap = conv._meta(conv.current_version())["column_mapping"]
    assert cmap["fields"]["k"]["physical"] == "p1"
    got = {(r["k"], r["cat"]) for r in conv.read(spark).collect()}
    assert got == {(1, "x"), (2, "x"), (5, "y")}


def test_convert_from_iceberg_refuses_ambiguous_names(spark, ice, tmp_path):
    """The `ice` fixture scrambles column names PER FILE: field id 1 is
    'x_a_k' in one file and 'x_b_k' in another — a name-based adoption
    would be ambiguous, so the convert refuses loudly."""
    from rxlan_aws_lakehouse_spark.iceberg_import import (
        convert_from_iceberg,
    )

    with pytest.raises(ValueError, match="ambiguous"):
        convert_from_iceberg(spark, ice.root, str(tmp_path / "cx"))


def test_router_create_from_iceberg(spark, tmp_path):
    """CREATE TABLE ... USING TXN LOCATION ... FROM ICEBERG '<src>':
    the zero-copy conversion through the SQL surface, immediately
    queryable and DML-able as a txn table."""
    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter

    t = Ice(str(tmp_path / "sqlsrc"))
    f1 = t.write_file("a.parquet", [1, 2, 3], "x")
    m = t.manifest("m.avro", [t.entry(f1, [1, 2, 3], "x")], ["x"])
    t.snapshot(1, [m])
    t.metadata(1, current_sid=1)
    router = TxnSqlRouter(spark)
    root = str(tmp_path / "conv_sql")
    res = router.sql(
        f"CREATE TABLE iconv USING TXN LOCATION '{root}' "
        f"FROM ICEBERG '{t.root}'"
    ).collect()[0]
    assert res["operation"] == "convert_from_iceberg"
    assert (
        router.sql("SELECT count(*) AS n FROM iconv").collect()[0]["n"]
        == 3
    )
    router.sql("DELETE FROM iconv WHERE k = 2")
    assert (
        router.sql("SELECT count(*) AS n FROM iconv").collect()[0]["n"]
        == 2
    )
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        router.sql(
            f"CREATE TABLE iconv2 USING TXN PARTITIONED BY (cat) "
            f"LOCATION '{root}2' FROM ICEBERG '{t.root}'"
        )


def test_streaming_iceberg_snapshot_tail(spark, tmp_path):
    """readStream.format("iceberg_import"): one micro-batch per new
    snapshot (ADDED files only, the spec's incremental-scan
    derivation); restarts resume exactly-once from the sink
    checkpoint; a non-append snapshot refuses without ignoreChanges."""
    from rxlan_aws_lakehouse_spark.sources.iceberg_import_source import (
        register_iceberg_import_source,
    )

    register_iceberg_import_source(spark)
    t = Ice(str(tmp_path / "stream"))
    f1 = t.write_file("a.parquet", [1, 2], "x")
    m1 = t.manifest(
        "m1.avro", [t.entry(f1, [1, 2], "x")], ["x"], added_sid=1
    )
    t.snapshot(1, [m1])
    t.metadata(1, current_sid=1)

    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        q = (
            spark.readStream.format("iceberg_import")
            .option("startingSnapshot", "earliest")
            .load(t.root)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()
    assert {r["k"] for r in spark.read.parquet(out_dir).collect()} == {
        1,
        2,
    }
    # two more append snapshots land; next run picks up EXACTLY them
    # (m1's files must not re-emit: its added_snapshot_id != new sid)
    f2 = t.write_file("b.parquet", [5], "y")
    m2 = t.manifest(
        "m2.avro", [t.entry(f2, [5], "y")], ["y"], added_sid=2
    )
    t.snapshot(2, [m1, m2])
    f3 = t.write_file("c.parquet", [9], "z")
    m3 = t.manifest(
        "m3.avro", [t.entry(f3, [9], "z")], ["z"], added_sid=3
    )
    t.snapshot(3, [m1, m2, m3])
    t.metadata(2, current_sid=3)
    run_stream()
    got = sorted(r["k"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2, 5, 9]  # exactly once, nothing re-emitted
    # an overwrite snapshot refuses loudly without ignoreChanges
    f4 = t.write_file("d.parquet", [7], "x")
    m4 = t.manifest(
        "m4.avro", [t.entry(f4, [7], "x")], ["x"], added_sid=4
    )
    t.snapshots[-1] = dict(t.snapshots[-1])
    t.snapshot(4, [m4])
    t.snapshots[-1]["summary"] = {"operation": "overwrite"}
    t.metadata(3, current_sid=4)
    try:
        run_stream()
        refused = False
    except Exception as e:
        refused = "overwrite" in str(e)
    assert refused
    # ... and streams (the whole re-written file set) WITH the flag
    q = (
        spark.readStream.format("iceberg_import")
        .option("startingSnapshot", "earliest")
        .option("ignoreChanges", "true")
        .load(t.root)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got2 = sorted(r["k"] for r in spark.read.parquet(out_dir).collect())
    assert got2 == [1, 2, 5, 7, 9]


def test_streaming_max_snapshots_per_trigger(tmp_path):
    """maxSnapshotsPerTrigger bounds catch-up batches (offset-level
    check, mirroring the txn/delta sources' maxVersionsPerTrigger)."""
    from rxlan_aws_lakehouse_spark.sources.iceberg_import_source import (
        IcebergImportStreamReader,
    )

    t = Ice(str(tmp_path / "cap"))
    rels = []
    manifests = []
    for sid in range(1, 6):
        rel = t.write_file(f"f{sid}.parquet", [sid], "x")
        rels.append(rel)
        manifests.append(
            t.manifest(
                f"m{sid}.avro",
                [t.entry(rel, [sid], "x")],
                ["x"],
                added_sid=sid,
            )
        )
        t.snapshot(sid, list(manifests))
    t.metadata(1, current_sid=5)
    from rxlan_aws_lakehouse_spark.iceberg_import import (
        load_table_metadata,
    )
    from rxlan_aws_lakehouse_spark.iceberg_import import _spark_schema

    schema = _spark_schema(load_table_metadata(t.root))
    rd = IcebergImportStreamReader(
        {
            "path": t.root,
            "startingSnapshot": "earliest",
            "maxSnapshotsPerTrigger": "2",
        },
        schema,
    )
    assert rd.initialOffset() == {"seq": 0}
    o1 = rd.latestOffset()
    assert o1 == {"seq": 2}
    assert len(rd.partitions({"seq": 0}, o1)) == 2
    o2 = rd.latestOffset()
    assert o2 == {"seq": 4}
    o3 = rd.latestOffset()
    assert o3 == {"seq": 5}  # capped at the true head


# ------------------------------------------------- row-level deletes
def _mor(tmp_path, name="mor"):
    """Merge-on-read v2 fixture (round 14): data files at sequence 1
    (snapshot 1, SCRAMBLED column names — deletes must compose with
    field-id binding), a GLOBAL position delete at sequence 2
    (snapshot 2, written under an unpartitioned spec), a GLOBAL
    equality delete on k at sequence 3 plus a NEW data file at the
    same sequence (snapshot 3 — the eq delete must not touch it)."""
    t = Ice(str(tmp_path / name))
    f1 = t.write_file("a.parquet", [1, 2, 3], "x", scramble_names=True)
    f2 = t.write_file("b.parquet", [10, 11], "y", scramble_names=True)
    m1 = t.manifest(
        "m1.avro",
        [t.entry(f1, [1, 2, 3], "x"), t.entry(f2, [10, 11], "y")],
        ["x", "y"],
        seq=1,
    )
    t.snapshot(1, [m1])
    # position delete: a.parquet row 1 (k=2), b.parquet row 0 (k=10)
    pd_rel = t.write_pos_delete(
        "pd.parquet", [(f1, 1), (f2, 0)]
    )
    m2 = t.manifest(
        "m2.avro",
        [t.del_entry(pd_rel, 1, partition=False)],
        [],
        added_sid=2,
        content=1,
        seq=2,
        spec_id=1,
        part_fields=[],
    )
    t.snapshot(2, [m1, m2])
    # equality delete on k (field id 1, SCRAMBLED file column name):
    # kills k=3 in files with seq < 3 only
    ed_rel = t.write_eq_delete(
        "ed.parquet", {"zz_k": (1, pa.int64(), [3])}
    )
    m3 = t.manifest(
        "m3.avro",
        [t.del_entry(ed_rel, 2, partition=False, equality_ids=[1])],
        [],
        added_sid=3,
        content=1,
        seq=3,
        spec_id=1,
        part_fields=[],
    )
    f3 = t.write_file("c.parquet", [3, 20], "z")
    m4 = t.manifest(
        "m4.avro",
        [t.entry(f3, [3, 20], "z", seq=3)],
        ["z"],
        added_sid=3,
        seq=3,
    )
    t.snapshot(3, [m1, m2, m3, m4])
    t.metadata(
        1, current_sid=3, extra_specs=[{"spec-id": 1, "fields": []}]
    )
    return t


def test_position_deletes_mask_rows(spark, tmp_path):
    t = _mor(tmp_path)
    df = import_iceberg(spark, t.root, snapshot_id=2)
    got = {(r["k"], r["cat"]) for r in df.collect()}
    assert got == {(1, "x"), (3, "x"), (11, "y")}


def test_equality_deletes_sequence_scoping(spark, tmp_path):
    """The eq delete (seq 3) kills k=3 in the seq-1 file but NOT in
    the seq-3 file — the spec's strictly-less rule — and composes
    with the earlier position delete."""
    t = _mor(tmp_path)
    df = import_iceberg(spark, t.root)
    got = sorted(r["k"] for r in df.collect())
    assert got == [1, 3, 11, 20]
    # the surviving k=3 is the one in c.parquet (cat z)
    assert {(r["k"], r["cat"]) for r in df.collect()} == {
        (1, "x"), (11, "y"), (3, "z"), (20, "z")
    }
    # the format source reads identically (it IS the delegate)
    from rxlan_aws_lakehouse_spark.sources.iceberg_import_source import (
        register_iceberg_import_source,
    )

    register_iceberg_import_source(spark)
    df2 = spark.read.format("iceberg_import").load(t.root)
    assert sorted(r["k"] for r in df2.collect()) == [1, 3, 11, 20]
    # row-level predicates re-apply above the masks
    assert sorted(
        r["k"] for r in df2.filter(df2.k > 2).collect()
    ) == [3, 11, 20]


def test_live_files_delete_surface(tmp_path):
    """delete_files / delete_specs surface: scoping is per data file;
    predicate pruning drops data files but never delete files."""
    t = _mor(tmp_path)
    st = iceberg_live_files(t.root)
    assert len(st["delete_files"]) == 2
    by_base = {
        os.path.basename(p): d
        for p, d in zip(st["files"], st["delete_specs"])
    }
    # seq-1 data files see both deletes; the seq-3 file sees neither
    assert len(by_base["a.parquet"]) == 2
    assert len(by_base["b.parquet"]) == 2
    assert by_base["c.parquet"] == ()
    kinds = sorted(s[0] for s in by_base["a.parquet"])
    assert kinds == ["eq", "pos"]
    # pruning: only the y partition's data file survives, its delete
    # specs still attached
    st2 = iceberg_live_files(t.root, filters=[("cat", "=", "y")])
    assert [os.path.basename(p) for p in st2["files"]] == ["b.parquet"]
    assert len(st2["delete_specs"][0]) == 2


def test_eq_delete_null_matches_null(spark, tmp_path):
    """Spec: a null value in an equality delete column matches rows
    where the column IS NULL."""
    t = Ice(str(tmp_path / "nulleq"))
    f1 = t.write_file("a.parquet", [1], None)
    f2 = t.write_file("b.parquet", [2], "x")
    m1 = t.manifest(
        "m1.avro",
        [t.entry(f1, [1], None), t.entry(f2, [2], "x")],
        [None, "x"],
        seq=1,
    )
    t.snapshot(1, [m1])
    ed = t.write_eq_delete(
        "ed.parquet", {"cat": (3, pa.string(), [None])}
    )
    m2 = t.manifest(
        "m2.avro",
        [t.del_entry(ed, 2, partition=False, equality_ids=[3])],
        [],
        content=1,
        seq=2,
        spec_id=1,
        part_fields=[],
    )
    t.snapshot(2, [m1, m2])
    t.metadata(
        1, current_sid=2, extra_specs=[{"spec-id": 1, "fields": []}]
    )
    df = import_iceberg(spark, t.root)
    assert {(r["k"], r["cat"]) for r in df.collect()} == {(2, "x")}


def test_partition_scoped_eq_delete(spark, tmp_path):
    """An equality delete written under the PARTITIONED spec applies
    only to data files of the same partition value."""
    t = Ice(str(tmp_path / "parteq"))
    f1 = t.write_file("a.parquet", [7, 8], "x")
    f2 = t.write_file("b.parquet", [7, 9], "y")
    m1 = t.manifest(
        "m1.avro",
        [t.entry(f1, [7, 8], "x"), t.entry(f2, [7, 9], "y")],
        ["x", "y"],
        seq=1,
    )
    t.snapshot(1, [m1])
    ed = t.write_eq_delete("ed.parquet", {"k": (1, pa.int64(), [7])})
    m2 = t.manifest(
        "m2.avro",
        [t.del_entry(ed, 2, cat="x", equality_ids=[1])],
        ["x"],
        content=1,
        seq=2,
    )
    t.snapshot(2, [m1, m2])
    t.metadata(1, current_sid=2)
    df = import_iceberg(spark, t.root)
    # k=7 dies in partition x only
    assert {(r["k"], r["cat"]) for r in df.collect()} == {
        (8, "x"), (7, "y"), (9, "y")
    }


def test_pos_delete_seq_scoping(spark, tmp_path):
    """A position delete applies to data files with seq <= its own —
    a data file added LATER (higher seq) is untouched even if the
    delete names its path."""
    t = Ice(str(tmp_path / "posseq"))
    f1 = t.write_file("a.parquet", [1, 2], "x")
    pd_rel = t.write_pos_delete("pd.parquet", [(f1, 0)])
    m2 = t.manifest(
        "m2.avro",
        [t.del_entry(pd_rel, 1, partition=False)],
        [],
        content=1,
        seq=1,
        spec_id=1,
        part_fields=[],
    )
    # the data file lands at seq 2, AFTER the delete
    m1 = t.manifest(
        "m1.avro", [t.entry(f1, [1, 2], "x", seq=2)], ["x"], seq=2
    )
    t.snapshot(1, [m1, m2])
    t.metadata(
        1, current_sid=1, extra_specs=[{"spec-id": 1, "fields": []}]
    )
    df = import_iceberg(spark, t.root)
    assert sorted(r["k"] for r in df.collect()) == [1, 2]


def test_sequence_inheritance(tmp_path):
    """A v2 ADDED entry with a null sequence number inherits the
    manifest's — both for data files and delete files."""
    t = _mor(tmp_path)
    st = iceberg_live_files(t.root)
    # entries in _mor carry seq=None except c.parquet; inheritance
    # gave a/b seq 1 (their manifest) and both deletes seq 2/3 —
    # already asserted structurally by test_live_files_delete_surface;
    # here assert the boundary: bump the eq delete's manifest seq down
    # and the scoping flips
    assert len(st["delete_files"]) == 2
    eq = [d for d in st["delete_files"] if d["content"] == 2][0]
    pos = [d for d in st["delete_files"] if d["content"] == 1][0]
    assert eq["seq"] == 3 and pos["seq"] == 2


def test_convert_refuses_merge_on_read(spark, tmp_path):
    from rxlan_aws_lakehouse_spark.iceberg_import import (
        convert_from_iceberg,
    )

    t = _mor(tmp_path)
    with pytest.raises(ValueError, match="DELETE files"):
        convert_from_iceberg(spark, t.root, str(tmp_path / "cv"))


def test_streaming_refuses_delete_manifests(tmp_path):
    """The stream source refuses MoR snapshots loudly by default (a
    stream cannot retract rows); ignoreDeletes skips the delete
    manifests and keeps streaming new DATA files."""
    from rxlan_aws_lakehouse_spark.iceberg_import import _spark_schema
    from rxlan_aws_lakehouse_spark.sources.iceberg_import_source import (
        IcebergImportStreamReader,
    )

    t = _mor(tmp_path)
    rd = IcebergImportStreamReader(
        {"path": t.root, "startingSnapshot": "earliest"},
        _spark_schema(load_table_metadata(t.root)),
    )
    with pytest.raises(RuntimeError, match="ignoreDeletes"):
        rd.partitions({"seq": 0}, {"seq": 3})
    rd2 = IcebergImportStreamReader(
        {
            "path": t.root,
            "startingSnapshot": "earliest",
            "ignoreDeletes": "true",
        },
        _spark_schema(load_table_metadata(t.root)),
    )
    parts = rd2.partitions({"seq": 0}, {"seq": 3})
    assert sorted(os.path.basename(p.file_path) for p in parts) == [
        "a.parquet", "b.parquet", "c.parquet",
    ]


# ---------------------------------------------------- time travel (ts)
def test_resolve_iceberg_timestamp(tmp_path, ice):
    from rxlan_aws_lakehouse_spark.iceberg_import import (
        resolve_iceberg_timestamp,
    )

    meta = load_table_metadata(ice.root)
    # fixture snapshots carry timestamp-ms 1 and 2; no snapshot-log ->
    # fallback to the snapshots' own timestamps
    assert resolve_iceberg_timestamp(meta, 1) == 1
    assert resolve_iceberg_timestamp(meta, "2") == 2
    assert resolve_iceberg_timestamp(meta, 999) == 2
    with pytest.raises(ValueError, match="at or before"):
        resolve_iceberg_timestamp(meta, 0)
    # explicit snapshot-log wins over the snapshot list
    meta2 = dict(meta)
    meta2["snapshot-log"] = [
        {"timestamp-ms": 100, "snapshot-id": 1},
        {"timestamp-ms": 200, "snapshot-id": 2},
    ]
    assert resolve_iceberg_timestamp(meta2, 150) == 1
    assert resolve_iceberg_timestamp(meta2, 200) == 2
    # ISO form parses (epoch-anchored: 1970-01-01T00:00:00.100Z)
    assert (
        resolve_iceberg_timestamp(meta2, "1970-01-01T00:00:00.150Z")
        == 1
    )


def test_import_timestamp_as_of(spark, ice):
    d1 = import_iceberg(spark, ice.root, timestamp=1)
    assert {r["k"] for r in d1.collect()} == {1, 2, 3, 10, 11}
    with pytest.raises(ValueError, match="not both"):
        import_iceberg(spark, ice.root, snapshot_id=1, timestamp=1)
    # the source option
    from rxlan_aws_lakehouse_spark.sources.iceberg_import_source import (
        register_iceberg_import_source,
    )

    register_iceberg_import_source(spark)
    d2 = (
        spark.read.format("iceberg_import")
        .option("timestampAsOf", "1")
        .load(ice.root)
    )
    assert {r["k"] for r in d2.collect()} == {1, 2, 3, 10, 11}
    # the SQL verb
    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter

    router = TxnSqlRouter(spark)
    router.sql(
        "CREATE TABLE fice_ts USING ICEBERG_IMPORT "
        f"LOCATION '{ice.root}' TIMESTAMP AS OF '1'"
    )
    assert (
        router.sql("SELECT count(*) AS n FROM fice_ts").collect()[0]["n"]
        == 5
    )
    router.sql("DROP TABLE fice_ts")


# ------------------------------------------------ transform pruning
def test_murmur3_spec_vectors():
    """Appendix B hash test vectors from the public spec."""
    from rxlan_aws_lakehouse_spark.iceberg_import import _murmur3_32

    def signed(u):
        return u - (1 << 32) if u >= (1 << 31) else u

    assert signed(_murmur3_32(struct.pack("<q", 34))) == 2017239379
    assert signed(_murmur3_32(b"iceberg")) == 1210000089
    days = 17486  # 2017-11-16
    assert signed(_murmur3_32(struct.pack("<q", days))) == -653330422


def _transform_table(tmp_path, name, transform, part_field, files):
    """Bare metadata tree partitioned by ONE transformed field over k
    (long) / cat (string) / ts-less schema; ``files`` =
    [(file_name, partition_value, summary_bounds_encoder)]."""
    t = Ice(str(tmp_path / name))
    entries = []
    for fname, pval in files:
        rel = t.write_file(fname, [1], "x")
        e = t.entry(rel, [1], "x")
        e["data_file"]["partition"] = {part_field["name"]: pval}
        e["data_file"]["lower_bounds"] = None
        e["data_file"]["upper_bounds"] = None
        entries.append(e)
    avro_t = (
        ["null", "int"]
        if isinstance(files[0][1], int)
        else ["null", "string"]
    )
    m = t.manifest(
        "m.avro",
        entries,
        [],
        seq=1,
        spec_id=1,
        part_fields=[{"name": part_field["name"], "type": avro_t}],
    )
    # field summaries over the transformed partition values
    vals = [pv for _, pv in files if pv is not None]
    enc = (
        (lambda v: struct.pack("<i", v))
        if isinstance(files[0][1], int)
        else (lambda v: v.encode())
    )
    m["partitions"] = [
        {
            "contains_null": any(pv is None for _, pv in files),
            "contains_nan": None,
            "lower_bound": enc(min(vals)) if vals else None,
            "upper_bound": enc(max(vals)) if vals else None,
        }
    ]
    t.snapshot(1, [m])
    t.metadata(
        1,
        current_sid=1,
        extra_specs=[{"spec-id": 1, "fields": [part_field]}],
    )
    return t


def test_bucket_transform_pruning(tmp_path):
    """bucket[4](k): equality predicates prune by the spec murmur3
    bucket; range predicates never prune through a bucket."""
    from rxlan_aws_lakehouse_spark.iceberg_import import _bucket_of

    b34 = _bucket_of("long", 34, 4)
    other = (b34 + 1) % 4
    pf = {
        "name": "k_bucket",
        "transform": "bucket[4]",
        "source-id": 1,
        "field-id": 1001,
    }
    t = _transform_table(
        tmp_path, "bkt", "bucket[4]", pf,
        [("a.parquet", b34), ("b.parquet", other)],
    )
    st = iceberg_live_files(t.root, filters=[("k", "=", 34)])
    assert [os.path.basename(p) for p in st["files"]] == ["a.parquet"]
    # ranges cannot prune through a hash
    st2 = iceberg_live_files(t.root, filters=[("k", ">=", 34)])
    assert len(st2["files"]) == 2


def test_truncate_transform_pruning(tmp_path):
    """truncate[2](cat): order-preserving — both equality and range
    predicates prune in partition space."""
    pf = {
        "name": "cat_trunc",
        "transform": "truncate[2]",
        "source-id": 3,
        "field-id": 1001,
    }
    t = _transform_table(
        tmp_path, "trc", "truncate[2]", pf,
        [("a.parquet", "ab"), ("b.parquet", "cd")],
    )
    st = iceberg_live_files(t.root, filters=[("cat", "=", "abX")])
    assert [os.path.basename(p) for p in st["files"]] == ["a.parquet"]
    st2 = iceberg_live_files(t.root, filters=[("cat", ">=", "ce")])
    assert st2["files"] == []
    st3 = iceberg_live_files(t.root, filters=[("cat", "<", "ac")])
    assert [os.path.basename(p) for p in st3["files"]] == ["a.parquet"]


def test_temporal_transform_pruning(tmp_path):
    """days(ts): predicate timestamps (micros or datetime) map to day
    ordinals; manifest-level summaries skip whole manifests."""
    import datetime as dt

    day0 = 19000  # some day ordinal
    us = day0 * 86_400_000_000 + 3600 * 1_000_000
    pf = {
        "name": "ts_day",
        "transform": "day",
        "source-id": 2,
        "field-id": 1001,
    }
    # schema field 2 must be a timestamp for the transform: override
    t = Ice(str(tmp_path / "tday"))
    t.SCHEMA_FIELDS = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "ts", "required": False, "type": "timestamptz"},
        {"id": 3, "name": "cat", "required": False, "type": "string"},
    ]
    entries = []
    for fname, pval in (("a.parquet", day0), ("b.parquet", day0 + 5)):
        rel = t.write_file(fname, [1], "x")
        e = t.entry(rel, [1], "x")
        e["data_file"]["partition"] = {"ts_day": pval}
        e["data_file"]["lower_bounds"] = None
        e["data_file"]["upper_bounds"] = None
        entries.append(e)
    m = t.manifest(
        "m.avro", entries, [], seq=1, spec_id=1,
        part_fields=[{"name": "ts_day", "type": ["null", "int"]}],
    )
    m["partitions"] = [
        {
            "contains_null": False,
            "contains_nan": None,
            "lower_bound": struct.pack("<i", day0),
            "upper_bound": struct.pack("<i", day0 + 5),
        }
    ]
    t.snapshot(1, [m])
    t.metadata(
        1, current_sid=1,
        extra_specs=[{"spec-id": 1, "fields": [pf]}],
    )
    # micros literal: keeps only the day0 file for equality
    st = iceberg_live_files(t.root, filters=[("ts", "=", us)])
    assert [os.path.basename(p) for p in st["files"]] == ["a.parquet"]
    # datetime literal normalizes to micros then to day ordinal
    lit = dt.datetime(1970, 1, 1) + dt.timedelta(days=day0 + 5, hours=2)
    st2 = iceberg_live_files(t.root, filters=[("ts", ">=", lit)])
    assert [os.path.basename(p) for p in st2["files"]] == ["b.parquet"]
    # a range wholly past the summary skips the manifest unread
    st3 = iceberg_live_files(
        t.root,
        filters=[("ts", ">", (day0 + 6) * 86_400_000_000)],
    )
    assert st3["n_manifests_skipped"] == 1 and st3["files"] == []


def test_transform_lit_variants():
    """_transform_lit mapping table: relaxation rules, monthly/yearly/
    hourly ordinals, bucket-on-string, and the never-prune cases."""
    from rxlan_aws_lakehouse_spark.iceberg_import import (
        _bucket_of,
        _transform_lit,
    )

    us = 17486 * 86_400_000_000 + 5 * 3_600_000_000  # 2017-11-16 05:00
    # month/year of a timestamptz micros literal
    assert _transform_lit("month", "timestamptz", "=", us) == (
        (2017 - 1970) * 12 + 10,
        "=",
    )
    assert _transform_lit("years", "timestamptz", ">", us) == (47, ">=")
    assert _transform_lit("hour", "timestamptz", "<", us) == (
        us // 3_600_000_000,
        "<=",
    )
    # month of a date (days literal)
    assert _transform_lit("months", "date", "<=", 17486) == (574, "<=")
    # bucket on a string literal (spec vector: "iceberg")
    b = _bucket_of("string", "iceberg", 8)
    assert b == (1210000089 & 0x7FFFFFFF) % 8
    assert _transform_lit("bucket[8]", "string", "=", "iceberg") == (
        b,
        "=",
    )
    # never-prune cases: void, unknown transforms, bucket ranges,
    # hour(date), bucket on unsupported types
    assert _transform_lit("void", "long", "=", 1) is None
    assert _transform_lit("zorder", "long", "=", 1) is None
    assert _transform_lit("bucket[4]", "long", ">=", 1) is None
    assert _transform_lit("hour", "date", "=", 17486) is None
    assert _transform_lit("bucket[4]", "double", "=", 1.5) is None


def test_delete_bounds_scoping(tmp_path):
    """Scan planning skips a delete file for a data file it provably
    cannot touch: an equality delete whose value bounds are disjoint
    from the data file's (both sides null-free), and a position delete
    whose file_path bounds exclude the data file — bounding executor
    reads to O(actually-overlapping pairs)."""
    t = Ice(str(tmp_path / "scope"))
    f1 = t.write_file("a.parquet", [1, 2, 3], "x")
    f2 = t.write_file("b.parquet", [100, 101], "y")
    e1 = t.entry(f1, [1, 2, 3], "x")
    e2 = t.entry(f2, [100, 101], "y")
    for e in (e1, e2):
        e["data_file"]["null_value_counts"] = [
            {"key": 1, "value": 0}, {"key": 3, "value": 0},
        ]
    m1 = t.manifest("m1.avro", [e1, e2], ["x", "y"], seq=1)
    t.snapshot(1, [m1])
    ed = t.write_eq_delete("ed.parquet", {"k": (1, pa.int64(), [2])})
    pd = t.write_pos_delete("pd.parquet", [(f1, 0)])
    m2 = t.manifest(
        "m2.avro",
        [
            t.del_entry(
                ed, 2, partition=False, equality_ids=[1],
                bounds={1: (_long_le(2), _long_le(2))},
                nulls={1: 0},
            ),
            t.del_entry(
                pd, 1, partition=False,
                bounds={
                    2147483546: (f1.encode(), f1.encode()),
                },
            ),
        ],
        [],
        added_sid=2,
        content=1,
        seq=2,
        spec_id=1,
        part_fields=[],
    )
    t.snapshot(2, [m1, m2])
    t.metadata(
        1, current_sid=2, extra_specs=[{"spec-id": 1, "fields": []}]
    )
    st = iceberg_live_files(t.root)
    by_base = {
        os.path.basename(p): specs
        for p, specs in zip(st["files"], st["delete_specs"])
    }
    # a.parquet overlaps both deletes; b.parquet provably neither
    assert sorted(s[0] for s in by_base["a.parquet"]) == ["eq", "pos"]
    assert by_base["b.parquet"] == ()
    # and withOUT null proof, the eq delete must stay conservative
    e1n = t.entry(f1, [1, 2, 3], "x")
    e2n = t.entry(f2, [100, 101], "y")
    m1n = t.manifest("m1n.avro", [e1n, e2n], ["x", "y"], seq=1)
    m2n = t.manifest(
        "m2n.avro",
        [
            t.del_entry(
                ed, 2, partition=False, equality_ids=[1],
                bounds={1: (_long_le(2), _long_le(2))},
            )
        ],
        [],
        added_sid=3,
        content=1,
        seq=2,
        spec_id=1,
        part_fields=[],
    )
    t.snapshot(3, [m1n, m2n])
    t.metadata(2, current_sid=3, extra_specs=[{"spec-id": 1, "fields": []}])
    st2 = iceberg_live_files(t.root)
    by_base2 = {
        os.path.basename(p): specs
        for p, specs in zip(st2["files"], st2["delete_specs"])
    }
    assert len(by_base2["b.parquet"]) == 1  # no null proof -> kept


def test_streaming_starting_timestamp(tmp_path, ice):
    """startingTimestamp streams from the earliest snapshot at or
    after the target (offset-level check); past-the-head timestamps
    tail only."""
    from rxlan_aws_lakehouse_spark.iceberg_import import _spark_schema
    from rxlan_aws_lakehouse_spark.sources.iceberg_import_source import (
        IcebergImportStreamReader,
    )

    schema = _spark_schema(load_table_metadata(ice.root))
    # fixture snapshots carry timestamp-ms 1 (seq 1) and 2 (seq 2)
    rd = IcebergImportStreamReader(
        {"path": ice.root, "startingTimestamp": "2"}, schema
    )
    assert rd.initialOffset() == {"seq": 1}  # snapshot 2 included
    rd2 = IcebergImportStreamReader(
        {"path": ice.root, "startingTimestamp": "999"}, schema
    )
    assert rd2.initialOffset() == {"seq": 2}  # tail-only

def test_eq_match_mask_no_cross_column_collision():
    """ADVICE r14: composite equality-delete keys are length-prefixed —
    legal string data containing separator-ish bytes must not collide
    across column boundaries, and a literal that spells the null marker
    must not match an actual null."""
    import pyarrow as pa

    from rxlan_aws_lakehouse_spark.iceberg_import import _eq_match_mask

    eqcols = ((101, "a"), (102, "b"))
    data = pa.table(
        {
            "a": ["x\x1fy", "x", "N|", None, "x"],
            "b": ["z", "y\x1fz", None, "N|", "q"],
        }
    )
    # delete ('x', 'y\x1fz') must match ONLY row 1, never row 0
    dt = pa.table({"a": ["x"], "b": ["y\x1fz"]})
    mask = _eq_match_mask(data, dt, eqcols)
    assert mask.tolist() == [False, True, False, False, False]
    # null-marker channel: delete ('N|', None) matches row 2 exactly
    # (value 'N|' + actual null), not row 3 (null + value 'N|')
    dt2 = pa.table(
        {"a": ["N|"], "b": pa.array([None], type=pa.string())}
    )
    mask2 = _eq_match_mask(data, dt2, eqcols)
    assert mask2.tolist() == [False, False, True, False, False]
    # null == null still matches per the spec
    dt3 = pa.table(
        {"a": pa.array([None], type=pa.string()), "b": ["N|"]}
    )
    assert _eq_match_mask(data, dt3, eqcols).tolist() == [
        False, False, False, True, False,
    ]

# ------------------------------------------------------- v3 read path
def _dv_del_entry(puffin_rel, referenced, offset, size, cat=None, seq=None):
    """v3 manifest entry for one deletion vector: a PUFFIN blob scoped
    to exactly one data file via referenced_data_file + the direct
    content_offset/content_size_in_bytes address."""
    return {
        "status": 1,
        "snapshot_id": None,
        "sequence_number": seq,
        "file_sequence_number": None,
        "data_file": {
            "content": 1,
            "file_path": puffin_rel,
            "file_format": "PUFFIN",
            "partition": {"cat": cat},
            "record_count": 1,
            "file_size_in_bytes": 1,
            "referenced_data_file": referenced,
            "content_offset": offset,
            "content_size_in_bytes": size,
        },
    }


def test_v3_deletion_vectors(spark, tmp_path):
    """r14 verdict task 3: a hand-authored format-version 3 table with
    Puffin deletion vectors reads correctly — the blob decodes per the
    spec (BE length prefix, D1D33964 magic, portable Roaring64,
    CRC-32), scopes to exactly its referenced data file, and REPLACES
    an older position delete for that file per the v3 rule."""
    from rxlan_aws_lakehouse_spark.puffin_lite import (
        dv_blob_bytes,
        write_puffin,
    )

    t = Ice(str(tmp_path / "v3"))
    f1 = t.write_file("a.parquet", [1, 2, 3, 4], "x")
    f2 = t.write_file("b.parquet", [5, 6], "x")
    # seq-1 position delete on f1 row 0 (k=1) — superseded by the DV
    pd1 = t.write_pos_delete("pd1.parquet", [(f1, 0)])
    # the DV at seq 2 deletes rows 1,3 of f1 (k=2, k=4); per the v3
    # rule the older position delete must NOT also apply, so k=1
    # comes BACK — asserting exactly the replacement semantics
    blob1 = dv_blob_bytes([1, 3])
    blob2 = dv_blob_bytes([0])  # f2 row 0 (k=5)
    metas = write_puffin(
        os.path.join(t.root, "data", "dvs.puffin"),
        [
            (blob1, {"referenced-data-file": f1}),
            (blob2, {"referenced-data-file": f2}),
        ],
    )
    m1 = t.manifest(
        "m1.avro",
        [t.entry(f1, [1, 2, 3, 4], "x"), t.entry(f2, [5, 6], "x")],
        ["x"],
        seq=1,
    )
    md = t.manifest(
        "md.avro",
        [
            t.del_entry(pd1, 1, cat="x", seq=1),
            _dv_del_entry(
                "data/dvs.puffin", f1,
                metas[0]["offset"], metas[0]["length"], cat="x", seq=2,
            ),
            _dv_del_entry(
                "data/dvs.puffin", f2,
                metas[1]["offset"], metas[1]["length"], cat="x", seq=2,
            ),
        ],
        ["x"],
        content=1,
        seq=2,
    )
    t.snapshot(1, [m1, md])
    t.metadata(1, current_sid=1, format_version=3)
    st = iceberg_live_files(t.root)
    assert len(st["delete_files"]) == 3
    assert sum(1 for d in st["delete_files"] if d.get("dv")) == 2
    # per-file specs: f1 gets its DV and NOT the position delete
    spec_of = dict(zip(st["files"], st["delete_specs"]))
    f1_abs = [p for p in st["files"] if p.endswith("a.parquet")][0]
    f2_abs = [p for p in st["files"] if p.endswith("b.parquet")][0]
    assert [s[0] for s in spec_of[f1_abs]] == ["dv"]
    assert [s[0] for s in spec_of[f2_abs]] == ["dv"]
    df = import_iceberg(spark, t.root)
    assert {r["k"] for r in df.collect()} == {1, 3, 6}


def test_v3_dv_crc_guard(tmp_path):
    """A corrupt DV blob fails loudly (CRC), never half-applies."""
    from rxlan_aws_lakehouse_spark.puffin_lite import (
        decode_dv_blob,
        dv_blob_bytes,
        read_dv_blob,
        write_puffin,
    )

    blob = dv_blob_bytes([2, 5, 1 << 33])
    assert decode_dv_blob(blob) == [2, 5, 1 << 33]
    p = str(tmp_path / "x.puffin")
    (m,) = write_puffin(p, [(blob, {})])
    assert read_dv_blob(p, m["offset"], m["length"]) == [2, 5, 1 << 33]
    bad = bytearray(blob)
    bad[10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_dv_blob(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        decode_dv_blob(blob[:4] + b"XXXX" + blob[8:])


def test_v4_still_refuses(tmp_path):
    t = Ice(str(tmp_path / "v4"))
    t.snapshots = []
    t.metadata(1, current_sid=-1, format_version=4)
    with pytest.raises(ValueError, match="format-version 4"):
        load_table_metadata(t.root)
