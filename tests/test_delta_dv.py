"""Foreign Delta DELETION VECTORS (r12 verdict task 1).

The codec tests build bytes by hand from the PUBLIC formats
(RoaringFormatSpec portable serialization, Z85, the PROTOCOL.md DV
file layout) so the decoder is checked against the spec, not against
this repo's own encoder.  The read tests hand-author DV-bearing
foreign tables — inline and file-backed, single and multi-DV files —
and assert deleted rows never surface through ``import_delta``,
``format("delta_import")`` (batch + stream) or a converted txn table.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rxlan_aws_lakehouse_spark.delta_dv import (
    decode_roaring_bitmap_array,
    deleted_rows,
    descriptor_spec,
    dv_file_name,
    encode_roaring_bitmap_array,
    write_dv_file,
    z85_decode,
    z85_encode,
)
from rxlan_aws_lakehouse_spark.delta_export import (
    convert_from_delta,
    import_delta,
)
from tests.test_delta_import import Foreign, _add, _meta_action


def test_z85_known_vector():
    # the ZeroMQ spec 32 reference vector: 0x86 0x4F 0xD2 0x6F
    # 0xB5 0x59 0xF7 0x5B encodes to "HelloWorld"
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    with pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="invalid Z85"):
        z85_decode('"""""')


def test_roaring_roundtrip_shapes():
    cases = [
        [],
        [0],
        [7, 3, 7, 1],  # dupes + order
        list(range(5000)),  # bitmap container
        [65535, 65536, 131072 + 5],  # several 16-bit keys
        [3, (1 << 32) + 7, (5 << 32) + 9],  # sparse high keys
    ]
    for c in cases:
        assert decode_roaring_bitmap_array(
            encode_roaring_bitmap_array(c)
        ) == sorted(set(c))


def test_roaring_run_container_decode():
    """Hand-build a RUN-container bitmap (cookie 12347 + run flag) —
    the shape real writers emit for dense deletes, which this repo's
    encoder never produces, so the decoder is tested from the spec."""
    # one container, key 0, values 10..25 as a single run
    cookie = 12347 | (0 << 16)  # (n_containers - 1) << 16
    buf = struct.pack("<i", cookie)
    buf += bytes([0b1])  # run flag for container 0
    buf += struct.pack("<HH", 0, 15)  # key 0, cardinality-1
    # < NO_OFFSET_THRESHOLD containers: no offset header
    buf += struct.pack("<H", 1)  # one run
    buf += struct.pack("<HH", 10, 15)  # start 10, length 15 -> 10..25
    data = struct.pack("<iq", 1681511377, 1) + buf
    assert decode_roaring_bitmap_array(data) == list(range(10, 26))


def test_dv_file_checksum_guard(tmp_path):
    data = encode_roaring_bitmap_array([1, 2, 3])
    p = str(tmp_path / "dv.bin")
    ((off, size),) = write_dv_file(p, [data])
    assert deleted_rows(("file", p, off, size)) == [1, 2, 3]
    # flip a data byte: CRC must catch it
    with open(p, "r+b") as f:
        f.seek(off + 4 + 5)
        b = f.read(1)
        f.seek(off + 4 + 5)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="checksum"):
        deleted_rows(("file", p, off, size))
    # size mismatch is caught before any decode
    with pytest.raises(ValueError, match="size mismatch"):
        deleted_rows(("file", p, off, size + 2))


def test_descriptor_spec_forms(tmp_path):
    data = encode_roaring_bitmap_array([4, 9])
    u = uuid.uuid4()
    rel = dv_file_name(u, "xy")
    ((off, size),) = write_dv_file(str(tmp_path / rel), [data])
    spec = descriptor_spec(
        str(tmp_path),
        {
            "storageType": "u",
            "pathOrInlineDv": "xy" + z85_encode(u.bytes),
            "offset": off,
            "sizeInBytes": size,
            "cardinality": 2,
        },
    )
    assert deleted_rows(spec) == [4, 9]
    pad = data + b"\x00" * (-len(data) % 4)
    spec_i = descriptor_spec(
        str(tmp_path),
        {"storageType": "i", "pathOrInlineDv": z85_encode(pad)},
    )
    assert deleted_rows(spec_i) == [4, 9]
    with pytest.raises(ValueError, match="storageType"):
        descriptor_spec(str(tmp_path), {"storageType": "z"})


def _dv_table(tmp_path, *, partitioned=True):
    """Foreign table: 3 files; f1 masked by an INLINE DV (rows 0,2),
    f2+f3 masked by ONE shared multi-DV .bin file (row 1 of each)."""
    f = Foreign(str(tmp_path / "dvt"))
    f1 = f.write_file("part-aaa.parquet", [1, 2, 3])  # drop 1, 3
    f2 = f.write_file("part-bbb.parquet", [4, 5])  # drop 5
    f3 = f.write_file("part-ccc.parquet", [6, 7, 8])  # drop 7
    u = uuid.uuid4()
    d2 = encode_roaring_bitmap_array([1])
    d3 = encode_roaring_bitmap_array([1])
    spans = write_dv_file(
        os.path.join(f.root, "pf", dv_file_name(u)), [d2, d3]
    )
    d1 = encode_roaring_bitmap_array([0, 2])
    pad = d1 + b"\x00" * (-len(d1) % 4)
    descs = [
        {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(pad),
            "sizeInBytes": len(d1),
            "cardinality": 2,
        },
        {
            "storageType": "u",
            "pathOrInlineDv": "pf" + z85_encode(u.bytes),
            "offset": spans[0][0],
            "sizeInBytes": spans[0][1],
            "cardinality": 1,
        },
        {
            "storageType": "u",
            "pathOrInlineDv": "pf" + z85_encode(u.bytes),
            "offset": spans[1][0],
            "sizeInBytes": spans[1][1],
            "cardinality": 1,
        },
    ]
    meta = _meta_action()
    if not partitioned:
        meta["metaData"]["partitionColumns"] = []
        schema = json.loads(meta["metaData"]["schemaString"])
        schema["fields"] = [
            fl for fl in schema["fields"] if fl["name"] != "cat"
        ]
        meta["metaData"]["schemaString"] = json.dumps(schema)
    pvs = (
        [{"cat": "x"}, {"cat": "y"}, {"cat": "y"}]
        if partitioned
        else [{}, {}, {}]
    )
    adds = []
    for rel, pv, desc in zip([f1, f2, f3], pvs, descs):
        a = _add(rel, pv)
        a["add"]["deletionVector"] = desc
        adds.append(a)
    f.commit(
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            meta,
            *adds,
        ],
    )
    return f


def test_import_deletion_vectors_partitioned(spark, tmp_path):
    f = _dv_table(tmp_path)
    df = import_delta(spark, f.root)
    got = {(r["k"], r["cat"]) for r in df.collect()}
    assert got == {(2, "x"), (4, "y"), (6, "y"), (8, "y")}
    # sum over the surviving rows only
    from pyspark.sql import functions as F

    total = df.agg(F.sum("v")).collect()[0][0]
    assert abs(total - sum(x * 1.5 for x in [2, 4, 6, 8])) < 1e-9


def test_import_deletion_vectors_unpartitioned(spark, tmp_path):
    f = _dv_table(tmp_path, partitioned=False)
    df = import_delta(spark, f.root)
    assert {r["k"] for r in df.collect()} == {2, 4, 6, 8}


def test_format_delta_import_deletion_vectors(spark, tmp_path):
    from rxlan_aws_lakehouse_spark.sources.delta_import_source import (
        register_delta_import_source,
    )

    register_delta_import_source(spark)
    f = _dv_table(tmp_path)
    df = spark.read.format("delta_import").load(f.root)
    assert {(r["k"], r["cat"]) for r in df.collect()} == {
        (2, "x"), (4, "y"), (6, "y"), (8, "y")
    }
    # pushed filters still prune + re-apply row-level above the mask
    assert {
        r["k"]
        for r in df.filter(df.cat == "y").collect()
    } == {4, 6, 8}


def test_convert_adopts_deletion_vectors(spark, tmp_path):
    """Zero-copy convert of a DV-bearing table: the foreign roaring
    masks become NATIVE txn deletion vectors (no file rewrite), so
    reads, further deletes and materialize_deletes all compose."""
    from pyspark.sql import functions as F

    f = _dv_table(tmp_path)
    conv = convert_from_delta(spark, f.root, str(tmp_path / "conv"))
    meta = conv._meta(conv.current_version())
    assert meta["n_files_written"] == 0  # zero-copy held
    assert conv.has_deletion_vectors()
    assert {r["k"] for r in conv.read(spark).collect()} == {2, 4, 6, 8}
    # a further native merge-on-read delete stacks on the adopted mask
    conv.delete_where_deferred(spark, F.col("k") == 4)
    assert {r["k"] for r in conv.read(spark).collect()} == {2, 6, 8}
    # materialization rewrites the union of both masks away
    conv.materialize_deletes(spark)
    assert not conv.has_deletion_vectors()
    assert {r["k"] for r in conv.read(spark).collect()} == {2, 6, 8}


def test_convert_refuses_cardinality_mismatch(spark, tmp_path):
    f = Foreign(str(tmp_path / "bad"))
    rel = f.write_file("part-aaa.parquet", [1, 2, 3])
    d = encode_roaring_bitmap_array([0])
    pad = d + b"\x00" * (-len(d) % 4)
    a = _add(rel, {"cat": "x"})
    a["add"]["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(pad),
        "sizeInBytes": len(d),
        "cardinality": 5,  # lies: bitmap holds 1
    }
    f.commit(
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            _meta_action(),
            a,
        ],
    )
    with pytest.raises(ValueError, match="cardinality"):
        convert_from_delta(spark, f.root, str(tmp_path / "c2"))


def test_import_dv_duplicate_basename_refused(spark, tmp_path):
    """Duplicate basenames in one scan group make the (basename,
    row_index) mask key ambiguous — refused loudly, never misread."""
    f = Foreign(str(tmp_path / "dup"))
    rel1 = f.write_file("same.parquet", [1, 2])
    os.makedirs(os.path.join(f.root, "other"))
    pq.write_table(
        pa.table(
            {
                "k": pa.array([3, 4], pa.int64()),
                "v": pa.array([4.5, 6.0], pa.float64()),
            }
        ),
        os.path.join(f.root, "other", "same.parquet"),
    )
    d = encode_roaring_bitmap_array([0])
    pad = d + b"\x00" * (-len(d) % 4)
    a1 = _add(rel1, {"cat": "x"})
    a1["add"]["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(pad),
        "sizeInBytes": len(d),
        "cardinality": 1,
    }
    # same partition value -> same scan group as rel1
    a2 = _add("other/same.parquet", {"cat": "x"})
    f.commit(
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            _meta_action(),
            a1,
            a2,
        ],
    )
    with pytest.raises(ValueError, match="duplicate"):
        import_delta(spark, f.root).collect()


def test_streaming_dv_add_with_ignore_changes(spark, tmp_path):
    """A DV re-add in the tail streams the file WITH its mask applied
    (Delta ignoreChanges semantics: rows may re-appear, deleted rows
    never); without ignoreChanges the paired remove refuses."""
    from rxlan_aws_lakehouse_spark.sources.delta_import_source import (
        register_delta_import_source,
    )

    register_delta_import_source(spark)
    f = Foreign(str(tmp_path / "st"))
    rel = f.write_file("part-aaa.parquet", [1, 2, 3])
    f.commit(
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            _meta_action(),
            _add(rel, {"cat": "x"}),
        ],
    )
    d = encode_roaring_bitmap_array([1])  # mask k=2
    pad = d + b"\x00" * (-len(d) % 4)
    a = _add(rel, {"cat": "x"})
    a["add"]["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(pad),
        "sizeInBytes": len(d),
        "cardinality": 1,
    }
    f.commit(
        1,
        [
            {
                "remove": {
                    "path": rel,
                    "deletionTimestamp": 1,
                    "dataChange": True,
                }
            },
            a,
        ],
    )
    out = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("delta_import")
        .option("startingVersion", "earliest")
        .option("ignoreChanges", "true")
        .load(f.root)
        .writeStream.format("memory")
        .queryName("dv_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", out)
        .start()
    )
    q.awaitTermination(120)
    got = [r["k"] for r in spark.table("dv_stream").collect()]
    # batch 1: full file (1,2,3); batch 2: masked re-emit (1,3)
    assert sorted(got) == [1, 1, 2, 3, 3]


def test_dv_on_column_mapped_table(spark, tmp_path):
    """DVs + columnMapping=name in ONE foreign table: physical column
    resolution and the row mask compose (the modern-Databricks default
    shape — both features on)."""
    root = str(tmp_path / "mdv")
    os.makedirs(os.path.join(root, "_delta_log"))
    os.makedirs(os.path.join(root, "data"))
    sch = pa.schema(
        [pa.field("p_k", pa.int64()), pa.field("p_v", pa.float64())]
    )
    pq.write_table(
        pa.table(
            [pa.array([1, 2, 3], pa.int64()),
             pa.array([1.5, 3.0, 4.5], pa.float64())],
            schema=sch,
        ),
        os.path.join(root, "data", "f0.parquet"),
    )
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "k",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "p_k",
                },
            },
            {
                "name": "v",
                "type": "double",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "p_v",
                },
            },
        ],
    }
    d = encode_roaring_bitmap_array([1])  # mask k=2
    pad = d + b"\x00" * (-len(d) % 4)
    a = {
        "add": {
            "path": "data/f0.parquet",
            "partitionValues": {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
            "deletionVector": {
                "storageType": "i",
                "pathOrInlineDv": z85_encode(pad),
                "sizeInBytes": len(d),
                "cardinality": 1,
            },
        }
    }
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": [
                            "columnMapping",
                            "deletionVectors",
                        ],
                        "writerFeatures": [
                            "columnMapping",
                            "deletionVectors",
                        ],
                    }
                }
            )
            + "\n"
        )
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "mdv-1",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": json.dumps(schema),
                        "partitionColumns": [],
                        "configuration": {
                            "delta.columnMapping.mode": "name",
                            "delta.columnMapping.maxColumnId": "2",
                        },
                        "createdTime": 0,
                    }
                }
            )
            + "\n"
        )
        fh.write(json.dumps(a) + "\n")
    df = import_delta(spark, root)
    assert df.columns == ["k", "v"]
    assert {(r["k"], r["v"]) for r in df.collect()} == {(1, 1.5), (3, 4.5)}
    # the Python source path composes the same two features
    from rxlan_aws_lakehouse_spark.sources.delta_import_source import (
        register_delta_import_source,
    )

    register_delta_import_source(spark)
    assert {
        r["k"]
        for r in spark.read.format("delta_import").load(root).collect()
    } == {1, 3}
    # convert adopts BOTH: mapping at full fidelity + DV as native mask
    conv = convert_from_delta(spark, root, str(tmp_path / "conv"))
    assert conv.has_deletion_vectors()
    cmap = conv._meta(conv.current_version())["column_mapping"]
    assert cmap["fields"]["k"]["physical"] == "p_k"
    assert {r["k"] for r in conv.read(spark).collect()} == {1, 3}


def test_dv_mask_broadcast_plan_and_scale_route(
    spark, tmp_path, monkeypatch
):
    """r13 verdict task 6: below the cardinality bound the DV
    anti-join's build side is an EXPLICIT broadcast (never an
    AQE-demoted shuffle on the near-unique (basename, row index)
    key); above the bound import_delta routes the whole read through
    format("delta_import"), whose Arrow reader decodes the compact
    roaring bytes per partition — no join at all."""
    import rxlan_aws_lakehouse_spark.delta_export as dx

    f = _dv_table(tmp_path)
    df = import_delta(spark, f.root)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert {(r["k"], r["cat"]) for r in df.collect()} == {
        (2, "x"), (4, "y"), (6, "y"), (8, "y")
    }
    # force the scale route: per-partition decode, no anti-join
    monkeypatch.setattr(dx, "_DV_BROADCAST_MAX_ROWS", 0)
    df2 = import_delta(spark, f.root)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan2
    assert {(r["k"], r["cat"]) for r in df2.collect()} == {
        (2, "x"), (4, "y"), (6, "y"), (8, "y")
    }
