"""Scale probe for the foreign-Iceberg import/convert paths (round 13).

Claim under test (SCALING.md): planning is O(metadata bytes) — the
metadata.json → manifest-list → manifest replay never lists a
directory or opens a data file — and both prune levels (manifest-list
field summaries, per-file bounds) plus ``convert_from_iceberg`` are
metadata-linear.  The probe authors synthetic Iceberg v2 trees of
growing FILE COUNT (tiny one-row files hard-linked from one seed, so
any data IO would show as a flat floor, not a scaling term), split
across 16 identity partitions / one manifest per partition, and times:

  * ``iceberg_live_files``                (full metadata replay)
  * replay w/ partition predicate         (manifest-level skipping:
                                           15/16 manifests unread)
  * replay w/ range predicate             (file-level bounds skipping)
  * ``convert_from_iceberg``              (zero-copy adoption,
                                           footer-verified mapping)
  * converted-table ``pruned_files``      (manifest skipping off
                                           adopted stats)

Usage: python tools/iceberg_probe.py [counts ...]
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rxlan_aws_lakehouse_spark.avro_lite import write_avro  # noqa: E402
from rxlan_aws_lakehouse_spark.iceberg_import import (  # noqa: E402
    convert_from_iceberg,
    iceberg_live_files,
)
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402

N_PARTS = 16

SUMMARY = {
    "type": "record",
    "name": "field_summary",
    "fields": [
        {"name": "contains_null", "type": "boolean"},
        {"name": "contains_nan", "type": ["null", "boolean"]},
        {"name": "lower_bound", "type": ["null", "bytes"]},
        {"name": "upper_bound", "type": ["null", "bytes"]},
    ],
}
ML_SCHEMA = {
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
            "type": ["null", {"type": "array", "items": SUMMARY}],
        },
    ],
}
KV = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "kv",
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "bytes"},
        ],
    },
}
MF_SCHEMA = {
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
                            "fields": [
                                {"name": "g", "type": ["null", "string"]}
                            ],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "lower_bounds", "type": ["null", KV]},
                    {"name": "upper_bounds", "type": ["null", KV]},
                ],
            },
        },
    ],
}


def build(root: str, n_files: int) -> None:
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    sch = pa.schema(
        [
            pa.field("k", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field("g", pa.string(), metadata={b"PARQUET:field_id": b"2"}),
        ]
    )
    manifests = []
    per = n_files // N_PARTS
    for p in range(N_PARTS):
        g = f"g{p:02d}"
        # one seed PER PARTITION: a single seed would hit the
        # filesystem's ~65k hard-link-per-inode cap at 10^5 files
        # (probe fixture artifact — real tables have distinct inodes)
        seed = os.path.join(root, "data", f"seed-{g}.parquet")
        pq.write_table(
            pa.table(
                [pa.array([0], pa.int64()), pa.array([g], pa.string())],
                schema=sch,
            ),
            seed,
        )
        entries = []
        for i in range(per):
            rel = f"data/{g}-{i:06d}.parquet"
            os.link(seed, os.path.join(root, rel))
            k = p * per + i
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": 1,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 0,
                        "file_path": rel,
                        "file_format": "PARQUET",
                        "partition": {"g": g},
                        "record_count": 1,
                        "file_size_in_bytes": 1,
                        "lower_bounds": [
                            {"key": 1, "value": struct.pack("<q", k)},
                            {"key": 2, "value": g.encode()},
                        ],
                        "upper_bounds": [
                            {"key": 1, "value": struct.pack("<q", k)},
                            {"key": 2, "value": g.encode()},
                        ],
                    },
                }
            )
        mpath = f"metadata/m{p:03d}.avro"
        write_avro(os.path.join(root, mpath), MF_SCHEMA, entries)
        manifests.append(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(
                    os.path.join(root, mpath)
                ),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "added_files_count": per,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": per,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": [
                    {
                        "contains_null": False,
                        "contains_nan": None,
                        "lower_bound": g.encode(),
                        "upper_bound": g.encode(),
                    }
                ],
            }
        )
    write_avro(os.path.join(root, "metadata/snap-1.avro"), ML_SCHEMA, manifests)
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "k", "required": False, "type": "long"},
                    {"id": 2, "name": "g", "required": False, "type": "string"},
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": "g",
                        "transform": "identity",
                        "source-id": 2,
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
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "timestamp-ms": 1,
                "sequence-number": 1,
                "summary": {"operation": "append"},
                "manifest-list": "metadata/snap-1.avro",
                "schema-id": 0,
            }
        ],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")


def build_days(root: str, n_files: int) -> None:
    """Same shape but partitioned by the ``day`` TRANSFORM of a
    timestamptz column (the most common real Iceberg layout): partition
    values are day ordinals, manifest-list summaries carry int-date
    bounds — only transform-aware pruning (round 14) can skip here."""
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    sch = pa.schema(
        [
            pa.field("k", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field(
                "ts",
                pa.timestamp("us", tz="UTC"),
                metadata={b"PARQUET:field_id": b"2"},
            ),
        ]
    )
    DAY_US = 86_400_000_000
    day0 = 19000
    mf_schema = json.loads(json.dumps(MF_SCHEMA))
    mf_schema["fields"][4]["type"]["fields"][3]["type"]["fields"] = [
        {"name": "ts_day", "type": ["null", "int"]}
    ]
    manifests = []
    per = n_files // N_PARTS
    for p in range(N_PARTS):
        day = day0 + p
        seed = os.path.join(root, "data", f"seed-{p:02d}.parquet")
        pq.write_table(
            pa.table(
                [
                    pa.array([0], pa.int64()),
                    pa.array([0], pa.timestamp("us", tz="UTC")),
                ],
                schema=sch,
            ),
            seed,
        )
        entries = []
        for i in range(per):
            rel = f"data/d{p:02d}-{i:06d}.parquet"
            os.link(seed, os.path.join(root, rel))
            us = day * DAY_US + i
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": 1,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 0,
                        "file_path": rel,
                        "file_format": "PARQUET",
                        "partition": {"ts_day": day},
                        "record_count": 1,
                        "file_size_in_bytes": 1,
                        "lower_bounds": [
                            {"key": 2, "value": struct.pack("<q", us)}
                        ],
                        "upper_bounds": [
                            {"key": 2, "value": struct.pack("<q", us)}
                        ],
                    },
                }
            )
        mpath = f"metadata/m{p:03d}.avro"
        write_avro(os.path.join(root, mpath), mf_schema, entries)
        manifests.append(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(
                    os.path.join(root, mpath)
                ),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "added_files_count": per,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": per,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": [
                    {
                        "contains_null": False,
                        "contains_nan": None,
                        "lower_bound": struct.pack("<i", day),
                        "upper_bound": struct.pack("<i", day),
                    }
                ],
            }
        )
    write_avro(
        os.path.join(root, "metadata/snap-1.avro"), ML_SCHEMA, manifests
    )
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "k", "required": False, "type": "long"},
                    {
                        "id": 2,
                        "name": "ts",
                        "required": False,
                        "type": "timestamptz",
                    },
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": "ts_day",
                        "transform": "day",
                        "source-id": 2,
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
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "timestamp-ms": 1,
                "sequence-number": 1,
                "summary": {"operation": "append"},
                "manifest-list": "metadata/snap-1.avro",
                "schema-id": 0,
            }
        ],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [64, 512, 4096]
    spark = get_spark("iceberg_probe")
    for n in counts:
        work = tempfile.mkdtemp(prefix=f"iceprobe{n}-")
        try:
            root = os.path.join(work, "t")
            build(root, n)
            t0 = time.perf_counter()
            st = iceberg_live_files(root)
            t_replay = time.perf_counter() - t0
            assert len(st["files"]) == n, (len(st["files"]), n)
            t0 = time.perf_counter()
            stp = iceberg_live_files(root, filters=[("g", "=", "g03")])
            t_pprune = time.perf_counter() - t0
            assert stp["n_manifests_skipped"] == N_PARTS - 1
            assert len(stp["files"]) == n // N_PARTS
            t0 = time.perf_counter()
            str_ = iceberg_live_files(
                root, filters=[("k", ">=", n - n // N_PARTS)]
            )
            t_rprune = time.perf_counter() - t0
            assert 0 < len(str_["files"]) <= n // N_PARTS + 1
            t0 = time.perf_counter()
            conv = convert_from_iceberg(
                spark, root, os.path.join(work, "conv")
            )
            t_conv = time.perf_counter() - t0
            t0 = time.perf_counter()
            kept, total = conv.pruned_files([("g", "=", "g03")])
            t_mprune = time.perf_counter() - t0
            assert total == n and len(kept) == n // N_PARTS
            # days(ts) TRANSFORM tree (round 14): a ts range predicate
            # can only skip manifests through transform-aware pruning
            droot = os.path.join(work, "days")
            build_days(droot, n)
            DAY_US = 86_400_000_000
            t0 = time.perf_counter()
            std = iceberg_live_files(
                droot, filters=[("ts", ">=", (19000 + 15) * DAY_US)]
            )
            t_tprune = time.perf_counter() - t0
            assert std["n_manifests_skipped"] == N_PARTS - 1
            assert len(std["files"]) == n // N_PARTS
            print(
                f"n_files={n:6d}  replay={t_replay * 1e3:7.1f}ms  "
                f"part-prune={t_pprune * 1e3:7.1f}ms  "
                f"range-prune={t_rprune * 1e3:7.1f}ms  "
                f"days-transform-prune={t_tprune * 1e3:7.1f}ms  "
                f"convert={t_conv:6.3f}s  "
                f"manifest-prune={t_mprune * 1e3:7.1f}ms",
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
