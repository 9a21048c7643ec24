"""Apache ICEBERG export: a txn snapshot as a conformant Iceberg v2
table (round 13 — the write half of the Iceberg interop, mirroring
``export_delta``'s role for Delta; with ``iceberg_import.py`` the
engine now reads AND writes both open formats BASELINE.json names).

``export_iceberg`` writes the spec's metadata tree —
``metadata/v1.metadata.json`` + ``version-hint.text``, one Avro
manifest per partition-spec group, a manifest-list Avro — over the
snapshot's data files, which are HARD-LINKED into ``dest/data/``
(zero copy; a pending deletion vector refuses, run
``materialize_deletes`` first, same boundary rule as the Delta
export).  Everything is authored from the public table spec
(https://iceberg.apache.org/spec/) via ``avro_lite.py``.

Spec mechanics that make the export readable by real engines:

* **field ids + name mapping**: txn parquet files carry no parquet
  field ids, which is exactly the case the spec's
  ``schema.name-mapping.default`` table property exists for (Hive/
  migrated files): the property maps each field id to the PHYSICAL
  column name(s) found in the files, so id-based readers bind
  correctly — including column-mapped txn tables, whose physical
  spellings differ from the logical schema names.
* **identity partition columns**: the txn layout is hive-style (values
  in directory names, NOT in the files); Iceberg readers fill missing
  identity-partition source columns from each file's manifest
  ``partition`` struct — the migrated-table convention — so the
  export declares the txn partition columns as identity partition
  fields and records typed partition values per file.
* **stats**: per-file ``lower_bounds``/``upper_bounds``/
  ``null_value_counts`` translate from the txn manifest's stats into
  the spec's single-value binary serialization — no data file is
  opened.
* **snapshot identity**: the snapshot id derives deterministically
  from the source version, and the summary carries the txn version
  string, so round-trips and re-exports are reproducible.

Scale shape: O(files) links + O(metadata) Avro bytes, zero data IO,
no SparkSession.  Self-check: ``import_iceberg`` (the independent
reader half, which binds by field id through the name mapping's
physical names) must read the export row-identically to
``TxnTable.read`` — asserted in tests at the Arrow level.
"""

from __future__ import annotations

import json
import os
import struct
import time
from datetime import date as _date, datetime as _datetime
from urllib.parse import unquote

from .avro_lite import write_avro
from .txn import TxnTable, _cm_fields, _cm_phys

_EPOCH_DATE = _date(1970, 1, 1)
_EPOCH_DT = _datetime(1970, 1, 1)


# Spark type name -> Iceberg type name (primitives the txn fixture
# surface uses; anything else exports without stats and maps to the
# closest spec type, or refuses loudly).
def _iceberg_type(spark_type: str) -> str:
    t = str(spark_type)
    simple = {
        "boolean": "boolean",
        "byte": "int",
        "short": "int",
        "integer": "int",
        "long": "long",
        "float": "float",
        "double": "double",
        "string": "string",
        "binary": "binary",
        "date": "date",
        # Spark TimestampType is session-TZ-adjusted -> timestamptz;
        # TimestampNTZ -> timestamp (the same split as the import)
        "timestamp": "timestamptz",
        "timestamp_ntz": "timestamp",
    }
    if t in simple:
        return simple[t]
    if t.startswith("decimal"):
        return t.replace("decimal", "decimal", 1)
    raise ValueError(f"cannot export type {t!r} to Iceberg")


def _bound_bytes(ice_type: str, tag: str, v) -> bytes | None:
    """txn manifest stat value -> the spec's single-value binary
    serialization for ``ice_type`` (None = omit, never wrong)."""
    try:
        if ice_type == "int":
            return struct.pack("<i", int(v))
        if ice_type == "long":
            return struct.pack("<q", int(v))
        if ice_type == "float":
            return struct.pack("<f", float(v))
        if ice_type == "double":
            return struct.pack("<d", float(v))
        if ice_type == "string" and tag == "str":
            return str(v).encode("utf-8")
        if ice_type == "date" and tag == "date":
            return struct.pack(
                "<i", (_date.fromisoformat(str(v)) - _EPOCH_DATE).days
            )
        if ice_type in ("timestamp", "timestamptz") and tag == "ts":
            dt = _datetime.fromisoformat(str(v))
            micros = int((dt - _EPOCH_DT).total_seconds() * 1_000_000)
            return struct.pack("<q", micros)
    except (TypeError, ValueError, OverflowError):
        return None
    return None


def _typed_partition(ice_type: str, raw: str | None):
    """Hive directory value -> typed Iceberg partition value."""
    if raw is None:
        return None
    if ice_type in ("int", "long"):
        return int(raw)
    if ice_type in ("float", "double"):
        return float(raw)
    return raw  # string and friends ride verbatim


_AVRO_PART_TYPE = {
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
}

_SUMMARY_SCHEMA = {
    "type": "record",
    "name": "field_summary",
    "fields": [
        {"name": "contains_null", "type": "boolean"},
        {"name": "contains_nan", "type": ["null", "boolean"]},
        {"name": "lower_bound", "type": ["null", "bytes"]},
        {"name": "upper_bound", "type": ["null", "bytes"]},
    ],
}
_ML_SCHEMA = {
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
            "type": ["null", {"type": "array", "items": _SUMMARY_SCHEMA}],
        },
    ],
}
_KV_LONG = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "kv_long",
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "long"},
        ],
    },
}
_KV_BYTES = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "kv_bytes",
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "bytes"},
        ],
    },
}


def _manifest_schema(part_fields: list[dict]) -> dict:
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
                            "name": "null_value_counts",
                            "type": ["null", _KV_LONG],
                        },
                        {
                            "name": "lower_bounds",
                            "type": ["null", _KV_BYTES],
                        },
                        {
                            "name": "upper_bounds",
                            "type": ["null", _KV_BYTES],
                        },
                    ],
                },
            },
        ],
    }


def _snapshot_id(root: str, version: str) -> int:
    import hashlib

    h = hashlib.md5(f"{root}:{version}".encode()).hexdigest()
    return int(h[:15], 16)  # positive, fits an Avro long


def export_iceberg(
    table: TxnTable,
    dest: str,
    version: str | None = None,
) -> dict:
    """Export one snapshot of ``table`` as a standalone Iceberg v2
    table at ``dest`` (created; must not already hold a ``metadata/``
    directory).  Returns ``{"n_files", "n_rows", "metadata_path",
    "snapshot_id"}``."""
    v = version or table.current_version()
    if v is None:
        raise FileNotFoundError(f"no committed version at {table.root}")
    if os.path.isdir(os.path.join(dest, "metadata")):
        raise FileExistsError(f"{dest} already holds an Iceberg table")
    if table.has_deletion_vectors(v):
        raise ValueError(
            "snapshot carries a pending deletion vector; run "
            "materialize_deletes() before exporting (Iceberg row-level "
            "deletes are a different mechanism — the export is "
            "copy-on-write)"
        )
    meta = table._meta(v)
    schema_json = meta.get("schema") or {"fields": []}
    cm = meta.get("column_mapping")
    part_by = list(meta.get("partition_by") or [])

    # Iceberg schema: logical names, sequential field ids (reuse the
    # txn mapping's ids when present so re-exports stay stable)
    cm_f = _cm_fields(cm) if cm else {}
    fields = []
    ice_types: dict[str, str] = {}
    phys_of: dict[str, str] = {}
    next_id = max(
        [int(e["id"]) for e in cm_f.values()] or [0]
    )
    for f in schema_json.get("fields", []):
        name = f["name"]
        t = f["type"] if isinstance(f["type"], str) else None
        if t is None:
            raise ValueError(
                f"cannot export nested column {name!r} to Iceberg"
            )
        entry = cm_f.get(name.lower())
        if entry is not None:
            fid = int(entry["id"])
        else:
            next_id += 1
            fid = next_id
        ice_types[name] = _iceberg_type(t)
        phys_of[name] = _cm_phys(cm, name)
        fields.append(
            {
                "id": fid,
                "name": name,
                "required": False,
                "type": ice_types[name],
            }
        )
    fid_of = {f["name"]: f["id"] for f in fields}

    # the spec's escape hatch for id-less parquet: map each field id to
    # the PHYSICAL column name the files actually carry
    name_mapping = [
        {"field-id": fid_of[n], "names": [phys_of[n]]}
        for n in fid_of
        if n not in part_by  # partition columns are not in the files
    ]

    os.makedirs(os.path.join(dest, "metadata"))
    os.makedirs(os.path.join(dest, "data"))
    entries = table.file_entries(v)
    data_root = os.path.join(table.root, "_versions", v)
    sid = _snapshot_id(table.root, v)
    part_phys = [phys_of[c] for c in part_by]

    avro_part_fields = [
        {
            "name": c,
            "type": ["null", _AVRO_PART_TYPE.get(ice_types[c], "string")],
        }
        for c in part_by
    ]
    mf_schema = _manifest_schema(avro_part_fields)

    mf_entries = []
    total_rows = 0
    part_values_seen: dict[str, list] = {c: [] for c in part_by}
    for i, rel in enumerate(sorted(entries)):
        src = os.path.join(data_root, rel)
        new_rel = f"data/e{i:06d}-{os.path.basename(rel)}"
        os.link(src, os.path.join(dest, new_rel))
        e = entries[rel]
        total_rows += int(e.get("rows", 0))
        # hive dirs carry PHYSICAL spellings; decode to typed values
        raw_pv: dict[str, str | None] = {}
        for seg in rel.split(os.sep)[:-1]:
            if "=" in seg:
                k, val = seg.split("=", 1)
                raw_pv[k] = (
                    None
                    if val == "__HIVE_DEFAULT_PARTITION__"
                    else unquote(val)
                )
        partition = {}
        for c, pc in zip(part_by, part_phys):
            tv = _typed_partition(ice_types[c], raw_pv.get(pc))
            partition[c] = tv
            part_values_seen[c].append(tv)
        lowers, uppers, nulls = [], [], []
        for name in fid_of:
            st = (e.get("columns") or {}).get(phys_of[name])
            if st is None:
                continue
            fid = fid_of[name]
            nulls.append({"key": fid, "value": int(st.get("nulls", 0))})
            lo = _bound_bytes(ice_types[name], st.get("t"), st.get("min"))
            hi = _bound_bytes(ice_types[name], st.get("t"), st.get("max"))
            if lo is not None and hi is not None:
                lowers.append({"key": fid, "value": lo})
                uppers.append({"key": fid, "value": hi})
        mf_entries.append(
            {
                "status": 1,
                "snapshot_id": sid,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.join(dest, new_rel),
                    "file_format": "PARQUET",
                    "partition": partition,
                    "record_count": int(e.get("rows", 0)),
                    "file_size_in_bytes": int(
                        e.get("bytes")
                        or os.path.getsize(os.path.join(dest, new_rel))
                    ),
                    "null_value_counts": nulls or None,
                    "lower_bounds": lowers or None,
                    "upper_bounds": uppers or None,
                },
            }
        )
    mpath = "metadata/m000.avro"
    write_avro(os.path.join(dest, mpath), mf_schema, mf_entries)
    summaries = []
    for c in part_by:
        vals = part_values_seen[c]
        non_null = [x for x in vals if x is not None]
        bb = lambda x: _bound_bytes(  # noqa: E731
            ice_types[c],
            {"int": "num", "long": "num", "float": "num",
             "double": "num"}.get(ice_types[c], "str"),
            x,
        )
        summaries.append(
            {
                "contains_null": any(x is None for x in vals),
                "contains_nan": None,
                "lower_bound": bb(min(non_null)) if non_null else None,
                "upper_bound": bb(max(non_null)) if non_null else None,
            }
        )
    ml_row = {
        "manifest_path": mpath,
        "manifest_length": os.path.getsize(os.path.join(dest, mpath)),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": 1,
        "min_sequence_number": 1,
        "added_snapshot_id": sid,
        "added_files_count": len(mf_entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": total_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": summaries if part_by else None,
    }
    write_avro(
        os.path.join(dest, "metadata/snap-1.avro"), _ML_SCHEMA, [ml_row]
    )
    now_ms = int(time.time() * 1000)
    spec_fields = [
        {
            "name": c,
            "transform": "identity",
            "source-id": fid_of[c],
            "field-id": 1000 + j,
        }
        for j, c in enumerate(part_by)
    ]
    table_meta = {
        "format-version": 2,
        "table-uuid": "%08x-0000-4000-8000-%012x"
        % (sid & 0xFFFFFFFF, sid & 0xFFFFFFFFFFFF),
        "location": dest,
        "last-sequence-number": 1,
        "last-updated-ms": now_ms,
        "last-column-id": max(fid_of.values() or [0]),
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": fields}
        ],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "last-partition-id": 1000 + max(len(spec_fields) - 1, 0),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {
            "schema.name-mapping.default": json.dumps(name_mapping),
            "rxlan.txn.source-root": table.root,
            "rxlan.txn.source-version": v,
        },
        "current-snapshot-id": sid,
        "snapshots": [
            {
                "snapshot-id": sid,
                "timestamp-ms": now_ms,
                "sequence-number": 1,
                "summary": {
                    "operation": "append",
                    "rxlan-txn-version": v,
                },
                "manifest-list": "metadata/snap-1.avro",
                "schema-id": 0,
            }
        ],
    }
    mp = os.path.join(dest, "metadata", "v1.metadata.json")
    with open(mp, "w") as f:
        json.dump(table_meta, f)
    with open(
        os.path.join(dest, "metadata", "version-hint.text"), "w"
    ) as f:
        f.write("1")
    return {
        "n_files": len(mf_entries),
        "n_rows": total_rows,
        "metadata_path": mp,
        "snapshot_id": sid,
    }
