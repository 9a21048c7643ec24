"""Read-only Apache ICEBERG import (round 13, r12 verdict task 2).

``BASELINE.json``'s stated production approach is "Spark SQL + Delta/
Iceberg over S3"; round 12 built the Delta half (``import_delta``),
this module is the Iceberg twin: replay the PUBLIC Iceberg table spec
(https://iceberg.apache.org/spec/) — ``metadata/*.metadata.json`` →
snapshot → manifest-list Avro → manifest Avro → data files — and scan
the live files as one Spark DataFrame.  Nothing here touches an
Iceberg library: the Avro container files are decoded by
``avro_lite.py`` and the JSON tree is walked directly, the same
hand-rolled-from-spec posture as the Delta importer.

Spec mechanics honored:

* **current metadata**: ``version-hint.text`` when present, else the
  highest ``v<N>.metadata.json`` (the HadoopTables naming convention);
  format-version 1 and 2 replay, 3+ refuses loudly by number.
* **snapshot resolution**: ``current-snapshot-id`` by default,
  ``snapshot_id=`` pins time travel to any snapshot still listed.
* **column binding is FIELD-ID based** — the defining Iceberg reader
  rule.  The requested Spark schema carries each field's
  ``parquet.field.id`` metadata and Spark's native field-id resolution
  matches the footer ids, so renamed columns and rewritten files read
  correctly with zero name coupling (same mechanism as the Delta
  importer's id-mode, delta_export.py).
* **identity partition columns live IN the data files** (unlike hive/
  Delta) — no partition-value reattachment is needed for correctness;
  partition data in manifests is used for FILE SKIPPING only.
* **two metadata-level prunes before Spark plans a task**: the
  manifest list's per-manifest ``partitions`` field summaries skip
  whole manifests unread; each manifest entry's partition values and
  ``lower_bounds``/``upper_bounds`` (decoded per the spec's
  single-value binary serialization) skip individual files.  Both are
  conservative: unknown types/transforms never prune.
* **refusals, loudly by name**: delete manifests (``content=1`` in the
  manifest list), delete files (``data_file.content != 0``), non-
  parquet file formats, format-version ≥ 3 — each names the construct
  so a user knows exactly what the table uses.

Scale shape: O(metadata bytes) driver work — manifest Avro is KBs per
thousands of files — then ONE parquet scan of the surviving files.
A 100 TB Iceberg table imports at the cost of its metadata plus the
files the predicate keeps.
"""

from __future__ import annotations

import json
import os
import re
import struct

from .avro_lite import read_avro

_DECIMAL_RE = re.compile(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)")
_FIXED_RE = re.compile(r"fixed\[(\d+)\]")


# ------------------------------------------------------------- metadata
def _resolve(table_path: str, p: str) -> str:
    """Iceberg metadata stores absolute URIs; fixtures may use relative
    paths.  Strip a ``file:`` scheme, keep absolute paths, anchor
    relative ones at the table root."""
    if p.startswith("file://"):
        p = p[len("file://") :]
    elif p.startswith("file:"):
        p = p[len("file:") :]
    if os.path.isabs(p):
        return p
    return os.path.join(table_path, p)


def load_table_metadata(path: str) -> dict:
    """Current ``*.metadata.json`` of an Iceberg table directory, via
    ``version-hint.text`` when present (HadoopCatalog convention), else
    the highest-numbered ``v<N>.metadata.json``."""
    mdir = os.path.join(path, "metadata")
    if not os.path.isdir(mdir):
        raise FileNotFoundError(f"no metadata/ directory under {path}")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            n = f.read().strip()
        cand = os.path.join(mdir, f"v{int(n)}.metadata.json")
        if not os.path.exists(cand):
            raise FileNotFoundError(
                f"version-hint.text names v{n} but {cand} is missing"
            )
    else:
        versions = []
        for name in os.listdir(mdir):
            m = re.fullmatch(r"v(\d+)\.metadata\.json", name)
            if m:
                versions.append((int(m.group(1)), name))
        if not versions:
            raise FileNotFoundError(
                f"no v*.metadata.json under {mdir} and no version-hint"
            )
        cand = os.path.join(mdir, max(versions)[1])
    with open(cand) as f:
        meta = json.load(f)
    fv = int(meta.get("format-version", 1))
    if fv > 2:
        raise ValueError(
            f"cannot import: Iceberg format-version {fv} is not "
            "supported (1 and 2 are)"
        )
    return meta


def _current_schema(meta: dict) -> dict:
    """The snapshot-current Iceberg schema struct (v2: ``schemas`` +
    ``current-schema-id``; v1: inline ``schema``)."""
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id") == sid:
                return s
        raise ValueError(f"current-schema-id {sid} not in schemas")
    return meta["schema"]


def iceberg_to_spark_type(t):
    """Iceberg type -> Spark DataType (spec type-name grammar)."""
    from pyspark.sql import types as T

    if isinstance(t, dict):
        k = t.get("type")
        if k == "struct":
            return T.StructType(
                [
                    T.StructField(
                        f["name"],
                        iceberg_to_spark_type(f["type"]),
                        not f.get("required", False),
                        {"parquet.field.id": int(f["id"])},
                    )
                    for f in t["fields"]
                ]
            )
        if k == "list":
            return T.ArrayType(
                iceberg_to_spark_type(t["element"]),
                not t.get("element-required", False),
            )
        if k == "map":
            return T.MapType(
                iceberg_to_spark_type(t["key"]),
                iceberg_to_spark_type(t["value"]),
                not t.get("value-required", False),
            )
        raise ValueError(f"unsupported Iceberg nested type {k!r}")
    prim = {
        "boolean": "boolean",
        "int": "integer",
        "long": "long",
        "float": "float",
        "double": "double",
        "date": "date",
        "string": "string",
        "uuid": "string",
        "binary": "binary",
        # timestamptz is UTC-adjusted -> Spark timestamp;
        # timestamp (no tz) -> timestamp_ntz, the same split Delta uses
        "timestamptz": "timestamp",
        "timestamp": "timestamp_ntz",
    }
    from pyspark.sql import types as T

    if t in prim:
        return getattr(
            T,
            {
                "boolean": "BooleanType",
                "integer": "IntegerType",
                "long": "LongType",
                "float": "FloatType",
                "double": "DoubleType",
                "date": "DateType",
                "string": "StringType",
                "binary": "BinaryType",
                "timestamp": "TimestampType",
                "timestamp_ntz": "TimestampNTZType",
            }[prim[t]],
        )()
    m = _DECIMAL_RE.fullmatch(t)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = _FIXED_RE.fullmatch(t)
    if m:
        return T.BinaryType()
    raise ValueError(f"unsupported Iceberg type {t!r}")


def _spark_schema(meta: dict):
    from pyspark.sql.types import StructType

    st = iceberg_to_spark_type(_current_schema(meta))
    if not isinstance(st, StructType):
        raise ValueError("Iceberg schema root must be a struct")
    return st


# ----------------------------------------------------------- file prune
def _kvmap(x) -> dict:
    """Iceberg's Avro 'map with non-string keys' round-trips as an
    array of {key, value} records; normalize both shapes to a dict."""
    if x is None:
        return {}
    if isinstance(x, dict):
        return x
    return {e["key"]: e["value"] for e in x}


def _decode_bound(t: str, b: bytes):
    """Spec 'single-value binary serialization' for the bound types a
    range comparison can use; None for everything else (no pruning)."""
    if b is None:
        return None
    b = bytes(b)
    try:
        if t == "int":
            return struct.unpack("<i", b)[0]
        if t == "long":
            return struct.unpack("<q", b)[0]
        if t == "float":
            return struct.unpack("<f", b)[0]
        if t == "double":
            return struct.unpack("<d", b)[0]
        if t == "date":
            return struct.unpack("<i", b)[0]  # days since epoch
        if t in ("timestamp", "timestamptz"):
            return struct.unpack("<q", b)[0]  # micros since epoch
        if t == "string":
            return b.decode("utf-8")
    except (struct.error, UnicodeDecodeError):
        return None
    return None


def _cmp_empty(op: str, lo, hi, lit) -> bool:
    if op == "=":
        return lit < lo or lit > hi
    if op == "<":
        return lo >= lit
    if op == "<=":
        return lo > lit
    if op == ">":
        return hi <= lit
    if op == ">=":
        return hi < lit
    return False


def _comparable(lo, hi, lit) -> bool:
    num = lambda v: isinstance(v, (int, float)) and not isinstance(v, bool)  # noqa: E731
    if num(lit) and num(lo) and num(hi):
        return True
    return (
        isinstance(lit, str)
        and isinstance(lo, str)
        and isinstance(hi, str)
    )


# ------------------------------------------------------------- replay
def iceberg_live_files(
    path: str,
    snapshot_id: int | None = None,
    filters: list[tuple] | None = None,
) -> dict:
    """Replay the metadata tree to the live data files of one snapshot.

    Returns ``{"files": [abs paths], "meta": metadata dict, "schema":
    Spark StructType, "n_total": files before predicate pruning,
    "n_manifests_skipped": manifests the manifest-list field summaries
    proved empty, "snapshot": snapshot dict}``.  ``filters`` are
    conjunctive ``(column, op, literal)`` triples pruned against BOTH
    metadata levels; pruning is IO-avoidance only — callers re-apply
    every predicate row-level (the same contract as the txn source)."""
    meta = load_table_metadata(path)
    schema = _spark_schema(meta)
    ice_schema = _current_schema(meta)
    by_name = {f["name"]: f for f in ice_schema["fields"]}
    by_id = {int(f["id"]): f for f in ice_schema["fields"]}

    snaps = meta.get("snapshots") or []
    sid = snapshot_id if snapshot_id is not None else meta.get(
        "current-snapshot-id"
    )
    if sid is None or sid == -1:
        return {
            "files": [],
            "entries": [],
            "meta": meta,
            "schema": schema,
            "n_total": 0,
            "n_manifests_skipped": 0,
            "snapshot": None,
        }
    snap = next((s for s in snaps if s.get("snapshot-id") == sid), None)
    if snap is None:
        raise ValueError(
            f"snapshot {sid} not found in {path} (listed: "
            f"{[s.get('snapshot-id') for s in snaps]})"
        )
    ml_path = snap.get("manifest-list")
    if not ml_path:
        raise ValueError(
            "snapshot has no manifest-list (v1 inline manifests are "
            "not supported; rewrite with a modern writer)"
        )

    # partition spec: identity transforms prune by partition value;
    # any other transform reads fine (source columns are in the data
    # files) but never prunes — conservative
    specs = {
        int(s["spec-id"]): s for s in (meta.get("partition-specs") or [])
    }
    if not specs and meta.get("partition-spec") is not None:
        specs[0] = {
            "spec-id": 0,
            "fields": meta.get("partition-spec") or [],
        }

    filters = filters or []
    _, ml_records = read_avro(_resolve(path, ml_path))

    n_skipped_manifests = 0
    files: list[str] = []
    file_entries: list[dict] = []
    n_total = 0
    for m in ml_records:
        if int(m.get("content") or 0) == 1:
            raise ValueError(
                "cannot import: snapshot carries a DELETE manifest "
                "(manifest-list content=1, row-level deletes); "
                "rewrite/compact the table first"
            )
        spec = specs.get(int(m.get("partition_spec_id") or 0)) or {
            "fields": []
        }
        spec_fields = spec.get("fields") or []
        # manifest-level skip via the field summaries (aligned with
        # the spec's partition field order)
        summaries = m.get("partitions") or []
        if summaries and _manifest_prunable(
            summaries, spec_fields, by_id, filters
        ):
            n_skipped_manifests += 1
            continue
        _, entries = read_avro(_resolve(path, m["manifest_path"]))
        for e in entries:
            if int(e.get("status") or 0) == 2:  # DELETED
                continue
            df = e.get("data_file") or {}
            if int(df.get("content") or 0) != 0:
                raise ValueError(
                    "cannot import: manifest entry carries a delete "
                    f"file (data_file.content={df.get('content')})"
                )
            fmt = str(df.get("file_format") or "").upper()
            if fmt != "PARQUET":
                raise ValueError(
                    f"cannot import: file_format {fmt!r} (only PARQUET)"
                )
            n_total += 1
            if _file_prunable(df, spec_fields, by_name, by_id, filters):
                continue
            files.append(_resolve(path, df["file_path"]))
            file_entries.append(df)
    return {
        "files": files,
        "entries": file_entries,
        "meta": meta,
        "schema": schema,
        "n_total": n_total,
        "n_manifests_skipped": n_skipped_manifests,
        "snapshot": snap,
    }


def _manifest_prunable(summaries, spec_fields, by_id, filters) -> bool:
    """May ANY file in this manifest satisfy the conjunction?  Uses the
    manifest-list ``partitions`` field summaries (lower/upper bound per
    partition field, identity transforms only)."""
    for i, pf in enumerate(spec_fields):
        if i >= len(summaries):
            break
        if str(pf.get("transform")) != "identity":
            continue
        src = by_id.get(int(pf.get("source-id", -1)))
        if src is None:
            continue
        t = src["type"] if isinstance(src["type"], str) else ""
        s = summaries[i] or {}
        lo = _decode_bound(t, s.get("lower_bound"))
        hi = _decode_bound(t, s.get("upper_bound"))
        if lo is None or hi is None:
            continue
        for col, op, lit in filters:
            if col != src["name"]:
                continue
            if _comparable(lo, hi, lit) and _cmp_empty(op, lo, hi, lit):
                # a null-holding partition may still match nothing for
                # range ops; contains_null files never match =/range
                # predicates on the value, so the skip is sound
                if not s.get("contains_null"):
                    return True
    return False


def _file_prunable(df, spec_fields, by_name, by_id, filters) -> bool:
    """May this data file satisfy the conjunction?  Partition values
    (identity transforms) and per-file column bounds both get a say."""
    part = df.get("partition") or {}
    pvals: dict[str, object] = {}
    for pf in spec_fields:
        if str(pf.get("transform")) != "identity":
            continue
        src = by_id.get(int(pf.get("source-id", -1)))
        if src is None:
            continue
        name = pf.get("name") or src["name"]
        if name in part:
            pvals[src["name"]] = part[name]
    lowers = _kvmap(df.get("lower_bounds"))
    uppers = _kvmap(df.get("upper_bounds"))
    for col, op, lit in filters:
        f = by_name.get(col)
        if f is None:
            continue
        t = f["type"] if isinstance(f["type"], str) else ""
        if col in pvals:
            v = pvals[col]
            if v is None:
                return True  # null partition: no comparison matches
            if _comparable(v, v, lit) and _cmp_empty(op, v, v, lit):
                return True
        fid = int(f["id"])
        lo = _decode_bound(t, lowers.get(fid))
        hi = _decode_bound(t, uppers.get(fid))
        if (
            lo is not None
            and hi is not None
            and _comparable(lo, hi, lit)
            and _cmp_empty(op, lo, hi, lit)
        ):
            return True
    return False


# ------------------------------------------------------------- convert
# Iceberg primitive -> txn manifest stats tag + value translator (the
# manifest domains of txn.py _stat_value: num=float, str=str,
# ts=naive isoformat(sep=' '), date=isoformat).
def _manifest_stat(t: str, b):
    import datetime as _dt

    v = _decode_bound(t, b)
    if v is None:
        return None
    if t in ("int", "long", "float", "double"):
        return ("num", float(v))
    if t == "string":
        return ("str", v)
    if t == "date":
        return (
            "date",
            (_dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))).isoformat(),
        )
    if t in ("timestamp", "timestamptz"):
        return (
            "ts",
            (
                _dt.datetime(1970, 1, 1)
                + _dt.timedelta(microseconds=int(v))
            ).isoformat(sep=" "),
        )
    return None


def convert_from_iceberg(
    spark,
    path: str,
    dest_root: str,
    snapshot_id: int | None = None,
):
    """ZERO-COPY conversion of a foreign Iceberg table into a txn table
    (the Iceberg twin of ``convert_from_delta`` — the migration path in
    the other direction from ``import_iceberg``): the snapshot's live
    data files are adopted BY HARD LINK, per-file stats translate from
    the manifest's ``lower_bounds``/``upper_bounds`` (decoded from the
    spec's single-value binary serialization into the txn manifest's
    stat domains), and the table's FIELD-ID binding becomes the txn
    table's name-based ``column_mapping``: each file's footer maps
    field id -> actual parquet column name (a footer read is KBs of
    metadata, zero data IO), every file must agree on that name — a
    table whose files disagree (a rename applied mid-history without a
    rewrite) refuses loudly rather than adopting an ambiguous binding.

    The converted table is UNPARTITIONED on purpose: Iceberg data
    files CONTAIN their identity partition columns (the txn hive
    layout expects partition values in directory names only, so
    declaring them partition columns would double-bind the column);
    partition-predicate pruning still works because the manifest
    bounds cover those columns like any other.  O(files) link + footer
    work, zero data IO, zero Spark jobs."""
    state = iceberg_live_files(path, snapshot_id)
    from pyarrow import parquet as _pq2

    from .txn import TxnTable

    dest = TxnTable(dest_root)
    if dest.current_version() is not None:
        raise ValueError(f"convert target {dest_root} is not empty")
    ice_schema = _current_schema(state["meta"])
    fields = ice_schema["fields"]
    by_id = {int(f["id"]): f for f in fields}

    # field id -> parquet column name, consistent across every file
    id_names: dict[int, str] = {}
    for abs_p in state["files"]:
        sch = _pq2.read_schema(abs_p)
        for fld in sch:
            fid = (fld.metadata or {}).get(b"PARQUET:field_id")
            if fid is None:
                continue
            fid = int(fid)
            if fid in id_names and id_names[fid] != fld.name:
                raise ValueError(
                    f"cannot convert: field id {fid} is named "
                    f"{id_names[fid]!r} in one file and {fld.name!r} "
                    f"in {abs_p!r} — a name-based adoption would be "
                    "ambiguous; rewrite the table first"
                )
            id_names.setdefault(fid, fld.name)

    cm: dict = {"mode": "name", "max_id": 0, "fields": {}, "used_phys": []}
    mapped = False
    for f in fields:
        fid = int(f["id"])
        phys = id_names.get(fid, f["name"])
        mapped = mapped or phys != f["name"]
        cm["fields"][str(f["name"]).lower()] = {"id": fid, "physical": phys}
        cm["used_phys"].append(phys)
        cm["max_id"] = max(cm["max_id"], fid)

    carry: dict[str, str] = {}
    entries: dict[str, dict] = {}
    for i, (abs_p, df) in enumerate(
        zip(state["files"], state["entries"])
    ):
        new_rel = f"c{i:06d}-{os.path.basename(abs_p)}"
        carry[new_rel] = abs_p
        lowers = _kvmap(df.get("lower_bounds"))
        uppers = _kvmap(df.get("upper_bounds"))
        nulls = _kvmap(df.get("null_value_counts"))
        cols: dict = {}
        for fid in set(lowers) | set(uppers):
            src = by_id.get(int(fid))
            if src is None or not isinstance(src["type"], str):
                continue
            lo = _manifest_stat(src["type"], lowers.get(fid))
            hi = _manifest_stat(src["type"], uppers.get(fid))
            if lo is None or hi is None:
                continue
            cols[id_names.get(int(fid), src["name"])] = {
                "t": lo[0],
                "min": lo[1],
                "max": hi[1],
                # absent null counts default to 0: only ever used to
                # PROVE all-null (nulls == rows), so understating keeps
                # files — conservative, never mis-pruned
                "nulls": int(nulls.get(fid, 0) or 0),
            }
        entries[new_rel] = {
            "rows": int(df.get("record_count") or 0),
            "bytes": int(
                df.get("file_size_in_bytes")
                or os.path.getsize(abs_p)
            ),
            "columns": cols,
        }
    snap = state["snapshot"]
    dest.commit(
        spark.createDataFrame([], state["schema"]),
        metadata_only=True,
        operation="convert_from_iceberg",
        carry_files=carry,
        carry_entries=entries,
        column_mapping=cm if mapped else {},
        extra_meta={
            "converted_from": path,
            "iceberg_snapshot_id": snap.get("snapshot-id")
            if snap
            else None,
        },
    )
    return dest


# --------------------------------------------------------------- reads
def _name_mapping(meta: dict) -> dict[int, str]:
    """The spec's ``schema.name-mapping.default`` property -> field id
    to (first) file column name.  This is how id-less parquet files —
    Hive-migrated tables, and this engine's own ``export_iceberg``
    output — bind to the schema."""
    raw = (meta.get("properties") or {}).get(
        "schema.name-mapping.default"
    )
    if not raw:
        return {}
    out: dict[int, str] = {}
    for e in json.loads(raw):
        names = e.get("names") or []
        if e.get("field-id") is not None and names:
            out[int(e["field-id"])] = names[0]
    return out


def import_iceberg(
    spark,
    path: str,
    snapshot_id: int | None = None,
    filters: list[tuple] | None = None,
):
    """Read an Iceberg table the engine did not write, as a DataFrame.

    ``snapshot_id`` pins time travel; ``filters`` prune files at the
    metadata level (callers must still apply the predicates — pruning
    is an IO bound, never the correctness boundary).  Columns bind by
    parquet FIELD ID (the Iceberg reader contract) when the files
    carry ids; id-less files (migrated tables, this engine's own
    exports) bind through ``schema.name-mapping.default`` instead, and
    their missing identity-partition source columns are filled from
    the manifest partition values — the spec's migrated-table
    convention.  Which path applies is probed from ONE footer; tables
    that MIX id-bearing and id-less files should use
    ``format("iceberg_import")``, whose Arrow reader decides per file."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    state = iceberg_live_files(path, snapshot_id, filters)
    schema = state["schema"]
    if not state["files"]:
        return spark.createDataFrame([], schema)
    import pyarrow.parquet as _pq2

    first = _pq2.read_schema(state["files"][0])
    has_ids = any(
        (f.metadata or {}).get(b"PARQUET:field_id") is not None
        for f in first
    )
    if has_ids:
        spark.conf.set(
            "spark.sql.parquet.fieldId.read.enabled", "true"
        )
        return spark.read.schema(schema).parquet(*state["files"])
    nm = _name_mapping(state["meta"])
    if not nm:
        # no ids and no mapping: plain name binding is all that's left
        return spark.read.schema(
            StructType(
                [StructField(f.name, f.dataType, True) for f in schema.fields]
            )
        ).parquet(*state["files"])
    ice_schema = _current_schema(state["meta"])
    fid_of = {f["name"]: int(f["id"]) for f in ice_schema["fields"]}
    # identity partition source columns that the mapping does NOT place
    # in the files are metadata constants per the migrated convention
    specs = state["meta"].get("partition-specs") or []
    spec0 = specs[0] if specs else {"fields": []}
    by_id = {int(f["id"]): f for f in ice_schema["fields"]}
    const_cols: dict[str, str] = {}  # logical -> spec partition name
    for pf in spec0.get("fields") or []:
        if str(pf.get("transform")) != "identity":
            continue
        src = by_id.get(int(pf.get("source-id", -1)))
        if src is not None and fid_of.get(src["name"]) not in nm:
            const_cols[src["name"]] = pf.get("name") or src["name"]
    data_fields = [
        f for f in schema.fields if f.name not in const_cols
    ]
    data_schema = StructType(
        [
            StructField(nm.get(fid_of[f.name], f.name), f.dataType, True)
            for f in data_fields
        ]
    )
    scan = spark.read.schema(data_schema).parquet(*state["files"])
    if not const_cols:
        return scan.select(
            *(
                F.col(nm.get(fid_of[f.name], f.name)).alias(f.name)
                for f in schema.fields
            )
        )
    # attach partition constants via a broadcast basename join (the
    # same metadata-sized build side import_delta uses)
    import posixpath

    pv_rows = []
    names = list(const_cols)
    for abs_p, df in zip(state["files"], state["entries"]):
        part = df.get("partition") or {}
        pv_rows.append(
            (posixpath.basename(abs_p),)
            + tuple(
                None
                if part.get(const_cols[c]) is None
                else str(part.get(const_cols[c]))
                for c in names
            )
        )
    bs = [r[0] for r in pv_rows]
    if len(set(bs)) != len(bs):
        raise ValueError(
            "cannot import: duplicate data-file basenames in a "
            "name-mapped table — partition constants would be "
            "ambiguous; use format(\"iceberg_import\")"
        )
    pv_schema = ", ".join(
        ["__ib_base string"]
        + [f"__ib_{i} string" for i in range(len(names))]
    )
    pv_df = spark.createDataFrame(pv_rows, pv_schema)
    keyed = scan.withColumn(
        "__ib_base",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
    )
    joined = keyed.join(F.broadcast(pv_df), "__ib_base", "inner")
    return joined.select(
        *(
            F.col(f"__ib_{names.index(f.name)}")
            .cast(f.dataType)
            .alias(f.name)
            if f.name in const_cols
            else F.col(nm.get(fid_of[f.name], f.name)).alias(f.name)
            for f in schema.fields
        )
    )
