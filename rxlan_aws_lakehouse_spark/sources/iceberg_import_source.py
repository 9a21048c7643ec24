"""``spark.read.format("iceberg_import")`` — foreign Iceberg tables as
a first-class Spark source (round 13, the catalog face of
``iceberg_import.py``, mirroring ``delta_import_source``).

::

    df = (spark.read.format("iceberg_import")
          .option("snapshotId", 42)      # optional time travel
          .load("/path/to/iceberg_table"))

Planning is METADATA-ONLY: ``iceberg_live_files`` replays
``metadata.json`` → manifest-list Avro → manifest Avro; a data
directory is never listed.  Pushed predicates prune at BOTH metadata
levels before Spark plans a task — the manifest list's partition field
summaries skip whole manifests unread, and per-file identity partition
values + column bounds skip files — while every filter is reported
unhandled so Spark re-applies it row-level (pruning is an IO bound,
never the correctness boundary; the same contract as the txn and
delta_import sources).

Executor reads reuse the txn source's Arrow path
(``_read_file_batches``) with FIELD-ID binding: each partition carries
the schema's ``field_ids`` tuple, and a file column whose footer
``PARQUET:field_id`` matches binds the field even when its name
differs — the Iceberg reader contract (renames and engine rewrites
cannot break the read).  Identity partition columns live IN the data
files per the spec, so no constant reattachment is needed.
"""

from __future__ import annotations

import posixpath
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..avro_lite import read_avro
from ..iceberg_import import (
    _current_schema,
    _name_mapping,
    _resolve as _ice_resolve,
    _spark_schema,
    iceberg_live_files,
    load_table_metadata,
)
from .txn_source import _FilePartition, _filter_triples, _read_file_batches


def _binding(meta: dict, schema: StructType) -> tuple[tuple, tuple, dict]:
    """(field_ids, phys names, identity-partition spec-name map) for a
    table's schema: field ids bind id-bearing files; the phys tuple is
    the ``schema.name-mapping.default`` fallback for ID-LESS files
    (migrated tables, this engine's own exports); identity partition
    source columns absent from the mapping are metadata constants."""
    ice_schema = _current_schema(meta)
    fid_of = {f["name"]: int(f["id"]) for f in ice_schema["fields"]}
    nm = _name_mapping(meta)
    fids = tuple(fid_of.get(f.name, 0) for f in schema.fields)
    names = tuple(
        nm.get(fid_of.get(f.name, -1), f.name) for f in schema.fields
    )
    phys = (
        names if names != tuple(f.name for f in schema.fields) else ()
    )
    specs = meta.get("partition-specs") or []
    spec0 = specs[0] if specs else {"fields": []}
    by_id = {int(f["id"]): f for f in ice_schema["fields"]}
    const_of: dict[str, str] = {}  # binding name -> spec partition name
    for pf in spec0.get("fields") or []:
        if str(pf.get("transform")) != "identity":
            continue
        src = by_id.get(int(pf.get("source-id", -1)))
        if src is not None:
            bind = nm.get(int(src["id"]), src["name"])
            const_of[bind] = pf.get("name") or src["name"]
    return fids, phys, const_of


class IcebergImportReader(DataSourceReader):
    """Batch reader over one replayed snapshot, with manifest- and
    file-level skipping on pushed filters."""

    def __init__(self, options, schema: StructType):
        self._schema = schema
        self._path = options["path"]
        sid = options.get("snapshotId")
        self._snapshot_id = int(sid) if sid is not None else None
        self._timestamp = options.get("timestampAsOf")
        # binding straight from the table metadata (not the plan
        # schema's field metadata, which need not survive the data-
        # source schema round-trip): ids for id-bearing files, the
        # name-mapping names for id-less ones, partition constants for
        # identity columns the files omit
        self._fids, self._phys, self._const_of = _binding(
            load_table_metadata(self._path), schema
        )
        # pre-seeded prune triples (import_iceberg's filters= arrive
        # here when the batch import delegates to this source); pushed
        # filters merge on top
        import json as _json

        fj = options.get("filtersJson")
        self._seed: list[tuple] = (
            [tuple(t) for t in _json.loads(fj)] if fj else []
        )
        self._triples: list[tuple] = list(self._seed)

    def pushFilters(self, filters: list[Filter]):
        triples, points = _filter_triples(filters)
        self._triples = self._seed + triples + [
            (col, "=", v)
            for col, vals in points
            for v in vals[:1]
            if len(vals) == 1
        ]
        return filters  # all re-applied row-level by Spark

    def partitions(self) -> Sequence[InputPartition]:
        state = iceberg_live_files(
            self._path,
            self._snapshot_id,
            filters=self._triples,
            timestamp=self._timestamp,
        )
        parts = []
        for p, e, dels in zip(
            state["files"], state["entries"], state["delete_specs"]
        ):
            pv = e.get("partition") or {}
            consts = tuple(
                (
                    bind,
                    None
                    if pv.get(spec_name) is None
                    else str(pv.get(spec_name)),
                )
                for bind, spec_name in self._const_of.items()
            )
            parts.append(
                _FilePartition(
                    file_path=p,
                    rel=posixpath.basename(p),
                    dv_dir=None,
                    # file value wins when the column IS in the file
                    # (_read_file_batches checks columns before consts);
                    # id-less migrated files fill from these constants
                    consts=consts,
                    phys=self._phys,
                    field_ids=self._fids,
                    # position/equality deletes scoped to this file,
                    # decoded executor-side (r13 verdict task 1)
                    ice_deletes=dels,
                )
            )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        if partition is None:
            return  # empty snapshot: zero partitions, one None feed
        yield from _read_file_batches(partition, self._schema)


class IcebergImportStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("iceberg_import")`` — tail a FOREIGN
    Iceberg table's SNAPSHOT LOG as a stream (the Iceberg incremental-
    read contract re-expressed over the importer's replay machinery,
    mirroring the foreign-Delta stream reader):

    * offsets are the spec's monotonically increasing SEQUENCE NUMBERS
      (v2); one micro-batch covers the snapshots in an offset range;
    * an ``append`` snapshot contributes exactly its ADDED data files
      (manifest entries with status=1 whose snapshot id matches — the
      spec's incremental-scan derivation); a ``replace`` snapshot
      (rewrite-manifests / data-file compaction) rearranges existing
      rows without adding any — SKIPPED silently, the spec's
      incremental-append-scan rule, so table maintenance never
      re-emits compacted rows; any other operation
      (``overwrite``/``delete``) RAISES unless ``ignoreChanges`` — a
      streaming source cannot retract rows, the same rule Delta
      applies;
    * a mid-stream ``current-schema-id`` change raises — restart the
      stream to pick up the new schema;
    * ``startingSnapshot``: ``latest`` (default) or ``earliest``.
      Snapshots expired from the metadata cannot be streamed and raise
      a reconstructable error.

    Exactly-once: offsets are sequence numbers persisted by the sink
    checkpoint; restarts resume from the committed range."""

    def __init__(self, options, schema: StructType):
        self._schema = schema
        self._path = options["path"]
        meta = load_table_metadata(self._path)
        self._schema_id = meta.get("current-schema-id", 0)
        self._fids, self._phys, self._const_of = _binding(meta, schema)
        self._ignore_changes = str(
            options.get("ignoreChanges", "false")
        ).lower() == "true"
        # Delta-parity semantics (round 14): ignoreDeletes permits
        # DELETE-only history — row-level delete manifests are skipped
        # (a stream cannot retract rows; new data files still stream)
        # and ``delete`` snapshots pass; ignoreChanges implies it.
        self._ignore_deletes = self._ignore_changes or str(
            options.get("ignoreDeletes", "false")
        ).lower() == "true"
        st = options.get("startingTimestamp")
        if st is not None:
            # Delta-parity semantics: stream from the EARLIEST snapshot
            # committed at or after the timestamp (inclusive); a
            # timestamp past the head starts at the head (tail-only)
            from ..iceberg_import import _target_ms

            target = _target_ms(st)
            cand = [
                int(s.get("sequence-number") or 0)
                for s in (meta.get("snapshots") or [])
                if int(s.get("timestamp-ms") or 0) >= target
            ]
            self._start = min(cand) - 1 if cand else self._head(meta)
        else:
            start = str(
                options.get("startingSnapshot", "latest")
            ).lower()
            if start == "earliest":
                self._start = 0
            elif start == "latest":
                self._start = self._head(meta)
            else:
                raise ValueError(
                    "startingSnapshot must be 'latest' or 'earliest'"
                )
        ms = int(options.get("maxSnapshotsPerTrigger", 0))
        self._max_snapshots = ms if ms > 0 else None
        self._watermark = self._start

    @staticmethod
    def _head(meta: dict) -> int:
        sid = meta.get("current-snapshot-id")
        for s in meta.get("snapshots") or []:
            if s.get("snapshot-id") == sid:
                return int(s.get("sequence-number") or 0)
        return 0

    def initialOffset(self) -> dict:
        return {"seq": self._start}

    def latestOffset(self) -> dict:
        head = self._head(load_table_metadata(self._path))
        if self._max_snapshots is not None:
            # bounded catch-up, the same contract as the txn/delta
            # sources' maxVersionsPerTrigger
            head = min(head, self._watermark + self._max_snapshots)
            self._watermark = max(self._watermark, head)
        return {"seq": head}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["seq"], end["seq"]
        if hi > self._watermark:
            self._watermark = hi
        meta = load_table_metadata(self._path)
        if meta.get("current-schema-id", 0) != self._schema_id:
            raise RuntimeError(
                f"schema change in {self._path} (current-schema-id "
                f"moved); restart the stream to pick up the new schema"
            )
        snaps = sorted(
            (
                s
                for s in (meta.get("snapshots") or [])
                if lo < int(s.get("sequence-number") or 0) <= hi
            ),
            key=lambda s: int(s.get("sequence-number") or 0),
        )
        covered = {int(s.get("sequence-number") or 0) for s in snaps}
        missing = set(range(lo + 1, hi + 1)) - covered
        if missing:
            raise RuntimeError(
                f"snapshots with sequence numbers {sorted(missing)} "
                f"were expired from {self._path}; the range cannot be "
                "streamed — restart from a later startingSnapshot"
            )
        parts: list[InputPartition] = []
        for s in snaps:
            op = str(
                (s.get("summary") or {}).get("operation") or "append"
            ).lower()
            if op == "replace":
                # the spec's incremental-append-scan rule: a REPLACE
                # snapshot (rewrite-manifests, data-file compaction)
                # rearranges existing rows without adding or removing
                # any — tails skip it entirely, so maintenance on the
                # table never re-emits compacted rows downstream
                continue
            if op != "append" and not (
                self._ignore_changes
                or (op == "delete" and self._ignore_deletes)
            ):
                raise RuntimeError(
                    f"streaming source hit a {op!r} snapshot "
                    f"(sequence {s.get('sequence-number')}) in "
                    f"{self._path}; set ignoreChanges=true"
                    + (
                        " or ignoreDeletes=true"
                        if op == "delete"
                        else ""
                    )
                    + " (a stream cannot retract rows)"
                )
            sid = s.get("snapshot-id")
            _, ml = read_avro(
                _ice_resolve(self._path, s["manifest-list"])
            )
            for m in ml:
                if int(m.get("content") or 0) == 1:
                    if self._ignore_deletes:
                        # row-level deletes cannot retract already-
                        # emitted rows; with the flag, skip the delete
                        # manifests and keep streaming new data files
                        continue
                    raise RuntimeError(
                        "cannot stream: snapshot carries a DELETE "
                        "manifest (row-level deletes); set "
                        "ignoreDeletes=true to skip them (a stream "
                        "cannot retract rows)"
                    )
                # only manifests this snapshot added can hold its
                # ADDED entries — the spec's incremental-scan prune
                if int(m.get("added_snapshot_id") or -1) != sid:
                    continue
                _, entries = read_avro(
                    _ice_resolve(self._path, m["manifest_path"])
                )
                for e in entries:
                    if int(e.get("status") or 0) != 1:  # ADDED only
                        continue
                    esid = e.get("snapshot_id")
                    if esid is not None and esid != sid:
                        continue
                    df = e.get("data_file") or {}
                    if int(df.get("content") or 0) != 0:
                        raise RuntimeError(
                            "cannot stream: manifest entry carries a "
                            "delete file"
                        )
                    p = _ice_resolve(self._path, df["file_path"])
                    pv = df.get("partition") or {}
                    consts = tuple(
                        (
                            bind,
                            None
                            if pv.get(spec_name) is None
                            else str(pv.get(spec_name)),
                        )
                        for bind, spec_name in self._const_of.items()
                    )
                    parts.append(
                        _FilePartition(
                            file_path=p,
                            rel=posixpath.basename(p),
                            dv_dir=None,
                            consts=consts,
                            phys=self._phys,
                            field_ids=self._fids,
                        )
                    )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _read_file_batches(partition, self._schema)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class IcebergImportDataSource(DataSource):
    """``format("iceberg_import")``: read-only foreign Iceberg tables."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_import"

    def schema(self) -> StructType:
        return _spark_schema(load_table_metadata(self.options["path"]))

    def reader(self, schema: StructType) -> DataSourceReader:
        return IcebergImportReader(self.options, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return IcebergImportStreamReader(self.options, schema)


def register_iceberg_import_source(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # same driver-side guard as the txn source: resets the per-relation
    # read-info cache before wrapped actions so pruned plans are never
    # replayed for filterless reuse (pushdown_guard.py)
    from .pushdown_guard import install_pushdown_guard

    install_pushdown_guard()
    spark.dataSource.register(IcebergImportDataSource)
