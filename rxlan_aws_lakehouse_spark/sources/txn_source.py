"""Transactional snapshot tables as a first-class Spark data source.

The PySpark 4 Python DataSource API (`pyspark.sql.datasource`) is the
public seam for exposing a custom table format to every Spark surface —
``spark.read.format("txn")``, SQL via a registered view, and
``spark.readStream.format("txn")`` — the way Delta/Iceberg plug in their
own relations. This module puts the ``txn.py`` snapshot store behind
that seam, so a txn table stops being a library call and becomes a
format:

    spark.dataSource.register(TxnDataSource)
    df  = spark.read.format("txn").load(table_root)            # snapshot
    st  = (spark.readStream.format("txn")
                .option("startingVersion", "earliest")
                .load(table_root))                             # tail it

Designed for the 100 TB cluster case, not just the API checkbox:

* **Planning is manifest-only.** ``schema()`` reads the snapshot's
  recorded schema from ``_meta.json``; ``partitions()`` derives the file
  list from the sharded manifest. No directory listing, no parquet
  footer reads, no Spark job at plan time.
* **Filter pushdown prunes FILES, not just rows — ON BY DEFAULT.**
  ``pushFilters`` translates Spark's pushed predicates (=, <, <=, >,
  >=, IN on top-level columns) into the manifest grammar: range stats
  prune by min/max, per-file bloom filters prune point lookups even
  when every file's range spans the key space, and partition-path
  predicates skip whole manifest fragments unread. Every filter is
  also returned as unhandled, so Spark re-applies it row-level —
  pruning is an IO bound, never the correctness boundary (same
  contract as ``read_pruned``, txn.py). Spark 4.1's Python-source
  relation cache has two measured wrong-answer modes (filtered-plan
  replay on filterless reuse; intra-query aliasing when one relation
  backs several scans) — ``register_txn_source`` installs the
  driver-side guard (``pushdown_guard.py``) that defeats both, which
  is what lets pruning default on (round 8 shipped it opt-in).
  ``option("pushdown", "false")`` opts out to the query-independent
  full-list reader.
* **One InputPartition per data file**, carrying only strings — the
  executor side reads its file with pyarrow, reattaches
  ``key=value`` partition-path columns as typed constants, applies any
  pending deletion vector for that file (position anti-set), and yields
  Arrow record batches. Parallelism = file count, memory = one row
  group at a time.
* **The streaming reader tails the commit log.** Offsets are published
  version numbers (tiny JSON ints); each micro-batch emits the files
  FRESHLY WRITTEN in ``(start, end]`` straight off each commit's shard
  index — IO proportional to the change, Delta-streaming-source
  semantics: appends stream through; a changeful commit
  (merge/delete/overwrite) fails the stream unless ``ignoreDeletes``
  (skip delete commits) or ``ignoreChanges`` (re-emit rewritten files)
  says otherwise.

Reference parity: the reference's only "source" abstraction is the Glue
catalog table its Redshift COPY reads (/root/reference/glue/
bronze_to_silver_openweather.py:36-57); this replaces that seam with a
native Spark one.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, Sequence
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ..txn import _CDF_DIR, _DV_DIR, _VERSIONS, TxnTable, _cm_phys

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


@dataclass
class _FilePartition(InputPartition):
    """One data file of one snapshot. Strings only — pickled to executors."""

    file_path: str  # absolute path of the parquet file
    rel: str  # manifest-relative path (carries key=value partition dirs)
    dv_dir: str | None  # deletion-vector dir to anti-apply, if pending
    # constant columns bound per partition (change-feed streaming: the
    # derived _change_type / _commit_version of this file's rows); cast
    # to the target schema exactly like partition-path values
    consts: tuple = ()
    # physical column names aligned with the target schema's fields —
    # set when the snapshot carries an id-based column mapping whose
    # physical names diverge (txn.py rename_column); () = identity.
    # Rides the partition (not the reader) because change-feed payload
    # files carry LOGICAL names while data files carry physical ones.
    phys: tuple = ()
    # FOREIGN Delta deletion vector of this file (delta_import source):
    # a delta_dv.descriptor_spec tuple — ("inline", bytes) or
    # ("file", abs_path, offset, size) — decoded EXECUTOR-side into the
    # deleted row-index mask. None = no foreign DV. Compact to pickle:
    # roaring bytes or a file pointer, never the expanded index list.
    dv_spec: tuple | None = None
    # parquet FIELD IDS aligned with the target schema's fields
    # (id-mode column mapping, delta_import source): when set, a file
    # column whose footer carries a matching PARQUET:field_id binds the
    # field even if its NAME differs from the physical spelling — the
    # id-mode contract. 0 = no id for that field (name binding).
    field_ids: tuple = ()
    # FOREIGN Iceberg row-level deletes applying to this file
    # (iceberg_import source, r13 verdict task 1): a tuple of
    # ("pos", delete_path, data_file_path) / ("eq", delete_path,
    # ((field_id, name), ...)) specs, decoded EXECUTOR-side by
    # iceberg_import.apply_iceberg_deletes. Compact to pickle: file
    # pointers, never expanded row lists.
    ice_deletes: tuple = ()


def _resolve_version(table: TxnTable, options) -> str:
    v = options.get("version")
    if v is not None:
        v = v if str(v).startswith("v") else f"v{int(v):08d}"
        if not os.path.isfile(
            os.path.join(table.root, _VERSIONS, v, "_meta.json")
        ):
            raise FileNotFoundError(f"version {v} not found at {table.root}")
        return v
    ts = options.get("timestamp")
    if ts is not None:
        return table.version_at(float(ts))
    cur = table.current_version()
    if cur is None:
        raise FileNotFoundError(f"no committed version at {table.root}")
    return cur


def _phys_names(cm: dict | None, schema: StructType) -> tuple:
    """Physical names aligned to the schema's fields — () when the
    snapshot's mapping is absent or pure identity (the common case),
    keeping the partition pickle and the read loop unchanged."""
    if not cm:
        return ()
    names = tuple(_cm_phys(cm, f.name) for f in schema.fields)
    if names == tuple(f.name for f in schema.fields):
        return ()
    return names


def _partition_values(rel: str) -> dict[str, str | None]:
    """Hive-style ``key=value`` dirs along the file's relative path."""
    out: dict[str, str | None] = {}
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, _, raw = seg.partition("=")
            out[k] = None if raw == _HIVE_NULL else unquote(raw)
    return out


def _read_file_batches(
    part: _FilePartition, schema: StructType
) -> Iterator:
    """Executor-side read of one file: parquet via pyarrow, partition-path
    columns reattached as typed constants, deletion vector anti-applied,
    batches cast to the table's exact Arrow schema."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    tbl = pq.read_table(part.file_path)
    pvals = _partition_values(part.rel)
    pvals.update(dict(part.consts))
    if part.ice_deletes:
        # foreign Iceberg position/equality deletes: decoded here on
        # the executor (iceberg_import.py), masked by row ordinal /
        # equality-column anti-join BEFORE anything else — position
        # deletes address the file's raw row order
        from rxlan_aws_lakehouse_spark.iceberg_import import (
            apply_iceberg_deletes,
        )

        tbl = apply_iceberg_deletes(tbl, part.ice_deletes)
    n = tbl.num_rows
    if part.dv_dir is not None and os.path.isdir(part.dv_dir):
        dv = pq.read_table(
            part.dv_dir, filters=[("rel", "=", part.rel)]
        )
        if dv.num_rows:
            dead = pa.array(
                sorted(set(dv.column("row_index").to_pylist())),
                type=pa.int64(),
            )
            idx = pa.array(range(n), type=pa.int64())
            tbl = tbl.filter(
                pc.invert(pc.is_in(idx, value_set=dead))
            )
    if part.dv_spec is not None:
        # foreign Delta deletion vector: roaring bitmap decoded here on
        # the executor (delta_dv.py), anti-applied by in-file row index
        from rxlan_aws_lakehouse_spark.delta_dv import deleted_rows

        dead_idx = deleted_rows(part.dv_spec)
        if dead_idx:
            idx = pa.array(range(n), type=pa.int64())
            tbl = tbl.filter(
                pc.invert(
                    pc.is_in(
                        idx,
                        value_set=pa.array(dead_idx, type=pa.int64()),
                    )
                )
            )
    # column mapping: bind each logical field through its physical name
    # (identity when part.phys is unset). Partition-path dirs carry
    # physical spellings too; consts (_change_type/_commit_version) are
    # never mapped, so their physical == logical.
    names = list(part.phys or (f.name for f in target))
    if part.field_ids:
        # ID-mode column mapping: the footer's PARQUET:field_id wins
        # over any name — a rewritten file whose column names diverged
        # from physicalName still binds correctly (the id-mode spec
        # contract); fields without a footer id fall back to the name.
        by_id = {}
        for f in tbl.schema:
            fid = (f.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                by_id[int(fid)] = f.name
        names = [
            by_id.get(fid, n) if fid else n
            for n, fid in zip(names, part.field_ids)
        ]
    cols = []
    for field, pname in zip(target, names):
        if pname in tbl.column_names:
            cols.append(tbl.column(pname).cast(field.type))
        elif pname in pvals:
            v = pvals[pname]
            scalar = pa.scalar(v, type=pa.string()).cast(field.type)
            cols.append(
                pa.array([scalar.as_py()] * tbl.num_rows, type=field.type)
            )
        else:
            # additive schema evolution: files written before the column
            # existed read it as typed NULLs, same as TxnTable.read
            cols.append(pa.nulls(tbl.num_rows, field.type))
    out = pa.table(cols, schema=target)
    yield from out.to_batches(max_chunksize=1 << 16)


def _filter_triples(filters: list[Filter]):
    """Spark pushed filters -> (conjunctive range triples, point-lookup
    (col, values) pairs) in the manifest-pruning grammar. Unsupported
    shapes are simply not translated (the caller returns every filter as
    unhandled anyway, so Spark re-applies all of them row-level)."""
    triples: list[tuple] = []
    points: list[tuple[str, list]] = []
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            continue
        col = attr[0]
        v = getattr(f, "value", None)
        if isinstance(f, (EqualTo, EqualNullSafe)) and v is not None:
            triples.append((col, "=", v))
            points.append((col, [v]))
        elif isinstance(f, GreaterThan):
            triples.append((col, ">", v))
        elif isinstance(f, GreaterThanOrEqual):
            triples.append((col, ">=", v))
        elif isinstance(f, LessThan):
            triples.append((col, "<", v))
        elif isinstance(f, LessThanOrEqual):
            triples.append((col, "<=", v))
        elif isinstance(f, In) and v:
            points.append((col, list(v)))
    return triples, points


class TxnSnapshotReader(DataSourceReader):
    """Opt-out batch reader (``option("pushdown", "false")``) over one
    pinned snapshot — every file, every query.

    Deliberately does NOT implement ``pushFilters``: its plan is a pure
    function of the snapshot, immune by construction to the Spark 4.1
    relation-cache hazards (`pushdown_guard.py` for the catalogue). The
    escape hatch for callers who bypass the guarded action surface
    (raw ``_jdf`` calls, ``df.rdd``) or drive actions concurrently from
    several threads over one shared relation with mixed filters.
    """

    def __init__(self, options, schema: StructType):
        self._schema = schema
        self._table = TxnTable(options["path"])
        self._version = _resolve_version(self._table, options)

    def _partitions_for(
        self,
        triples: list[tuple],
        points: list[tuple[str, list]],
    ) -> Sequence[InputPartition]:
        kept, _total = self._table.pruned_files(triples, self._version)
        kept_set = set(kept)
        # point lookups additionally consult per-file blooms — the case
        # where every file's [min,max] spans the key space and range
        # stats prune nothing (txn.py pruned_files_in)
        for col, vals in points:
            kept_set &= set(
                self._table.pruned_files_in(col, vals, self._version)[0]
            )
        data_root = os.path.join(self._table.root, _VERSIONS, self._version)
        dv = os.path.join(data_root, _DV_DIR)
        dv_dir = dv if os.path.isdir(dv) else None
        phys = _phys_names(
            self._table._meta(self._version).get("column_mapping"),
            self._schema,
        )
        return [
            _FilePartition(
                file_path=os.path.join(data_root, rel),
                rel=rel,
                dv_dir=dv_dir,
                phys=phys,
            )
            for rel in sorted(kept_set)
        ]

    def partitions(self) -> Sequence[InputPartition]:
        return self._partitions_for([], [])

    def read(self, partition: _FilePartition) -> Iterator:
        if partition is None:
            # an EMPTY snapshot (e.g. overwrite by an empty DataFrame)
            # has zero file partitions; Spark then feeds one None
            # partition through a single task
            return
        yield from _read_file_batches(partition, self._schema)


class TxnPruningReader(TxnSnapshotReader):
    """DEFAULT reader (since round 9) whose partition list is
    manifest-pruned by the pushed predicates: range stats prune by
    min/max, per-file blooms prune point lookups, partition-path
    predicates skip whole manifest fragments unread. Every filter is
    reported unhandled, so Spark re-applies it row-level — pruning is an
    IO bound, never the correctness boundary (same contract as
    ``read_pruned``, txn.py).

    Safe as the default ONLY together with the driver-side pushdown
    guard ``register_txn_source`` installs: Spark 4.1 caches one read
    info per relation, overwritten by every ``pushFilters`` and replayed
    without calling Python for filterless scans — the guard resets that
    cache before each wrapped action and disables pushdown for the one
    action when a single relation backs several scans
    (``pushdown_guard.py`` documents both measured failure modes).
    """

    def __init__(self, options, schema: StructType):
        super().__init__(options, schema)
        self._triples: list[tuple] = []
        self._points: list[tuple[str, list]] = []

    def pushFilters(self, filters: list[Filter]):
        self._triples, self._points = _filter_triples(filters)
        # Manifest pruning is IO-only: report every filter unhandled so
        # Spark keeps them as row-level predicates above the scan.
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        return self._partitions_for(self._triples, self._points)


def _cdf_version_partitions(
    table: TxnTable,
    v: str,
    meta: dict,
    schema: StructType,
    plan_cm: dict | None,
    plan_phys: tuple,
) -> list[_FilePartition]:
    """ONE commit's row-level change-feed file partitions (the Delta
    CDF derivation, shared by the streaming reader and the batch
    ``readChangeFeed`` reader): a recorded ``_cdf`` payload streams
    verbatim (``_change_type`` is a data column there, payload columns
    bound to each pinned field via physical identity — renames between
    the payload's version and the plan cannot break the binding);
    append-like commits derive inserts from their fresh files; the
    initial snapshot replays its full DV-applied content as inserts;
    physical/metadata-only commits contribute nothing; a changeful
    commit with no payload RAISES rather than guessing."""
    op = meta.get("operation")
    first = meta.get("parent") is None
    root = os.path.join(table.root, _VERSIONS, v)
    cdf_dir = os.path.join(root, _CDF_DIR)
    cv = (("_commit_version", v),)
    if os.path.isdir(cdf_dir):
        vcm = meta.get("column_mapping")
        by_phys = {
            _cm_phys(vcm, fl["name"]).lower(): fl["name"]
            for fl in (meta.get("schema") or {}).get("fields", [])
        }
        # Fallback is the FROZEN plan physical name, never the logical
        # spelling: a payload written before DROP COLUMN x still holds a
        # logical column 'x', and after re-adding 'x' (fresh physical
        # x__cmN) a logical-name fallback would bind the dropped
        # column's old values to the new column — resurrection.  The
        # plan physical can never appear as a payload logical spelling,
        # so unseen fields null-fill, matching read_row_changes.
        names = tuple(
            by_phys.get(
                _cm_phys(plan_cm, f.name).lower(),
                _cm_phys(plan_cm, f.name),
            )
            for f in schema.fields
        )
        cdf_phys = (
            names
            if names != tuple(f.name for f in schema.fields)
            else ()
        )
        return [
            _FilePartition(
                file_path=os.path.join(cdf_dir, fn),
                rel=fn,
                dv_dir=None,
                consts=cv,
                phys=cdf_phys,
            )
            for fn in sorted(os.listdir(cdf_dir))
            if fn.endswith(".parquet")
        ]
    if op in (
        "compact",
        "materialize_deletes",
        "rewrite_layout",
        "set_constraint",
        "set_cdf",
        # schema evolution: metadata-only, zero row changes
        "add_columns",
        "widen_type",
        "rename_column",
        "drop_column",
    ):
        return []  # physical/metadata only: no logical change
    ins = (("_change_type", "insert"),) + cv
    if first:
        # initial snapshot: full logical content (carried files
        # included, DV applied) as one insert batch
        dv = os.path.join(root, _DV_DIR)
        return [
            _FilePartition(
                file_path=os.path.join(root, rel),
                rel=rel,
                dv_dir=dv if os.path.isdir(dv) else None,
                consts=ins,
                phys=plan_phys,
            )
            for rel in table.files(v)
        ]
    if op == "append" or (
        # insert-only merge under an ENABLED feed: a touching merge
        # always writes a payload, so its absence proves every fresh
        # file holds only inserts
        bool(meta.get("cdf"))
        and op in ("merge_upsert", "apply_cdc", "sync_full")
    ):
        return [
            _FilePartition(
                file_path=os.path.join(root, rel),
                rel=rel,
                dv_dir=None,
                consts=ins,
                phys=plan_phys,
            )
            for rel in (
                rel
                for info in meta["shards"].values()
                for rel in info["fresh"]
            )
        ]
    raise RuntimeError(
        f"change feed hit {v} ({op}) with no row-level change "
        "payload; enable it with set_change_feed() before such "
        "commits"
    )


class TxnChangeFeedReader(DataSourceReader):
    """BATCH row-level change feed (Delta's batch CDF read shape):

    ::

        (spark.read.format("txn")
         .option("readChangeFeed", "true")
         .option("startingVersion", 2)      # or "earliest"
         .option("endingVersion", 5)        # optional, default: head
         .load(root))

    One file partition per payload/fresh file of each commit in the
    range — the same per-version derivation the streaming CDF reader
    uses (``_cdf_version_partitions``), so batch and stream agree row
    for row. Before this reader existed, a batch ``readChangeFeed``
    load silently fell through to the snapshot reader and returned
    table rows with NULL change columns — silent wrong output."""

    def __init__(self, options, schema: StructType):
        self._schema = schema
        self._table = TxnTable(options["path"])
        head = self._table.current_version()
        if head is None:
            raise FileNotFoundError(
                f"no committed version at {self._table.root}"
            )
        ev = options.get("endingVersion")
        self._hi = (
            int(str(ev).lstrip("v")) if ev is not None else int(head[1:])
        )
        sv = str(options.get("startingVersion", "earliest")).lower()
        self._lo = 0 if sv == "earliest" else int(sv.lstrip("v")) - 1
        end_v = f"v{self._hi:08d}"
        end_meta = self._table._meta(end_v)  # raises if vacuumed
        self._plan_cm = end_meta.get("column_mapping")
        self._plan_phys = _phys_names(self._plan_cm, schema)

    def partitions(self) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        vdir = os.path.join(self._table.root, _VERSIONS)
        for n in range(self._lo + 1, self._hi + 1):
            v = f"v{n:08d}"
            meta_path = os.path.join(vdir, v, "_meta.json")
            if not os.path.isfile(meta_path):
                continue  # vacuumed or never-published slot
            with open(meta_path) as f:
                meta = json.load(f)
            parts.extend(
                _cdf_version_partitions(
                    self._table,
                    v,
                    meta,
                    self._schema,
                    self._plan_cm,
                    self._plan_phys,
                )
            )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        if partition is None:
            return  # empty range: zero partitions, one None feed
        yield from _read_file_batches(partition, self._schema)


class TxnStreamReader(DataSourceStreamReader):
    """Streaming reader tailing the commit log: one micro-batch per
    offset range of published versions, files straight off each commit's
    shard index."""

    def __init__(self, options, schema: StructType):
        self._schema = schema
        self._table = TxnTable(options["path"])
        # PLAN-TIME column mapping: physical names are FROZEN once
        # assigned, so the mapping of the version the stream planned
        # against resolves this schema's fields in EVERY later commit's
        # files — per-version mappings would break after a second
        # rename (the pinned logical name leaves the newer mapping).
        cur = self._table.current_version()
        self._plan_cm = (
            self._table._meta(cur).get("column_mapping") if cur else None
        )
        self._plan_phys = _phys_names(self._plan_cm, schema)
        self._ignore_deletes = str(
            options.get("ignoreDeletes", "false")
        ).lower() == "true"
        self._ignore_changes = str(
            options.get("ignoreChanges", "false")
        ).lower() == "true"
        start = str(options.get("startingVersion", "latest")).lower()
        if start == "earliest":
            self._start = 0
        elif start == "latest":
            cur = self._table.current_version()
            self._start = int(cur[1:]) if cur else 0
        else:
            self._start = int(start.lstrip("v"))
        # Delta's maxFilesPerTrigger analogue at commit granularity: cap
        # how far one micro-batch may advance, so a consumer waking up
        # behind a long backlog replays it in bounded-IO batches instead
        # of one giant catch-up batch sized by the backlog.
        mv = int(options.get("maxVersionsPerTrigger", 0))
        self._max_versions = mv if mv > 0 else None
        self._watermark = self._start
        # Delta's streaming CDF: emit row-level CHANGES (_change_type /
        # _commit_version) instead of table rows. Commits with a recorded
        # _cdf payload stream it verbatim; append-like commits derive
        # inserts from their fresh files; changeful commits WITHOUT a
        # payload (feed was off) fail loudly — never silently wrong.
        self._cdf = str(
            options.get("readChangeFeed", "false")
        ).lower() == "true"

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        cur = self._table.current_version()
        head = int(cur[1:]) if cur else 0
        if self._max_versions is not None:
            # Advance an in-memory watermark by at most max_versions per
            # call (one call per trigger). Under a LONG-LIVED query this
            # is exact: each trigger's batch is bounded, and a restart
            # converges forward over a few empty triggers (offsets at or
            # below the committed one plan no batch; the next trigger
            # probes max_versions further). Under Trigger.AvailableNow a
            # restarted capped query may make NO progress — the wrapper
            # calls latestOffset exactly once per run, BEFORE
            # initialOffset, and the Python streaming protocol never
            # exposes the restored offset to the reader, so the capped
            # answer can land at/below the committed frontier with no
            # later call to converge. Use the cap for continuous tailing;
            # drain catch-up backlogs uncapped.
            head = min(head, self._watermark + self._max_versions)
            self._watermark = max(self._watermark, head)
        return {"version": head}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["version"], end["version"]
        if hi > self._watermark:
            self._watermark = hi
        parts: list[InputPartition] = []
        vdir = os.path.join(self._table.root, _VERSIONS)
        for n in range(lo + 1, hi + 1):
            v = f"v{n:08d}"
            meta_path = os.path.join(vdir, v, "_meta.json")
            if not os.path.isfile(meta_path):
                continue  # vacuumed or never-published slot
            with open(meta_path) as f:
                meta = json.load(f)
            op = meta.get("operation")
            first = meta.get("parent") is None
            # data files bind through the PLAN-TIME physical names
            # (frozen forever); CDF payload files instead carry the
            # LOGICAL names of their own version — resolve each pinned
            # field to that version's spelling via physical identity
            vphys = self._plan_phys
            # The initial snapshot replays its FULL logical content (a
            # clone's files are all carried, not fresh — emitting fresh
            # alone would silently skip them), DV anti-applied; every
            # later version emits only its freshly written files.
            fresh = (
                self._table.files(v)
                if first
                else [
                    rel
                    for info in meta["shards"].values()
                    for rel in info["fresh"]
                ]
            )
            if self._cdf:
                # shared per-version CDF derivation (also the batch
                # readChangeFeed reader's core) — payload verbatim,
                # derived inserts, initial-snapshot replay, loud error
                # on changeful commits without a payload
                parts.extend(
                    _cdf_version_partitions(
                        self._table,
                        v,
                        meta,
                        self._schema,
                        self._plan_cm,
                        self._plan_phys,
                    )
                )
                continue
            append_like = op in ("append", "compact") or first
            if not append_like:
                if op in ("delete", "delete_dv", "materialize_deletes"):
                    if not (self._ignore_deletes or self._ignore_changes):
                        raise RuntimeError(
                            f"streaming source hit a {op} commit at {v}; "
                            "set ignoreDeletes=true (skip them) or "
                            "ignoreChanges=true (re-emit rewritten files)"
                        )
                    if not self._ignore_changes:
                        continue  # ignoreDeletes: suppress, don't re-emit
                elif op in (
                    "set_constraint",
                    "set_cdf",
                    "add_columns",
                    "widen_type",
                    "rename_column",
                    "drop_column",
                ):
                    pass  # metadata-only: no fresh files anyway
                elif not self._ignore_changes:
                    raise RuntimeError(
                        f"streaming source hit a {op} commit at {v}; set "
                        "ignoreChanges=true to re-emit its rewritten files "
                        "(downstream must dedup by key, Delta semantics)"
                    )
            if op == "compact":
                continue  # physical re-home: rows already streamed
            root = os.path.join(vdir, v)
            dv = os.path.join(root, _DV_DIR)
            dv_dir = dv if first and os.path.isdir(dv) else None
            parts.extend(
                _FilePartition(
                    file_path=os.path.join(root, rel),
                    rel=rel,
                    dv_dir=dv_dir,
                    phys=vphys,
                )
                for rel in fresh
            )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _read_file_batches(partition, self._schema)

    def commit(self, end: dict) -> None:
        # keep the rate-limit watermark at least at the durably committed
        # offset, so post-restart catch-up skips already-consumed ground
        if end.get("version", 0) > self._watermark:
            self._watermark = end["version"]

    def stop(self) -> None:
        pass


@dataclass
class _MetaPartition(InputPartition):
    """Metadata-table read: everything resolves from the manifest on the
    executor — rows are never data-file reads."""

    root: str
    version: str
    kind: str  # history | files | partitions


_META_SCHEMAS = {
    # Delta DESCRIBE HISTORY / Iceberg snapshots-table analogue, from the
    # published lineage (what a reader could ever have observed)
    # n_cols / added_columns: per-snapshot SCHEMA history (r10 verdict
    # task 5) — after additive evolution, which snapshot introduced
    # which column is a first-class DESCRIBE HISTORY fact (Delta and
    # Iceberg both surface schema-change history), diffed from the
    # recorded manifests, not from any side channel
    "history": (
        "version string, parent string, operation string, "
        "n_files int, n_files_written int, n_rows bigint, "
        "n_cols int, added_columns string"
    ),
    # Iceberg files-table analogue: one row per data file of the snapshot
    "files": "rel string, bytes bigint, rows bigint, partition string",
    # Iceberg partitions-table analogue: manifest rollup per partition dir
    "partitions": "partition string, n_files bigint, rows bigint",
}


def _meta_rows(part: _MetaPartition):
    t = TxnTable(part.root)

    def part_of(rel: str) -> str:
        return os.sep.join(
            seg for seg in rel.split(os.sep)[:-1] if "=" in seg
        )

    if part.kind == "history":
        prev_cols: set[str] | None = None
        for meta in reversed(t.lineage()):  # oldest first
            entries = t.file_entries(meta["version"])
            cols = [
                f["name"] for f in (meta.get("schema") or {}).get("fields", [])
            ]
            # schema delta vs the PARENT snapshot: the walk's first
            # retained row has no visible baseline (either the creating
            # commit, where every column is trivially "added", or a
            # vacuum-truncated tail) — record "" there, names after
            added = (
                ",".join(c for c in cols if c not in prev_cols)
                if prev_cols is not None
                else ""
            )
            prev_cols = set(cols)
            yield (
                meta["version"],
                meta.get("parent"),
                meta.get("operation"),
                int(meta.get("n_files", len(entries))),
                int(meta.get("n_files_written", 0)),
                sum(int(e.get("rows", 0)) for e in entries.values()),
                len(cols),
                added,
            )
    elif part.kind == "files":
        for rel, e in sorted(t.file_entries(part.version).items()):
            yield (
                rel,
                int(e.get("bytes", 0)),
                int(e.get("rows", 0)),
                part_of(rel),
            )
    else:  # partitions
        agg: dict[str, list[int]] = {}
        for rel, e in t.file_entries(part.version).items():
            a = agg.setdefault(part_of(rel), [0, 0])
            a[0] += 1
            a[1] += int(e.get("rows", 0))
        for p in sorted(agg):
            yield (p, agg[p][0], agg[p][1])


class TxnMetadataReader(DataSourceReader):
    """``option("metadata", "history"|"files"|"partitions")``: the table's
    own metadata AS a DataFrame (Delta DESCRIBE HISTORY / Iceberg
    metadata-table analogue), served manifest-only — no data file is ever
    opened, so inspecting a 100 TB table costs KBs of manifest IO. Note
    row counts intentionally count DV-suppressed rows (they are physically
    present; the manifest is conservative for pruning — same contract as
    ``delete_where_deferred``)."""

    def __init__(self, options):
        self._root = options["path"]
        self._kind = str(options["metadata"]).lower()
        if self._kind not in _META_SCHEMAS:
            raise ValueError(
                f"metadata must be one of {sorted(_META_SCHEMAS)}, "
                f"got {self._kind!r}"
            )
        self._version = _resolve_version(TxnTable(self._root), options)

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _MetaPartition(
                root=self._root, version=self._version, kind=self._kind
            )
        ]

    def read(self, partition: _MetaPartition):
        yield from _meta_rows(partition)


@dataclass
class _TxnWriteResult(WriterCommitMessage):
    task_dir: str
    n_rows: int


class TxnBatchWriter(DataSourceArrowWriter):
    """``df.write.format("txn").mode("append"|"overwrite").save(root)``:
    exactly-once distributed writes through the format.

    The DSv2 write protocol maps one-to-one onto the txn store's
    staging+rename design: each executor task streams its Arrow batches
    into its OWN staging subdir (``write``), and the single driver-side
    ``commit`` merges the task outputs by hard link and publishes them
    through ``TxnTable.commit_staged`` — per-file stats, sharded
    manifest, carry-by-reference of every parent file on append, CAS
    pointer swap with optimistic retry. A failed job never publishes:
    ``abort`` discards the staging tree, and a crash between rename and
    pointer swap leaves an unreferenced slot, the same crash contract as
    the library writers.

    Partitioned tables write their spec's hive layout via pyarrow's
    ``write_to_dataset`` (one file per partition value per task); a new
    table takes ``option("partitionBy", "a,b")``. Tables with CHECK
    constraints or generated partition columns are refused AT PLAN TIME
    (enforcement needs a session — use the library API); appends
    validate the incoming schema against the recorded one, also at plan
    time."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        self._root = options["path"]
        self._overwrite = overwrite
        self._schema = schema
        self._merge_schema = (
            str(options.get("mergeSchema", "false")).lower() == "true"
        )
        t = TxnTable(self._root)
        cur = t.current_version()
        if cur is not None:
            meta = t._meta(cur)
            self._partition_by = list(meta.get("partition_by") or [])
            if meta.get("constraints"):
                raise ValueError(
                    "format('txn') writes cannot enforce CHECK "
                    "constraints; use the library write path"
                )
            if meta.get("generated"):
                raise ValueError(
                    "format('txn') writes cannot derive generated "
                    "partition columns; use the library write path"
                )
            if not overwrite:
                recorded = StructType.fromJson(meta["schema"])
                by_name = {f.name: f for f in schema.fields}
                rec_names = {f.name for f in recorded.fields}
                missing = [
                    f.name for f in recorded.fields if f.name not in by_name
                ]
                changed = [
                    f.name
                    for f in recorded.fields
                    if f.name in by_name
                    and by_name[f.name].dataType != f.dataType
                ]
                extras = [
                    f.name for f in schema.fields if f.name not in rec_names
                ]
                if missing or changed or (
                    extras and not self._merge_schema
                ):
                    raise ValueError(
                        f"append schema mismatch (missing={missing}, "
                        f"type-changed={changed}, new={extras}): only "
                        "additive evolution is supported, via "
                        "option('mergeSchema', 'true')"
                    )
        else:
            pb = str(options.get("partitionBy", "") or "")
            self._partition_by = [c for c in pb.split(",") if c]
        missing = [
            c for c in self._partition_by if c not in schema.fieldNames()
        ]
        if missing:
            raise ValueError(
                f"partition columns {missing} absent from the written "
                "dataframe"
            )
        # Orphan sweep: a JOB-level failure can skip abort() (observed:
        # the Python DSv2 abort hook does not fire on task failures), so
        # a dead write may leave its dot-prefixed staging tree behind —
        # invisible to every reader (underscore/dot dirs are skipped),
        # but litter. Each new writer sweeps stages old enough that no
        # live write can own them.
        import shutil
        import time as _time

        try:
            for d in os.listdir(self._root):
                if not d.startswith(".wstage-"):
                    continue
                p = os.path.join(self._root, d)
                if _time.time() - os.path.getmtime(p) > 3600:
                    shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
        self._stage = os.path.join(
            self._root, f".wstage-{uuid.uuid4().hex}"
        )

    def write(self, iterator) -> _TxnWriteResult:
        return _stage_task_batches(
            self._stage, self._partition_by, iterator
        )

    def commit(self, messages) -> None:
        try:
            merged = _merge_task_dirs(self._stage, messages, "_merged")
            TxnTable(self._root).commit_staged(
                merged,
                overwrite=self._overwrite,
                schema=self._schema,
                partition_by=self._partition_by or None,
                merge_schema=self._merge_schema,
            )
        finally:
            import shutil

            shutil.rmtree(self._stage, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._stage, ignore_errors=True)


def _stage_task_batches(stage, partition_by, iterator) -> _TxnWriteResult:
    """Executor-side: one task's Arrow batches into its OWN staging
    subdir (partitioned layout via pyarrow when the table has a spec).
    Task-retry safe: a failed attempt's dir is simply never referenced
    by a commit message."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    task = uuid.uuid4().hex
    tdir = os.path.join(stage, f"task-{task}")
    os.makedirs(tdir, exist_ok=True)
    try:
        # keep the shared stage root's mtime fresh while tasks are
        # running so a concurrent writer's 1h orphan sweep never
        # reclaims a LIVE stage (the driver-side loud-loss guard in
        # _merge_task_dirs backstops the remaining window)
        os.utime(stage)
    except OSError:
        pass
    batches = list(iterator)
    n = sum(b.num_rows for b in batches)
    if n == 0:
        return _TxnWriteResult(task_dir=tdir, n_rows=0)
    tbl = pa.Table.from_batches(batches)
    if partition_by:
        pq.write_to_dataset(
            tbl,
            tdir,
            partition_cols=list(partition_by),
            basename_template=f"part-{task}-{{i}}.parquet",
        )
    else:
        pq.write_table(tbl, os.path.join(tdir, f"part-{task}.parquet"))
    return _TxnWriteResult(task_dir=tdir, n_rows=n)


def _merge_task_dirs(stage, messages, name) -> str:
    """Driver-side: hard-link the SUCCEEDED tasks' files (only dirs named
    by commit messages — a retried task's dead attempt is ignored) into
    one staged layout, uniquified by task id in the file names.

    Loud-loss guard: a commit message reporting ``n_rows > 0`` whose
    task dir is missing or holds no parquet files means the staged data
    vanished between task success and driver commit (e.g. a concurrent
    writer's orphan sweep reclaimed a >1h-old stage of a slow job).
    Silently committing nothing would report job success while dropping
    rows, so that is a hard error here."""
    merged = os.path.join(stage, name)
    os.makedirs(merged, exist_ok=True)
    lost = []
    for msg in messages:
        if msg is None:
            continue
        tdir = msg.task_dir
        linked = 0
        if os.path.isdir(tdir):
            for r, _d, ns in os.walk(tdir):
                for nme in ns:
                    if not nme.endswith(".parquet"):
                        continue
                    src = os.path.join(r, nme)
                    rel = os.path.relpath(src, tdir)
                    dst = os.path.join(merged, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.link(src, dst)
                    linked += 1
        if getattr(msg, "n_rows", 0) > 0 and linked == 0:
            lost.append(tdir)
    if lost:
        raise RuntimeError(
            f"staged task output vanished before commit: {lost} "
            "(reported rows but no parquet files remain — a concurrent "
            "writer's orphan sweep may have reclaimed a long-running "
            "job's stage). Nothing was committed."
        )
    return merged


class TxnStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("txn")``: exactly-once streaming appends
    into a txn table through the native DSv2 stream-writer seam — the
    same guarantee the ``foreachBatch`` sinks (streaming/txn_sink.py)
    give, without leaving the declarative write path.

    Exactly-once: each micro-batch commits with its epoch id riding the
    snapshot manifest ATOMICALLY (``extra_meta`` → the
    ``streaming_epoch_id`` watermark key every later commit folds
    forward), and a REPLAYED epoch — Spark re-running a batch whose
    sink commit landed but whose checkpoint advance did not — is
    detected by one manifest read and skipped. Tasks stage their Arrow
    batches like the batch writer; the per-batch commit merges only the
    dirs named by that batch's messages, so batches never mix and a
    retried task's dead attempt is ignored.

    Operational rule (pinned in ``test_raw_availablenow_fallback_skips_
    batch_failed_at_sink_plan``): Python stream sources cannot implement
    Trigger.AvailableNow, so Spark's single-batch fallback does NOT
    re-execute a batch whose offsets were logged but whose SINK plan
    failed (e.g. a schema-mismatch refusal here) — restarting that
    checkpoint skips the range. Retry plan-time failures under a fresh
    checkpoint; failures after planning (task/commit errors) recover
    normally."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        # reuse the batch writer's plan-time validation (table props,
        # schema compat, partition spec, orphan sweep)
        self._inner = TxnBatchWriter(options, schema, overwrite)
        if overwrite:
            raise ValueError(
                "format('txn') streaming supports append output mode "
                "only (per-batch overwrite would replace the table "
                "every trigger)"
            )

    def write(self, iterator) -> _TxnWriteResult:
        return _stage_task_batches(
            self._inner._stage, self._inner._partition_by, iterator
        )

    def commit(self, messages, batchId: int) -> None:
        import shutil

        from ..streaming.txn_sink import last_epoch

        inner = self._inner
        t = TxnTable(inner._root)
        try:
            if t.current_version() is not None:
                last = last_epoch(t)
                if last is not None and last >= batchId:
                    return  # replayed epoch: already committed atomically
            merged = _merge_task_dirs(
                inner._stage, messages, f"_merged-{batchId}"
            )
            t.commit_staged(
                merged,
                schema=inner._schema,
                partition_by=inner._partition_by or None,
                merge_schema=inner._merge_schema,
                extra_meta={"streaming_epoch_id": int(batchId)},
            )
        finally:
            # per-batch cleanup: this batch's task dirs + merge dir only
            # (the shared stage root lives for the query's lifetime)
            for msg in messages:
                if msg is not None and os.path.isdir(msg.task_dir):
                    shutil.rmtree(msg.task_dir, ignore_errors=True)
            shutil.rmtree(
                os.path.join(inner._stage, f"_merged-{batchId}"),
                ignore_errors=True,
            )

    def abort(self, messages, batchId: int) -> None:
        import shutil

        for msg in messages:
            if msg is not None and os.path.isdir(msg.task_dir):
                shutil.rmtree(msg.task_dir, ignore_errors=True)


class TxnDataSource(DataSource):
    """``format("txn")``: txn snapshot tables for batch and streaming."""

    @classmethod
    def name(cls) -> str:
        return "txn"

    def schema(self) -> StructType:
        meta_kind = self.options.get("metadata")
        if meta_kind is not None:
            kind = str(meta_kind).lower()
            if kind not in _META_SCHEMAS:
                raise ValueError(
                    f"metadata must be one of {sorted(_META_SCHEMAS)}, "
                    f"got {kind!r}"
                )
            # a DDL string — schema() runs in a worker with no active
            # SparkContext, so it cannot parse to StructType itself
            return _META_SCHEMAS[kind]
        table = TxnTable(self.options["path"])
        cdf = str(
            self.options.get("readChangeFeed", "false")
        ).lower() == "true"
        ev = self.options.get("endingVersion")
        if cdf and ev is not None and self.options.get("version") is None:
            # batch CDF pinned to a range: the feed's shape is the
            # RANGE-END version's schema (read_row_changes contract)
            v = f"v{int(str(ev).lstrip('v')):08d}"
        else:
            v = _resolve_version(table, self.options)
        schema = StructType.fromJson(table._meta(v)["schema"])
        if cdf:
            # Delta's CDF shape: data columns + change metadata
            from pyspark.sql.types import StringType, StructField

            schema = StructType(
                schema.fields
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", StringType()),
                ]
            )
        return schema

    def reader(self, schema: StructType) -> DataSourceReader:
        if self.options.get("metadata") is not None:
            return TxnMetadataReader(self.options)
        if str(
            self.options.get("readChangeFeed", "false")
        ).lower() == "true":
            # batch CDF (Delta's table_changes shape); without this the
            # snapshot readers would return table rows with NULL change
            # columns — silent wrong output
            return TxnChangeFeedReader(self.options, schema)
        # Pruning is the DEFAULT since round 9: the driver-side pushdown
        # guard installed by register_txn_source() (pushdown_guard.py)
        # defeats the two Spark 4.1 relation-cache wrong-answer modes
        # that forced round 8 to ship it opt-in. option("pushdown",
        # "false") restores the query-independent full-list reader.
        if str(self.options.get("pushdown", "true")).lower() == "false":
            return TxnSnapshotReader(self.options, schema)
        return TxnPruningReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return TxnBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return TxnStreamWriter(self.options, schema, overwrite)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return TxnStreamReader(self.options, schema)


def register_txn_source(spark) -> None:
    # Python-source filter pushdown is gated off by default; without it
    # Spark refuses any reader that implements pushFilters.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # The guard is what makes default-on pruning safe: it resets the
    # JVM-side per-relation read-info cache before every wrapped action
    # (defeating filtered-plan replay on filterless reuse) and disables
    # pushdown for the single action when one relation backs multiple
    # scans (defeating intra-query cache aliasing). See pushdown_guard.py.
    from .pushdown_guard import install_pushdown_guard

    install_pushdown_guard()
    spark.dataSource.register(TxnDataSource)
