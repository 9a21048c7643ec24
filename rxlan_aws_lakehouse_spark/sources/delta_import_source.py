"""``spark.read.format("delta_import")`` — foreign Delta tables as a
first-class Spark source (round 12, r11 verdict task 2's catalog face).

::

    df = (spark.read.format("delta_import")
          .option("version", 7)          # optional time travel
          .load("/path/to/delta_table"))

Planning is LOG-ONLY: ``replay_delta_log`` (delta_export.py) resolves
the live file set from ``_last_checkpoint`` + JSON tail — a directory
is never listed, exactly the contract the txn source holds. Protocol
gating happens at plan time (``_gate_foreign_protocol``):
``columnMapping.mode=name`` tables are SUPPORTED (physical parquet
names resolve through ``delta.columnMapping.physicalName`` field
metadata, riding the same per-partition ``phys`` tuple the txn source
uses for its own mapped tables); DELETION VECTORS are supported too
(r12 verdict task 1) — each DV-bearing add ships its descriptor as a
compact ``dv_spec`` on the file partition and the roaring bitmap is
decoded executor-side (delta_dv.py) into the row mask; ID-mode column
mapping binds data columns by parquet FIELD ID (``field_ids`` on the
partition, matched against each footer's ``PARQUET:field_id``); v2
checkpoints (UUID-named + sidecars) replay in ``replay_delta_log``.
Reader features beyond that set refuse loudly by name, never a silent
misread.

File skipping, the property that makes a foreign 100 TB mirror
queryable: pushed predicates prune at TWO metadata levels before Spark
plans a single task —

* ``add.partitionValues`` — authoritative per-spec partition values
  (the file layout is never trusted); equality and range predicates on
  partition columns drop whole files. String-typed dirs compare
  lexically AND numerically (both semantics must prove emptiness,
  the same conservative rule as txn.py's ``_file_prunable``).
* ``add.stats`` — the spec's per-file JSON stats (``minValues`` /
  ``maxValues`` / ``nullCount`` / ``numRecords``), written by every
  real Delta writer; range predicates on data columns skip files whose
  recorded range proves them empty.

Every filter is reported unhandled, so Spark re-applies them row-level
— pruning is an IO bound, never the correctness boundary. The same
driver-side pushdown guard the txn source uses makes default-on
pruning safe against Spark 4.1's relation-cache replay modes.

Executor reads reuse the txn source's Arrow path
(``_read_file_batches``): partition values ride each file's partition
as typed constants (``consts``), foreign deletion vectors anti-apply
by in-file row index (``dv_spec``), and the batch is cast to the
table's exact Arrow schema.
"""

from __future__ import annotations

import json
import os
import posixpath
from typing import Iterator, Sequence
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

# Heavy engine imports are deferred into a memoized accessor: this
# module is imported during the connect-back window of freshly spawned
# Python data-source workers (driver-side streaming runner / planners),
# which have a hard 10 s deadline — module import must stay cheap; the
# engine loads at first METHOD call, after the socket handshake and
# outside the deadline (guide §4: keep the Python boundary light).
def _eng():
    global _ENG
    if _ENG is None:
        from .. import delta_export
        from . import txn_source

        _ENG = (delta_export, txn_source)
    return _ENG


_ENG = None


def _schema_field_ids(state: dict, schema: StructType) -> tuple:
    """Per-field parquet ids aligned to ``schema`` when the table maps
    columns in ID mode (0 = bind by name), else the empty tuple."""
    if _eng()[0]._cm_mode(state) != "id":
        return ()
    fid_map = _eng()[0]._foreign_field_ids(state)
    return tuple(fid_map.get(f.name, 0) for f in schema.fields)


def _resolve_state(options) -> dict:
    path = options["path"]
    v = options.get("version")
    ts = options.get("timestampAsOf")
    if ts is not None:
        if v is not None:
            raise ValueError(
                "pass option version OR timestampAsOf, not both"
            )
        from ..delta_export import resolve_delta_timestamp

        v = resolve_delta_timestamp(path, ts)
    state = _eng()[0].replay_delta_log(
        path, up_to=int(v) if v is not None else None
    )
    _eng()[0]._gate_foreign_protocol(state)
    return state


def _dv_spec_of(add: dict, root: str) -> tuple | None:
    """The add's ``deletionVector`` descriptor as an executor-ready
    spec (delta_dv.descriptor_spec); None when the file has no DV."""
    d = add.get("deletionVector")
    if not d:
        return None
    if isinstance(d, list):  # pyarrow struct-as-pairs round-trip
        d = dict(d)
    from ..delta_dv import descriptor_spec

    return descriptor_spec(root, d)


def _cmp_empty(op: str, lo, hi, lit) -> bool:
    """Range emptiness for one comparison against [lo, hi]."""
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


def _pv_prunable(pv: dict, col: str, op: str, lit) -> bool:
    """May a file with partition value ``pv[col]`` satisfy the
    comparison? Prune ONLY when every plausible comparison semantic
    (lexical for strings, numeric when both sides parse) proves it
    empty — the txn manifest's conservative partition rule."""
    if col not in pv:
        return False
    raw = pv[col]
    if raw is None:
        return True  # null partition: no comparison matches
    if isinstance(lit, str):
        verdicts = [_cmp_empty(op, raw, raw, lit)]
        try:
            f = float(raw)
            verdicts.append(_cmp_empty(op, f, f, float(lit)))
        except (TypeError, ValueError):
            pass
        return all(verdicts)
    if isinstance(lit, (int, float)) and not isinstance(lit, bool):
        try:
            f = float(raw)
        except (TypeError, ValueError):
            return True  # numeric literal vs non-numeric dir: no match
        return _cmp_empty(op, f, f, float(lit))
    return False


def _stats_prunable(stats: dict, col: str, op: str, lit) -> bool:
    """May a file whose add.stats record ``col`` satisfy the
    comparison? Uses minValues/maxValues (same-typed literals only)
    and the all-null shortcut. Unknown columns/types never prune."""
    rows = stats.get("numRecords")
    nulls = (stats.get("nullCount") or {}).get(col)
    if rows is not None and nulls is not None and nulls == rows and rows > 0:
        return True  # all-null file: no comparison matches
    lo = (stats.get("minValues") or {}).get(col)
    hi = (stats.get("maxValues") or {}).get(col)
    if lo is None or hi is None:
        return False
    if isinstance(lit, bool) or lit is None:
        return False
    if isinstance(lit, str) and isinstance(lo, str) and isinstance(hi, str):
        return _cmp_empty(op, lo, hi, lit)
    if isinstance(lit, (int, float)) and isinstance(
        lo, (int, float)
    ) and isinstance(hi, (int, float)):
        return _cmp_empty(op, float(lo), float(hi), float(lit))
    return False


class DeltaImportReader(DataSourceReader):
    """Batch reader over one replayed foreign snapshot, with
    add.stats / partitionValues file skipping on pushed filters."""

    def __init__(self, options, schema: StructType):
        if str(
            options.get("readChangeFeed", "false")
        ).lower() == "true":
            raise ValueError(
                "readChangeFeed is a STREAMING option on "
                "format('delta_import') — use spark.readStream (the "
                "batch change feed is read_delta_cdf)"
            )
        self._schema = schema
        self._root = options["path"]
        self._state = _resolve_state(options)
        self._part_cols = list(self._state["partition_columns"])
        # columnMapping name mode: logical -> physical per field (from
        # delta.columnMapping.physicalName metadata; identity on plain
        # tables). Files, partitionValues and stats all bind physical.
        self._phys_map = _eng()[0]._foreign_phys(self._state)
        phys_tuple = (
            tuple(
                self._phys_map.get(f.name, f.name)
                for f in schema.fields
            )
            if schema is not None
            else ()
        )
        self._phys = (
            phys_tuple
            if schema is not None
            and phys_tuple != tuple(f.name for f in schema.fields)
            else ()
        )
        self._fids = (
            _schema_field_ids(self._state, schema)
            if schema is not None
            else ()
        )
        self._triples: list[tuple] = []

    def pushFilters(self, filters: list[Filter]):
        triples, points = _eng()[1]._filter_triples(filters)
        # point lookups prune as equality triples here (no blooms in a
        # foreign log; stats ranges still catch them)
        self._triples = triples + [
            (col, "=", v) for col, vals in points for v in vals[:1]
            if len(vals) == 1
        ]
        return filters  # all re-applied row-level by Spark

    def _keep(self, add: dict) -> bool:
        pv = add.get("partitionValues") or {}
        raw_stats = add.get("stats")
        try:
            stats = json.loads(raw_stats) if raw_stats else {}
        except (TypeError, ValueError):
            stats = {}
        for col, op, lit in self._triples:
            # pushed predicates name LOGICAL columns; partitionValues
            # and stats keys are physical per the spec's writer rule
            pcol = self._phys_map.get(col, col)
            if _pv_prunable(pv, pcol, op, lit):
                return False
            if _stats_prunable(stats, pcol, op, lit):
                return False
        return True

    def partitions(self) -> Sequence[InputPartition]:
        parts = []
        for rel in self._state["files"]:
            add = self._state["adds"][rel]
            if not self._keep(add):
                continue
            pv = add.get("partitionValues") or {}
            consts = tuple(
                (
                    self._phys_map.get(c, c),
                    pv.get(self._phys_map.get(c, c)),
                )
                for c in self._part_cols
            )
            parts.append(
                _eng()[1]._FilePartition(
                    file_path=os.path.join(self._root, rel),
                    # basename only: foreign rel paths may carry hive
                    # dirs whose values must NOT override the log's
                    # authoritative partitionValues (consts)
                    rel=posixpath.basename(rel),
                    dv_dir=None,
                    consts=consts,
                    phys=self._phys,
                    dv_spec=_dv_spec_of(add, self._root),
                    field_ids=self._fids,
                )
            )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        if partition is None:
            return  # empty table: zero partitions, one None feed
        yield from _eng()[1]._read_file_batches(partition, self._schema)


class DeltaImportStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("delta_import")`` — tail a FOREIGN
    Delta table's commit log as a stream, the Delta streaming-source
    contract re-expressed over the importer's replay machinery:

    * one micro-batch per offset range of commit versions; each
      commit's ``dataChange=true`` adds become file partitions (the
      compaction marker ``dataChange=false`` is SKIPPED — OPTIMIZE
      rewrites are never re-emitted, the exact reason the exporter
      emits it);
    * ``remove`` actions with ``dataChange=true`` raise unless
      ``ignoreDeletes``/``ignoreChanges`` (Delta's own semantics:
      a streaming source cannot retract rows);
    * a mid-stream ``metaData`` whose schemaString differs from the
      plan-time schema raises — restart the stream to pick up the new
      schema (Delta fails the same way); a protocol upgrade re-gates
      and refuses unsupported features loudly;
    * ``startingVersion``: ``latest`` (default — only new commits),
      ``earliest``, or a number. Commits whose JSON was cleaned up
      past a checkpoint cannot be streamed individually and raise a
      reconstructable error. ``maxVersionsPerTrigger`` bounds catch-up
      batches exactly like the txn source's cap.
    * ``readChangeFeed=true`` (round 15, r14 verdict task 6 — the
      foreign twin of the native ``txn_source_stream_cdf``): rows come
      back as the CHANGE FEED — the table schema plus ``_change_type``
      and ``_commit_version`` — per the protocol's change-data rules:
      a commit carrying ``cdc`` actions streams EXACTLY those recorded
      files (they hold the physical data columns + ``_change_type``;
      partition values attach from ``cdc.partitionValues``); a commit
      without them derives ``insert`` rows from its
      ``dataChange=true`` adds; a commit that REMOVED rows without
      recording cdc fails loudly (its row-level history cannot be
      derived — enable ``delta.enableChangeDataFeed`` on the writer).

    Partition values and physical column names resolve exactly as the
    batch reader's: ``consts`` + the plan-time ``phys`` tuple (frozen
    physical names — a rename between plan and read cannot break the
    binding)."""

    def __init__(self, options, schema: StructType):
        self._schema = schema
        self._root = options["path"]
        self._log = os.path.join(self._root, "_delta_log")
        state = _resolve_state(options)
        self._plan_schema_str = json.dumps(state["schema"], sort_keys=True)
        self._part_cols = list(state["partition_columns"])
        self._phys_map = _eng()[0]._foreign_phys(state)
        names = tuple(
            self._phys_map.get(f.name, f.name) for f in schema.fields
        )
        self._phys = (
            names
            if names != tuple(f.name for f in schema.fields)
            else ()
        )
        self._fids = _schema_field_ids(state, schema)
        self._cdf = str(
            options.get("readChangeFeed", "false")
        ).lower() == "true"
        self._ignore_deletes = str(
            options.get("ignoreDeletes", "false")
        ).lower() == "true"
        self._ignore_changes = str(
            options.get("ignoreChanges", "false")
        ).lower() == "true"
        start = str(options.get("startingVersion", "latest")).lower()
        if start == "earliest":
            self._start = -1
        elif start == "latest":
            self._start = state["n_commits"] - 1
        else:
            self._start = int(start) - 1
        mv = int(options.get("maxVersionsPerTrigger", 0))
        self._max_versions = mv if mv > 0 else None
        self._watermark = self._start

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def _head(self) -> int:
        head = -1
        for n in os.listdir(self._log):
            if n.endswith(".json") and n[:20].isdigit():
                head = max(head, int(n[:20]))
        ckpt = os.path.join(self._log, "_last_checkpoint")
        if os.path.exists(ckpt):
            try:
                with open(ckpt) as f:
                    head = max(head, int(json.load(f)["version"]))
            except (ValueError, KeyError):
                pass
        return head

    def latestOffset(self) -> dict:
        head = self._head()
        if self._max_versions is not None:
            head = min(head, self._watermark + self._max_versions)
            self._watermark = max(self._watermark, head)
        return {"version": head}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["version"], end["version"]
        if hi > self._watermark:
            self._watermark = hi
        parts: list[InputPartition] = []
        for n in range(lo + 1, hi + 1):
            commit_path = os.path.join(self._log, f"{n:020d}.json")
            if not os.path.isfile(commit_path):
                raise RuntimeError(
                    f"commit {n} of {self._root} has no JSON file — log "
                    "cleanup passed it (only the checkpoint survives); "
                    "individual commits beyond a checkpoint cannot be "
                    "streamed — restart from a later startingVersion"
                )
            with open(commit_path) as f:
                actions = [
                    json.loads(line)
                    for line in f
                    if line.strip()
                ]
            if self._cdf:
                parts.extend(self._cdf_partitions(n, actions))
                continue
            for a in actions:
                if "metaData" in a:
                    got = json.dumps(
                        json.loads(a["metaData"]["schemaString"]),
                        sort_keys=True,
                    )
                    if got != self._plan_schema_str:
                        raise RuntimeError(
                            f"schema change at commit {n} of "
                            f"{self._root}; restart the stream to pick "
                            "up the new schema (Delta streaming-source "
                            "semantics)"
                        )
                elif "protocol" in a:
                    _eng()[0]._gate_foreign_protocol(
                        {"protocol": a["protocol"], "adds": {}}
                    )
                elif "remove" in a:
                    if bool(a["remove"].get("dataChange", True)) and not (
                        self._ignore_deletes or self._ignore_changes
                    ):
                        raise RuntimeError(
                            f"streaming source hit a remove at commit "
                            f"{n} of {self._root}; set ignoreDeletes="
                            "true or ignoreChanges=true (Delta "
                            "semantics: a stream cannot retract rows)"
                        )
                elif "add" in a:
                    add = a["add"]
                    if not bool(add.get("dataChange", True)):
                        continue  # compaction rewrite: rows already seen
                    rel = unquote(add["path"])
                    pv = add.get("partitionValues") or {}
                    if isinstance(pv, list):
                        pv = dict(pv)
                    consts = tuple(
                        (
                            self._phys_map.get(c, c),
                            pv.get(self._phys_map.get(c, c)),
                        )
                        for c in self._part_cols
                    )
                    # a DV-bearing add is a CHANGE to an existing file
                    # (Delta pairs it with a remove, which the remove
                    # branch above already gates behind ignoreDeletes/
                    # ignoreChanges); the re-emitted file streams with
                    # its mask applied, matching Delta's ignoreChanges
                    # contract (rows may re-appear, deleted rows never)
                    parts.append(
                        _eng()[1]._FilePartition(
                            file_path=os.path.join(self._root, rel),
                            rel=posixpath.basename(rel),
                            dv_dir=None,
                            consts=consts,
                            phys=self._phys,
                            dv_spec=_dv_spec_of(add, self._root),
                            field_ids=self._fids,
                        )
                    )
        return parts

    def _cdf_partitions(self, n: int, actions: list) -> list:
        """One commit's CHANGE-FEED file partitions per the protocol's
        change-data rules (``readChangeFeed=true``): recorded ``cdc``
        files verbatim when present (they carry ``_change_type``; the
        commit version attaches as a typed constant), else ``insert``
        derivation from ``dataChange=true`` adds — and a LOUD failure
        when the commit removed rows without recording cdc (its
        row-level history cannot be derived)."""
        out: list[InputPartition] = []

        def fp(rel: str, pv: dict, extra: tuple, dv_spec=None):
            consts = tuple(
                (
                    self._phys_map.get(c, c),
                    pv.get(self._phys_map.get(c, c)),
                )
                for c in self._part_cols
            ) + extra
            return _eng()[1]._FilePartition(
                file_path=os.path.join(self._root, rel),
                rel=posixpath.basename(rel),
                dv_dir=None,
                consts=consts,
                phys=self._phys,
                dv_spec=dv_spec,
                field_ids=self._fids,
            )

        cdc_actions = []
        removes_changeful = False
        adds = []
        for a in actions:
            if "metaData" in a:
                got = json.dumps(
                    json.loads(a["metaData"]["schemaString"]),
                    sort_keys=True,
                )
                if got != self._plan_schema_str:
                    raise RuntimeError(
                        f"schema change at commit {n} of {self._root}; "
                        "restart the stream to pick up the new schema "
                        "(Delta streaming-source semantics)"
                    )
            elif "protocol" in a:
                _eng()[0]._gate_foreign_protocol(
                    {"protocol": a["protocol"], "adds": {}}
                )
            elif "cdc" in a:
                cdc_actions.append(a["cdc"])
            elif "remove" in a and bool(
                a["remove"].get("dataChange", True)
            ):
                removes_changeful = True
            elif "add" in a and bool(a["add"].get("dataChange", True)):
                adds.append(a["add"])
        if cdc_actions:
            # spec rule: a commit with ANY cdc action is read ONLY
            # through its cdc files
            for c in cdc_actions:
                pv = c.get("partitionValues") or {}
                if isinstance(pv, list):
                    pv = dict(pv)
                out.append(
                    fp(
                        unquote(c["path"]),
                        pv,
                        (("_commit_version", str(n)),),
                    )
                )
            return out
        if removes_changeful:
            raise RuntimeError(
                f"commit {n} of {self._root} changed/removed rows but "
                "recorded no cdc files — its change feed cannot be "
                "derived; enable delta.enableChangeDataFeed on the "
                "writer (or stream the data, not the change feed)"
            )
        for add in adds:
            pv = add.get("partitionValues") or {}
            if isinstance(pv, list):
                pv = dict(pv)
            out.append(
                fp(
                    unquote(add["path"]),
                    pv,
                    (
                        ("_change_type", "insert"),
                        ("_commit_version", str(n)),
                    ),
                    dv_spec=_dv_spec_of(add, self._root),
                )
            )
        return out

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _eng()[1]._read_file_batches(partition, self._schema)

    def commit(self, end: dict) -> None:
        if end.get("version", -1) > self._watermark:
            self._watermark = end["version"]

    def stop(self) -> None:
        pass


class DeltaImportDataSource(DataSource):
    """``format("delta_import")``: read-only foreign Delta tables."""

    @classmethod
    def name(cls) -> str:
        return "delta_import"

    def schema(self) -> StructType:
        st = StructType.fromJson(_resolve_state(self.options)["schema"])
        if str(
            self.options.get("readChangeFeed", "false")
        ).lower() == "true":
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
            )

            st = StructType(
                list(st.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )
        return st

    def reader(self, schema: StructType) -> DataSourceReader:
        return DeltaImportReader(self.options, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return DeltaImportStreamReader(self.options, schema)


def register_delta_import_source(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # same driver-side guard as the txn source: resets the per-relation
    # read-info cache before wrapped actions so pruned plans are never
    # replayed for filterless reuse (pushdown_guard.py)
    from .pushdown_guard import install_pushdown_guard

    install_pushdown_guard()
    spark.dataSource.register(DeltaImportDataSource)
