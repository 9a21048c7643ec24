"""Transactional table commits: manifest-pointer snapshot isolation.

The reference's gold load is transactional — Redshift stages the COPY and
commits it atomically (/root/reference/glue/bronze_to_silver_openweather.py:
134-148), so a concurrent BI query never sees half a load. Plain
``mode("overwrite")`` parquet gives up that property: the directory is
deleted, then refilled, and a reader in between sees a torn (or empty)
table. This module restores the Redshift guarantee with the mechanism
Delta/Iceberg use — immutable data files + an atomically swapped pointer:

    <root>/
      _versions/v00000001/        immutable parquet snapshot (+ _meta.json)
      _versions/v00000002/
      _LATEST                     tiny pointer file naming the live version

Writers build the NEXT version directory in full (data + metadata manifest),
then swap ``_LATEST`` via ``os.rename`` of a same-directory temp file —
atomic on POSIX, so every reader resolves either the old snapshot or the new
one, never a mixture. Old snapshots stay on disk until ``vacuum`` (readers
that already resolved them keep working: their files are never mutated).

On an object store the rename becomes a conditional PUT / commit-service
call (how Delta's S3 LogStore and Iceberg's catalog swap work); everything
else — immutable version dirs, manifest metadata, optimistic concurrency on
the expected parent version — carries over unchanged, which is why the
upsert/compact logic below is written against snapshots, not paths.

Each snapshot's ``_meta.json`` records the partition spec, so operations
that rewrite the table (``merge_upsert``, ``compact``) re-apply it — a gold
table partitioned by dt/hour stays partitioned through every upsert.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import time
from urllib.parse import unquote, urlparse

import pyarrow.parquet as _pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSIONS = "_versions"
_LATEST = "_LATEST"


def _stat_value(v):
    """Parquet-footer min/max -> (type_tag, JSON value), or None if the
    type is one we will not prune on. ISO-8601 strings order the same as
    the timestamps/dates they encode, so range compares stay lexical."""
    if isinstance(v, bool) or v is None:
        return None  # boolean ranges prune nothing useful
    if isinstance(v, (int, float)):
        return ("num", v)
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, bytes):
        try:
            return ("str", v.decode("utf-8"))
        except UnicodeDecodeError:
            return None
    if isinstance(v, _dt.datetime):
        return ("ts", v.isoformat(sep=" "))
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    return None


def _coerce_literal(tag: str, lit):
    """A user predicate literal -> the stats domain for ``tag`` (None if
    incomparable, which disables pruning on that conjunct for the file)."""
    try:
        if tag == "num":
            return float(lit) if not isinstance(lit, bool) else None
        if tag == "str":
            return lit if isinstance(lit, str) else None
        if tag == "ts":
            if isinstance(lit, _dt.datetime):
                return lit.isoformat(sep=" ")
            if isinstance(lit, _dt.date):
                return _dt.datetime.combine(lit, _dt.time()).isoformat(sep=" ")
            return str(lit) if isinstance(lit, str) else None
        if tag == "date":
            if isinstance(lit, _dt.datetime):
                return lit.date().isoformat()
            if isinstance(lit, _dt.date):
                return lit.isoformat()
            return str(lit) if isinstance(lit, str) else None
    except (TypeError, ValueError):
        return None
    return None


def _file_column_stats(path: str) -> dict:
    """Footer-only per-file stats: rows + per-top-level-column min/max/nulls.

    The same metadata Iceberg manifests and Delta's stats JSON carry; read
    from the parquet footer (a few KB) rather than the data pages, so commit
    cost stays proportional to file COUNT. Columns whose footer lacks
    min/max in any row group are omitted (never pruned on).
    """
    md = _pq.ParquetFile(path).metadata
    cols: dict[str, dict] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name or name in bad:
                continue
            st = c.statistics
            nulls = st.null_count if st is not None else None
            all_null = (
                st is not None and nulls is not None and nulls == g.num_rows
            )
            if st is None or nulls is None or not (st.has_min_max or all_null):
                bad.add(name)
                cols.pop(name, None)
                continue
            lo = _stat_value(st.min) if st.has_min_max else None
            hi = _stat_value(st.max) if st.has_min_max else None
            if not all_null and (lo is None or hi is None or lo[0] != hi[0]):
                bad.add(name)
                cols.pop(name, None)
                continue
            e = cols.setdefault(
                name, {"t": lo[0] if lo else None, "min": None, "max": None,
                       "nulls": 0}
            )
            e["nulls"] += nulls
            if lo is not None:
                if e["t"] is None:
                    e["t"] = lo[0]
                e["min"] = lo[1] if e["min"] is None else min(e["min"], lo[1])
                e["max"] = hi[1] if e["max"] is None else max(e["max"], hi[1])
    return {"rows": md.num_rows, "columns": cols}


def _local_path(file_uri: str) -> str:
    """file:/... URI (as returned by input_file_name) -> local filesystem path."""
    p = urlparse(file_uri)
    return unquote(p.path) if p.scheme in ("file", "") else file_uri


class ConcurrentCommitError(RuntimeError):
    """Another writer committed between this transaction's read and write."""


class TxnTable:
    """A parquet table with atomic commits and snapshot reads."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, _VERSIONS), exist_ok=True)

    # -- pointer ----------------------------------------------------------
    def current_version(self) -> str | None:
        try:
            with open(os.path.join(self.root, _LATEST)) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _swap_pointer(self, version: str, expect: str | None) -> None:
        # Optimistic concurrency: re-check the parent version immediately
        # before the swap. Two local writers racing past this check is the
        # window a real deployment closes with a conditional PUT; the
        # check still catches every read-modify-write conflict that spans
        # a Spark job, which is the realistic interleaving.
        if self.current_version() != expect:
            raise ConcurrentCommitError(
                f"table advanced past {expect!r}; retry on the new snapshot"
            )
        tmp = os.path.join(self.root, f".{_LATEST}.{os.getpid()}.{time.time_ns()}")
        with open(tmp, "w") as f:
            f.write(version)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.root, _LATEST))

    def _next_version(self) -> str:
        # Max over the pointer AND existing version dirs: an orphaned slot
        # from a crashed commit must not permanently collide with the next
        # writer's rename.
        cur = self.current_version()
        n = int(cur[1:]) if cur else 0
        for v in os.listdir(os.path.join(self.root, _VERSIONS)):
            if v.startswith("v") and v[1:].isdigit():
                n = max(n, int(v[1:]))
        return f"v{n + 1:08d}"

    # -- metadata ---------------------------------------------------------
    def _meta(self, version: str) -> dict:
        with open(os.path.join(self.root, _VERSIONS, version, "_meta.json")) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        vdir = os.path.join(self.root, _VERSIONS)
        out = []
        for v in sorted(os.listdir(vdir)):
            # skip in-flight .tmp-* staging dirs — only renamed slots count
            if not (v.startswith("v") and v[1:].isdigit()):
                continue
            meta_path = os.path.join(vdir, v, "_meta.json")
            if os.path.exists(meta_path):
                out.append(self._meta(v))
        return out

    # -- read -------------------------------------------------------------
    def read(self, spark: SparkSession, version: str | None = None) -> DataFrame:
        """Snapshot read: resolve the pointer ONCE, then scan an immutable
        directory — later commits cannot tear this DataFrame."""
        v = version or self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        data = os.path.join(self.root, _VERSIONS, v)
        return spark.read.option("basePath", data).parquet(data)

    # -- stats-based file skipping ---------------------------------------
    @staticmethod
    def _file_prunable(entry: dict, rel: str, predicates) -> bool:
        """True if the manifest PROVES no row of this file can satisfy the
        conjunction. Conservative: unknown columns/types never prune."""
        cols = entry.get("columns", {})
        rows = entry.get("rows", 0)
        parts = dict(
            seg.split("=", 1) for seg in rel.split(os.sep)[:-1] if "=" in seg
        )
        for col, op, lit in predicates:
            if col in parts:
                v = unquote(parts[col])
                if v == "__HIVE_DEFAULT_PARTITION__":
                    return True  # null partition: comparisons match nothing

                def empty(a, b):
                    return (
                        (op == "=" and a != b)
                        or (op == "<" and a >= b)
                        or (op == "<=" and a > b)
                        or (op == ">" and a <= b)
                        or (op == ">=" and a < b)
                    )

                # Partition-type inference is global (over dirs this file
                # can't see), so the comparison semantics are ambiguous
                # from one path alone. Prune only when EVERY plausible
                # semantic proves the file empty: lexical for string
                # literals, numeric whenever both sides parse. A numeric
                # literal against a non-numeric dir value casts to null in
                # Spark -> no row matches -> prunable.
                if isinstance(lit, str):
                    verdicts = [empty(v, lit)]
                    try:
                        verdicts.append(empty(float(v), float(lit)))
                    except (TypeError, ValueError):
                        pass
                    if all(verdicts):
                        return True
                elif isinstance(lit, (int, float)) and not isinstance(
                    lit, bool
                ):
                    try:
                        if empty(float(v), float(lit)):
                            return True
                    except (TypeError, ValueError):
                        return True
                continue
            st = cols.get(col)
            if st is None:
                continue
            if st["nulls"] == rows and rows > 0:
                return True  # all-null file: no comparison can match
            if st["min"] is None or st["max"] is None:
                continue
            lo, hi = st["min"], st["max"]
            cl = _coerce_literal(st["t"], lit)
            if cl is None:
                continue
            if (
                (op == "=" and (cl < lo or cl > hi))
                or (op == "<" and lo >= cl)
                or (op == "<=" and lo > cl)
                or (op == ">" and hi <= cl)
                or (op == ">=" and hi < cl)
            ):
                return True
        return False

    def pruned_files(
        self, predicates, version: str | None = None
    ) -> tuple[list[str], int]:
        """Manifest-only file skipping: relative paths of the files a scan
        with ``predicates`` (conjunctive ``(col, op, literal)`` triples,
        ops ``= < <= > >=``) must read, plus the snapshot's total file
        count. Pure metadata — no data IO, no Spark job."""
        v = version or self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        meta = self._meta(v)
        stats = meta.get("stats", {})
        kept = [
            rel
            for rel in meta["files"]
            if not self._file_prunable(stats.get(rel, {}), rel, predicates)
        ]
        return kept, len(meta["files"])

    def read_pruned(
        self, spark: SparkSession, predicates, version: str | None = None
    ) -> DataFrame:
        """Snapshot read that skips every file whose manifest min/max range
        proves it irrelevant (Iceberg/Delta data skipping), then applies
        ``predicates`` as real row filters — pruning is an IO optimization,
        never the correctness boundary. On a 100 TB time-partitioned table
        a day-range predicate turns the scan's file list from the whole
        manifest into one day's files before Spark plans a single task.

        A table whose files are clustered on the predicate columns (see
        ``commit(sort_within=...)`` / ``ops.zorder``) skips most; a random
        layout skips little — same contract as any min/max index.
        """
        v = version or self.current_version()
        kept, _total = self.pruned_files(predicates, v)
        data = os.path.join(self.root, _VERSIONS, v)
        if not kept:
            df = spark.createDataFrame([], self.read(spark, v).schema)
        else:
            df = spark.read.option("basePath", data).parquet(
                *(os.path.join(data, rel) for rel in kept)
            )
        ops = {
            "=": lambda c, x: c == x,
            "<": lambda c, x: c < x,
            "<=": lambda c, x: c <= x,
            ">": lambda c, x: c > x,
            ">=": lambda c, x: c >= x,
        }
        for col, op, lit in predicates:
            df = df.filter(ops[op](F.col(col), F.lit(lit)))
        return df

    # -- write ------------------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        sort_within: list[str] | None = None,
        operation: str = "overwrite",
        carry_files: dict[str, str] | None = None,
        carry_resolver=None,
    ) -> str:
        """Write ``df`` as a new snapshot and atomically publish it.

        ``partition_by`` defaults to the previous snapshot's spec, so the
        physical layout survives rewrites without every caller restating it.

        ``carry_files`` maps relative paths -> absolute source paths of
        parquet files from a previous snapshot to carry over BY REFERENCE
        (hard link, no data copy) — how ``merge_upsert`` leaves untouched
        files alone. On an object store the link becomes a manifest entry
        pointing at the original object (Delta/Iceberg never copy carried
        files either); locally a hard link gives the same economy with a
        plain-directory reader. ``carry_resolver`` computes that map AFTER
        the dataframe write, from the staging directory's contents —
        needed when the carried set depends on what was written (e.g.
        which partitions ``df`` actually produced) without re-executing
        ``df``'s plan.

        Crash/race safety: everything is written into a unique ``.tmp-*``
        staging dir and renamed into the version slot. A writer that loses
        the rename race only ever deletes its OWN staging dir — a committed
        (possibly pointer-referenced) snapshot written by the winner is
        never touched. The pointer swap then re-checks the expected parent
        (optimistic concurrency).
        """
        expect = self.current_version()
        if partition_by is None and expect is not None:
            partition_by = self._meta(expect).get("partition_by") or None
        staging = os.path.join(
            self.root, _VERSIONS, f".tmp-{os.getpid()}-{time.time_ns()}"
        )
        out = df.sortWithinPartitions(*sort_within) if sort_within else df
        writer = out.write.mode("error").format("parquet")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        version: str | None = None
        renamed = False
        try:
            writer.save(staging)
            if carry_files is None and carry_resolver is not None:
                carry_files = carry_resolver(staging)
            for rel, src in (carry_files or {}).items():
                dst = os.path.join(staging, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.link(src, dst)
            files = sorted(
                os.path.relpath(os.path.join(r, n), staging)
                for r, _d, ns in os.walk(staging)
                for n in ns
                if n.endswith(".parquet")
            )
            version = self._next_version()
            # Per-file column stats (Iceberg manifest / Delta stats-JSON
            # analogue). Carried files inherit their stats from the parent
            # manifest — zero IO; freshly written files cost one footer
            # read each (file-count scale, not data scale).
            parent_stats = (
                self._meta(expect).get("stats", {}) if expect else {}
            )
            carried_set = set(carry_files or {})
            stats = {}
            for rel in files:
                if rel in carried_set and rel in parent_stats:
                    stats[rel] = parent_stats[rel]
                else:
                    stats[rel] = _file_column_stats(os.path.join(staging, rel))
            meta = {
                "version": version,
                "parent": expect,
                "operation": operation,
                "partition_by": partition_by or [],
                "schema": df.schema.jsonValue(),
                "committed_at_unix": time.time(),
                # per-file manifest: what this snapshot is made of, and how
                # much of it was carried by reference vs freshly written
                "files": files,
                # per-file column min/max/null stats for scan-time skipping
                "stats": stats,
                # which of those were carried by reference — the complement
                # (freshly written files) is what incremental readers consume
                "carried": sorted(carry_files or {}),
                "n_files_carried": len(carry_files or {}),
                "n_files_written": len(files) - len(carry_files or {}),
            }
            with open(os.path.join(staging, "_meta.json"), "w") as f:
                json.dump(meta, f)
                f.flush()
                os.fsync(f.fileno())
            data = os.path.join(self.root, _VERSIONS, version)
            try:
                os.rename(staging, data)
            except OSError as e:
                raise ConcurrentCommitError(
                    f"version slot {version} taken by a concurrent writer"
                ) from e
            renamed = True
            self._swap_pointer(version, expect)
        except Exception:
            # Losing paths each clean up ONLY what this commit created:
            # the staging dir (no-op once renamed), and — if the rename
            # landed but the pointer swap lost — our still-unreferenced
            # version slot. Never a slot the pointer names.
            shutil.rmtree(staging, ignore_errors=True)
            if renamed and version and self.current_version() != version:
                shutil.rmtree(
                    os.path.join(self.root, _VERSIONS, version),
                    ignore_errors=True,
                )
            raise
        return version

    def merge_upsert(
        self, spark: SparkSession, updates: DataFrame, keys: list[str]
    ) -> str:
        """SCD1 MERGE, file-granular: rewrite ONLY the files that contain a
        matched key; every other file carries into the new snapshot by
        reference (hard link — no data copy, no re-shuffle).

        Delta Lake's MERGE algorithm on a plain-parquet snapshot store:

          1. semi-join target x update-keys over ``input_file_name()`` ->
             the distinct set of touched files (a metadata-scale collect,
             like Delta's matched-file listing — file count, not row count);
          2. re-read just those files, anti-join the update keys -> kept
             rows;
          3. write kept + updates (inheriting the partition spec), link
             every untouched file unchanged.

        At 100 TB an upsert matching 0.1% of keys rewrites ~0.1% of files
        instead of the whole table. Readers see the pre-merge snapshot
        until the pointer swap, then the post-merge one — never a mixture.
        """
        expect = self.current_version()
        if expect is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        data_root = os.path.join(self.root, _VERSIONS, expect)
        target = self.read(spark)
        update_keys = updates.select(*keys).distinct()
        touched = sorted(
            _local_path(r["_f"])
            for r in target.withColumn("_f", F.input_file_name())
            .join(update_keys, keys, "leftsemi")
            .select("_f")
            .distinct()
            .collect()
        )
        touched_set = set(touched)
        carry = {
            os.path.relpath(os.path.join(r, n), data_root): os.path.join(r, n)
            for r, _d, ns in os.walk(data_root)
            for n in ns
            if n.endswith(".parquet")
            and os.path.join(r, n) not in touched_set
        }
        if touched:
            kept = (
                spark.read.option("basePath", data_root)
                .parquet(*touched)
                .join(update_keys, keys, "left_anti")
            )
            merged = kept.unionByName(updates.select(*target.columns))
        else:
            # pure insert: nothing matched, carry every existing file
            merged = updates.select(*target.columns)
        return self.commit(merged, operation="merge_upsert", carry_files=carry)

    def overwrite_partitions(
        self,
        spark: SparkSession,
        df: DataFrame,
        partition_by: list[str] | None = None,
        sort_within: list[str] | None = None,
    ) -> str:
        """Dynamic-partition-overwrite as a snapshot commit: replace ONLY
        the partitions present in ``df``; every other file carries into the
        new snapshot by reference (hard link, no rewrite).

        The idempotent-hourly-reload semantics of
        ``partitionOverwriteMode=dynamic``, but atomic: a reader concurrent
        with the reload resolves either the whole old snapshot or the whole
        new one. The touched-partition set is read off the STAGING output
        after the write (the partition dirs ``df`` actually produced), so
        ``df``'s plan runs exactly once — important for callers whose
        metrics ``observe()`` rides the write job.
        """
        expect = self.current_version()
        if expect is None:
            return self.commit(
                df, partition_by=partition_by, sort_within=sort_within,
                operation="overwrite_partitions",
            )
        if partition_by is None:
            partition_by = self._meta(expect).get("partition_by") or None
        if not partition_by:
            # unpartitioned table: partition-overwrite degenerates to overwrite
            return self.commit(
                df, sort_within=sort_within, operation="overwrite"
            )
        data_root = os.path.join(self.root, _VERSIONS, expect)
        depth = len(partition_by)

        def resolver(staging: str) -> dict[str, str]:
            staged_parts = {
                tuple(os.path.relpath(r, staging).split(os.sep)[:depth])
                for r, _d, ns in os.walk(staging)
                for n in ns
                if n.endswith(".parquet")
            }
            return {
                rel: os.path.join(r, n)
                for r, _d, ns in os.walk(data_root)
                for n in ns
                if n.endswith(".parquet")
                and (rel := os.path.relpath(os.path.join(r, n), data_root))
                and tuple(rel.split(os.sep)[:depth]) not in staged_parts
            }

        return self.commit(
            df,
            partition_by=list(partition_by),
            sort_within=sort_within,
            operation="overwrite_partitions",
            carry_resolver=resolver,
        )

    def append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        sort_within: list[str] | None = None,
    ) -> str:
        """Atomic append: carry EVERY existing file by reference, add the
        new rows' files alongside. No read, no rewrite of existing data."""
        expect = self.current_version()
        if expect is None:
            return self.commit(
                df, partition_by=partition_by, sort_within=sort_within,
                operation="append",
            )
        data_root = os.path.join(self.root, _VERSIONS, expect)
        carry = {
            os.path.relpath(os.path.join(r, n), data_root): os.path.join(r, n)
            for r, _d, ns in os.walk(data_root)
            for n in ns
            if n.endswith(".parquet")
        }
        return self.commit(
            df, partition_by=partition_by, sort_within=sort_within,
            operation="append", carry_files=carry,
        )

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        small_file_bytes: int | None = None,
        sort_within: list[str] | None = None,
    ) -> str:
        """File-granular small-file compaction (Delta OPTIMIZE semantics):
        within each partition, bin-pack only the files smaller than
        ``small_file_bytes`` into ~``target_file_bytes`` outputs; every
        already-right-sized file — and every untouched partition — carries
        into the new snapshot by reference. Same rows, fewer files, same
        partition spec, published atomically like any commit.

        A streaming/hourly ingest leaves thousands of tiny files per
        partition; rewriting the WHOLE table to fix that (the naive
        ``coalesce`` compact) costs a full-table IO pass. Here the rewrite
        IO is proportional to the small-file bytes only — at 100 TB that is
        the difference between a maintenance job and a migration. Returns
        the current version unchanged when there is nothing to compact, so
        schedulers can call it idempotently.

        Each partition's small files become their own union branch with an
        exact per-partition ``coalesce`` — per-partition bin-packing that a
        single global repartition cannot express. Partition count bounds
        the plan width; a real deployment runs one job per partition group
        (as Delta's OPTIMIZE does), which this layout maps onto directly.
        """
        expect = self.current_version()
        if expect is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        if small_file_bytes is None:
            small_file_bytes = target_file_bytes // 2
        partition_by = self._meta(expect).get("partition_by") or []
        depth = len(partition_by)
        data_root = os.path.join(self.root, _VERSIONS, expect)
        by_part: dict[tuple, list[str]] = {}
        for r, _d, ns in os.walk(data_root):
            for n in ns:
                if n.endswith(".parquet"):
                    path = os.path.join(r, n)
                    rel = os.path.relpath(path, data_root)
                    part = tuple(rel.split(os.sep)[:depth]) if depth else ()
                    by_part.setdefault(part, []).append(path)
        rewrite: list[tuple[list[str], int]] = []
        carry: dict[str, str] = {}
        for files in by_part.values():
            small = [f for f in files if os.path.getsize(f) < small_file_bytes]
            keep = files if len(small) < 2 else [f for f in files if f not in set(small)]
            for f in keep:
                carry[os.path.relpath(f, data_root)] = f
            if len(small) >= 2:
                size = sum(os.path.getsize(f) for f in small)
                rewrite.append((small, max(1, -(-size // target_file_bytes))))
        if not rewrite:
            return expect
        branches = [
            spark.read.option("basePath", data_root).parquet(*fs).coalesce(bins)
            for fs, bins in rewrite
        ]
        df = branches[0]
        for b in branches[1:]:
            df = df.unionByName(b)
        # union and sortWithinPartitions are both narrow, so each branch's
        # coalesce partitioning — and with it the per-partition bin count —
        # survives through commit()'s write untouched
        return self.commit(
            df, sort_within=sort_within, operation="compact", carry_files=carry
        )

    def changed_files(
        self, since: str | None, until: str | None = None
    ) -> dict[str, list[str]]:
        """Per-version absolute paths of files FRESHLY WRITTEN in each
        snapshot after ``since`` up to ``until`` (default: the live
        version). Carried (hard-linked) files are excluded — they hold only
        rows an earlier snapshot already exposed."""
        until = until or self.current_version()
        if until is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        lo = int(since[1:]) if since else 0
        hi = int(until[1:])
        out: dict[str, list[str]] = {}
        for meta in self.history():
            v = meta["version"]
            if lo < int(v[1:]) <= hi:
                root = os.path.join(self.root, _VERSIONS, v)
                carried = set(meta.get("carried", []))
                out[v] = [
                    os.path.join(root, rel)
                    for rel in meta["files"]
                    if rel not in carried
                ]
        return out

    def read_changes(
        self, spark: SparkSession, since: str | None, until: str | None = None
    ) -> DataFrame:
        """Incremental consumption: rows added between two snapshots —
        the files each version wrote, skipping everything carried by
        reference. One manifest diff, zero data rewritten, IO proportional
        to the change, not the table: the feed a downstream incremental
        aggregate / materialized view reads instead of re-scanning 100 TB.

        Granularity contract (file-level, like Delta CDF without a change
        log): for ``append`` this is EXACT row-level changes. For
        ``merge_upsert`` / ``compact`` / ``overwrite_partitions`` the
        rewritten files also re-expose unchanged rows that shared a file
        with a change — consumers keyed on a primary key upsert these
        idempotently (the standard file-grain CDC contract). ``compact`` in
        particular adds no new rows, only re-homes them.

        Reads resolve snapshot directories that ``vacuum`` may later
        remove — consume changes before vacuuming past them.
        """
        per_version = self.changed_files(since, until)
        branches = [
            spark.read.option(
                "basePath", os.path.join(self.root, _VERSIONS, v)
            ).parquet(*paths)
            for v, paths in per_version.items()
            if paths
        ]
        if not branches:
            schema = spark.createDataFrame(
                [], self.read(spark, until or self.current_version()).schema
            )
            return schema
        df = branches[0]
        for b in branches[1:]:
            df = df.unionByName(b)
        return df

    def vacuum(self, keep: int = 2) -> list[str]:
        """Drop all but the newest ``keep`` snapshots (never the live one).

        Run only after in-flight readers of old snapshots are done — the
        same contract as Delta VACUUM's retention window.
        """
        vdir = os.path.join(self.root, _VERSIONS)
        versions = sorted(v for v in os.listdir(vdir) if v.startswith("v"))
        live = self.current_version()
        removed = []
        for v in versions[: max(0, len(versions) - keep)]:
            if v != live:
                shutil.rmtree(os.path.join(vdir, v), ignore_errors=True)
                removed.append(v)
        return removed
