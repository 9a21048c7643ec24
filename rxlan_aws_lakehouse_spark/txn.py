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

import json
import os
import shutil
import time
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSIONS = "_versions"
_LATEST = "_LATEST"


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
