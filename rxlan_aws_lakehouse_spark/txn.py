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

from pyspark.sql import DataFrame, SparkSession

_VERSIONS = "_versions"
_LATEST = "_LATEST"


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
        cur = self.current_version()
        n = int(cur[1:]) + 1 if cur else 1
        return f"v{n:08d}"

    # -- metadata ---------------------------------------------------------
    def _meta(self, version: str) -> dict:
        with open(os.path.join(self.root, _VERSIONS, version, "_meta.json")) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        vdir = os.path.join(self.root, _VERSIONS)
        out = []
        for v in sorted(os.listdir(vdir)):
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
    ) -> str:
        """Write ``df`` as a complete new snapshot and atomically publish it.

        ``partition_by`` defaults to the previous snapshot's spec, so the
        physical layout survives rewrites without every caller restating it.
        """
        expect = self.current_version()
        if partition_by is None and expect is not None:
            partition_by = self._meta(expect).get("partition_by") or None
        version = self._next_version()
        data = os.path.join(self.root, _VERSIONS, version)
        out = df.sortWithinPartitions(*sort_within) if sort_within else df
        writer = out.write.mode("error").format("parquet")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        try:
            writer.save(data)
            meta = {
                "version": version,
                "parent": expect,
                "operation": operation,
                "partition_by": partition_by or [],
                "schema": df.schema.jsonValue(),
                "committed_at_unix": time.time(),
            }
            with open(os.path.join(data, "_meta.json"), "w") as f:
                json.dump(meta, f)
                f.flush()
                os.fsync(f.fileno())
            self._swap_pointer(version, expect)
        except Exception:
            # A failed commit leaves only an unreferenced version dir; the
            # pointer still names the intact parent snapshot. Clean up and
            # re-raise so retries start from a consistent state.
            shutil.rmtree(data, ignore_errors=True)
            raise
        return version

    def merge_upsert(
        self, spark: SparkSession, updates: DataFrame, keys: list[str]
    ) -> str:
        """SCD1 MERGE: replace rows matching ``keys``, append the rest.

        Anti-join against the update keys (no broadcast hint — an upsert
        batch is unbounded in general; AQE broadcasts it while it fits),
        union, commit as a new snapshot with the inherited partition spec.
        Readers see the pre-merge snapshot until the pointer swap, then the
        post-merge one — never a mixture.
        """
        target = self.read(spark)
        update_keys = updates.select(*keys).distinct()
        kept = target.join(update_keys, keys, "left_anti")
        merged = kept.unionByName(updates.select(*target.columns))
        return self.commit(merged, operation="merge_upsert")

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_within: list[str] | None = None,
    ) -> str:
        """Small-file compaction as a snapshot rewrite: same rows, fewer
        files, same partition spec — published atomically like any commit."""
        cur = self.current_version()
        data_dir = os.path.join(self.root, _VERSIONS, cur or "")
        size = sum(
            os.path.getsize(os.path.join(r, n))
            for r, _d, ns in os.walk(data_dir)
            for n in ns
            if n.endswith(".parquet")
        )
        n_files = max(1, -(-size // target_file_bytes))
        df = self.read(spark).coalesce(n_files)
        return self.commit(df, sort_within=sort_within, operation="compact")

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
