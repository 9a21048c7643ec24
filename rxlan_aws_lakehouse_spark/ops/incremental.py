"""Incremental materialized aggregates off the TxnTable change feed.

The reference refreshes its warehouse by re-running the whole hourly load
(/root/reference/README.md:217-219 — "each run is fast and idempotent"
because the table is small). At 100 TB a rollup that re-scans its source
per refresh is a migration, not a maintenance job. This operator maintains
a grouped-aggregate table from a source ``TxnTable`` by consuming the
file-level change feed: each refresh reads ONLY the files appended since
its cursor, aggregates the delta, and file-granularly merges the combined
partials into the aggregate table.

Exactly-once without a transaction log: the source cursor commits INSIDE
the aggregate table's snapshot manifest (``extra_meta``), so state and
cursor can never disagree — a crash between "aggregated the delta" and
"remembered the cursor" is impossible, the same offsets-in-the-sink trick
Structured Streaming's exactly-once file sinks use.

Contract: the incremental path is EXACT for append-only source commits
(``append`` / the initial ``overwrite``), because the feed is row-exact
there. Any other source operation in the cursor range (``merge_upsert``,
``compact``, ``overwrite_partitions``) re-exposes carried-file rows at
file grain, so ``refresh`` detects it from the commit lineage and falls
back to a FULL recompute — correct for every history, incremental for the
common append-only one. Aggregates are the decomposable ones (count/sum,
and anything derivable from them downstream, e.g. avg = sum/count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..txn import TxnTable

# Only plain appends ADD rows without replacing any: every other
# operation (overwrite, overwrite_partitions, merge_upsert, compact)
# rewrites rows the aggregate may already have folded in. The genesis
# commit is exempt when the cursor is None — whatever wrote it, every row
# it exposed is new to the aggregate.
_APPEND_OPS = {"append"}


class IncrementalAggregate:
    """Maintain ``target`` = SELECT group_cols, count(*), sum(c)... FROM source.

    Group columns must be non-null (the merge keys of the aggregate table —
    the standard materialized-view key constraint); bucket nulls upstream
    with coalesce if the domain needs them.
    """

    def __init__(
        self,
        source: TxnTable,
        target_root: str,
        group_cols: list[str],
        sum_cols: list[str],
        min_cols: list[str] | None = None,
        max_cols: list[str] | None = None,
        transform=None,
    ):
        self.source = source
        self.target = TxnTable(target_root)
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        # min/max are decomposable under appends too: min(old, delta).
        # (avg/stddev derive downstream from sum+count; true holistic
        # aggregates — medians, distinct counts — need the full-recompute
        # path or a mergeable sketch.)
        self.min_cols = list(min_cols or [])
        self.max_cols = list(max_cols or [])
        # Optional Callable[[DataFrame], DataFrame] applied to every
        # source slice BEFORE aggregation (round 8): must be ROW-LOCAL —
        # each input row's contribution independent of other rows
        # (projection, filter, derived columns, broadcast-dim
        # enrichment), the condition under which transform-then-aggregate
        # distributes over deltas. This is what makes incremental
        # JOIN+aggregate views expressible: dView = agg(dFact ⋈ dim)
        # merged into the rollup, with the dim held fixed between
        # refreshes (a changed dim = rewrite history -> the
        # full-recompute path picks it up on the next non-append refresh,
        # or call refresh after recommitting the source).
        self.transform = transform

    # -- state ------------------------------------------------------------
    def cursor(self) -> str | None:
        """Latest source cursor in the aggregate's lineage.

        Walks newest-first so maintenance commits on the aggregate table
        (compact / repartition / z-order — row-preserving by contract)
        don't orphan the cursor their parent recorded. Only refresh()
        advances it.
        """
        if self.target.current_version() is None:
            return None
        for meta in reversed(self.target.history()):
            c = meta.get("extra", {}).get("source_cursor")
            if c:
                return c
        return None

    def _aggregate(self, df: DataFrame) -> DataFrame:
        if self.transform is not None:
            df = self.transform(df)
        return df.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(c).alias(f"sum_{c}") for c in self.sum_cols],
            *[F.min(c).alias(f"min_{c}") for c in self.min_cols],
            *[F.max(c).alias(f"max_{c}") for c in self.max_cols],
        )

    def _range_is_append_only(self, since: str | None, until: str) -> bool:
        lo = int(since[1:]) if since else 0
        hi = int(until[1:])
        for meta in self.source.history():
            n = int(meta["version"][1:])
            if lo < n <= hi:
                op = meta["operation"]
                # the genesis commit (whatever wrote it) is fine when the
                # cursor is None: everything it exposed is "new rows"
                if op not in _APPEND_OPS and not (since is None and n == lo + 1):
                    return False
        return True

    # -- refresh ----------------------------------------------------------
    def refresh(self, spark: SparkSession) -> str | None:
        """Fold source changes since the cursor into the aggregate table.

        Returns the new aggregate version, or None when already current.
        Idempotent: re-running without new source commits is a no-op (the
        cursor check), and a crashed refresh leaves cursor+state at the
        previous snapshot together.
        """
        head = self.source.current_version()
        if head is None or head == self.cursor():
            return None
        since = self.cursor()
        meta = {"source_cursor": head}
        if not self._range_is_append_only(since, head):
            # non-append history: the feed is file-grain, not row-exact —
            # recompute from the source snapshot (still one scan, and only
            # when someone rewrote history under the rollup)
            full = self._aggregate(self.source.read(spark, head))
            return self.target.commit(
                full, operation="incremental_full", extra_meta=meta
            )
        delta = self._aggregate(
            self.source.read_changes(spark, since, head)
        )
        if self.target.current_version() is None:
            return self.target.commit(
                delta, operation="incremental_init", extra_meta=meta
            )
        # combine partials for ONLY the delta's groups, then file-granular
        # merge: groups untouched by the delta carry by reference
        current = self.target.read(spark)
        combined = (
            current.join(
                F.broadcast(delta.select(*self.group_cols)),
                self.group_cols,
                "leftsemi",
            )
            .unionByName(delta)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[
                    F.sum(f"sum_{c}").alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
                *[
                    F.min(f"min_{c}").alias(f"min_{c}")
                    for c in self.min_cols
                ],
                *[
                    F.max(f"max_{c}").alias(f"max_{c}")
                    for c in self.max_cols
                ],
            )
        )
        return self.target.merge_upsert(
            spark, combined, keys=self.group_cols, extra_meta=meta,
            # combined is a groupBy on exactly the merge keys: unique by
            # construction, so skip the duplicate-key validation job
            validate_keys=False,
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return self.target.read(spark)
