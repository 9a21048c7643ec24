"""As-of (point-in-time) join.

Spark SQL has no native ASOF JOIN (DuckDB/kdb do). The naive formulation —
equi-join on key with a range predicate, then argmax per left row — explodes
to O(|L| x |R|) pairs per key before the aggregate prunes them.

This implementation uses the union + last-value window pattern instead:

    1. tag left rows side=1, right rows side=0
    2. union on (key, ts) with right payload columns null on left rows
    3. window per key ordered by (ts, side): last non-null right payload
       over rowsBetween(unboundedPreceding, currentRow)
    4. keep side=1 rows

Cost: ONE shuffle on the key (the window), linear in |L| + |R| — the same
asymptotics a native as-of join would have. At 100 TB both inputs shuffle
once on the join key and each partition is processed with a single ordered
pass; no pairwise blow-up, no skew amplification beyond the key's own skew.

Ordering `side` ascending puts a right row *before* a left row with the same
timestamp, so the match condition is `right.ts <= left.ts` (inclusive), which
matches DuckDB's ASOF JOIN ... ON r.ts <= l.ts semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[right_ts] <= left[left_ts]``, matching on ``on`` keys.

    Left rows with no prior right row keep NULLs (left-outer semantics).
    ``right_cols`` defaults to every non-key right column (incl. its ts).
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    payload = [f"{c}{suffix}" for c in right_cols]

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(p) for c, p in zip(right_cols, payload)],
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c)
          for c in left.columns],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
    )

    unioned = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
