"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join handling (on in session.py) covers sort-merge joins at
runtime, but two shapes still need explicit salting at 100 TB:

  * single-hot-key aggregation — one reducer receives the whole key. The
    two-phase salted aggregate splits the hot key across `salt_buckets`
    reducers, then merges: shuffle 1 carries (key, salt) partials, shuffle 2
    carries |keys| rows.
  * skewed fact x small-but-not-broadcastable dim — replicate the dim side
    per salt bucket; the fact side salts randomly. Replication factor =
    salt_buckets, so size the bucket count to the skew, not to parallelism.

Both helpers are deterministic-output (the salt only affects partitioning,
never values), so they compose with the oracle-checked query surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def with_salt(df: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS, col_name: str = "__salt") -> DataFrame:
    """Random salt in [0, salt_buckets). Random is correct here: the salt
    never reaches results, it only spreads rows across reducers."""
    return df.withColumn(col_name, (F.rand(seed=42) * salt_buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase aggregate for skewed keys.

    ``aggs`` maps output name -> ("sum"|"count"|"min"|"max", input column).
    Phase 1 aggregates per (keys, salt); phase 2 merges partials per keys
    (count partials merge with sum). Only decomposable aggregates are
    supported — exactly the ones that partial-aggregate at scale anyway.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_aggs = []
    phase2_aggs = []
    for name, (fn, col) in aggs.items():
        if fn not in fns:
            raise ValueError(f"non-decomposable aggregate for {name!r}: {fn}")
        phase1_aggs.append(fns[fn](col).alias(f"__p_{name}"))
        phase2_aggs.append(merge[fn](f"__p_{name}").alias(name))
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*group_cols, "__salt").agg(*phase1_aggs)
    return partial.groupBy(*group_cols).agg(*phase2_aggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``small`` is modest but
    above the broadcast threshold: salt the skewed side, replicate the small
    side across every salt value, join on (keys + salt).

    Only join types that never emit unmatched SMALL-side rows are legal:
    a replicated small side would emit its unmatched rows once per salt
    bucket under right/full joins.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, not {how!r}: the "
            "replicated small side would duplicate unmatched rows"
        )
    on = list(on)
    s = with_salt(skewed, salt_buckets)
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = s.join(replicated, [*on, "__salt"], how)
    return out.drop("__salt")
