"""Mergeable HyperLogLog sketch rollups: per-partition distinct sketches
that persist as binary columns and merge on read.

The 100 TB pattern this enables: computing ``COUNT(DISTINCT user)`` over
an arbitrary date range normally rescans every underlying event row. With
a sketch rollup, each ingest partition (day/month) stores ONE ~2.5 KB
Datasketches-HLL binary alongside its row data; any later range query
unions the handful of matching sketches — bytes proportional to the
number of partitions, not the number of events — and reads the estimate
off the union. New partitions merge into existing unions without
touching historical data, which is what makes the aggregate
*incrementally maintainable* (the property ``ops/incremental.py`` gives
exact SUM/COUNT, extended here to DISTINCT via an approximate-but-
mergeable state).

Everything stays JVM-side: ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` are built-in Spark aggregates (Apache
DataSketches under the hood), so the sketch build is a single partial-agg
shuffle of sketch bytes — never raw keys — and the merge is a tiny
all-to-one union over one row per partition.

Reference parity: the reference's Redshift layer answers distinct-user
questions by full rescan (`init.sql` COUNT(DISTINCT) queries); this
module is the scale path that replaces those rescans with stored state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Datasketches lgConfigK: 2^12 registers -> ~1.6% relative standard
# error, ~2.5 KB per serialized sketch. Good default for billions of
# keys; callers needing <1% error pass a larger value at BUILD time
# (sketches only union at matching-or-smaller lgK).
DEFAULT_LGK = 12


def partition_sketches(
    df: DataFrame,
    key_col: str,
    part_cols: list[str],
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One row per partition: the partition columns, an HLL sketch of
    ``key_col`` (binary, parquet-storable), and the partition's exact
    row count. Map-side partial aggregation means each input partition
    contributes one ~2.5 KB partial sketch to the shuffle, regardless of
    row count — the build is a scan plus a sketch-bytes-only exchange."""
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merged_estimate(
    sketch_df: DataFrame, sketch_col: str = "sketch"
) -> DataFrame:
    """Union every sketch row into one and read the distinct estimate.
    Input is one row per partition (already tiny); the union is an
    all-to-one aggregate over sketch bytes. Returns a single row
    ``(estimate BIGINT)``."""
    return sketch_df.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias("estimate")
    )


def rollup_estimates(
    sketch_df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate stored partition sketches to a coarser grain (e.g.
    daily sketches -> monthly distincts) WITHOUT revisiting the raw
    rows: group the sketch rows, union within each group, estimate."""
    return sketch_df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias("estimate"),
        F.sum("n_rows").alias("n_rows"),
    )


def merge_new_partition(
    stored: DataFrame, fresh: DataFrame
) -> DataFrame:
    """Incremental maintenance: append a freshly-built partition sketch
    set to the stored one. Union-by-name of the tiny sketch tables —
    historical partitions are neither read nor rewritten."""
    return stored.unionByName(fresh)
