"""Z-order (Morton) clustering for multi-dimensional data skipping.

A single sort key gives parquet row-group min/max stats that prune on ONE
column; range predicates on a second column scan everything. Interleaving
the bits of rank-normalized columns into one Morton code and sorting by it
clusters rows so that a 2D box predicate touches a small, contiguous set of
files — the same layout trick Delta's OPTIMIZE ZORDER BY applies, built
here from plain column expressions.

Scale shape: rank normalization is one window pass per column (or a
sampled quantile map at real scale), the interleave is pure bit
arithmetic, and the write is a repartitionByRange + sortWithinPartitions
on the z-value — one shuffle, stats-friendly files out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_BITS = 16


def interleave_bits(cols: Sequence[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton code: bit i of column j lands at position i*len(cols)+j.

    Inputs must already be non-negative ints < 2**bits. Result fits in a
    long for len(cols)*bits <= 63.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            z = z + ((F.shiftright(c, i).bitwiseAND(1)).cast("long") * (2 ** (i * n + j)))
    return z


def rank_normalize(df: DataFrame, col: str, bits: int = DEFAULT_BITS) -> Column:
    """Map a column to dense [0, 2**bits) ranks — makes the interleave
    scale-free (raw values with wildly different ranges interleave evenly).

    Window-based exact ranks here; at 100 TB you'd swap in approxQuantile
    bucket boundaries (sampled once, broadcast) to avoid the global window.
    """
    w = Window.orderBy(F.col(col))
    pr = F.percent_rank().over(w)
    return F.least(
        F.floor(pr * (2**bits)).cast("long"), F.lit(2**bits - 1).cast("long")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    n_files: int = 8,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` clustered by the Morton code of ``cols``."""
    normed = [rank_normalize(df, c, bits) for c in cols]
    z = interleave_bits(normed, bits)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
