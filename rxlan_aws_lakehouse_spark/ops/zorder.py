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


APPROX_BITS = 6


def quantile_normalize(
    df: DataFrame,
    col: str,
    bits: int = APPROX_BITS,
    relative_error: float = 0.001,
) -> Column:
    """SCALE path for ``rank_normalize``: approxQuantile bucket boundaries
    (one Greenwald-Khanna pass, deterministic, driver gets 2^bits-1
    doubles) embedded as an array literal, bucket index via a HOF count
    of boundaries <= value — no window, no single-reducer global sort.
    The exact path's ``Window.orderBy`` funnels EVERY row through one
    task at rank time; this replaces it with a broadcast-free scan-side
    expression, which is what survives 100 TB.

    ``bits=6`` (64 buckets/dimension) is deliberate: clustering quality
    needs only ~n_files^(1/d) distinct tiles per dimension, so 64 covers
    any realistic file count; duplicate boundaries from skewed data
    collapse to fewer distinct buckets, which is safe (coarser tiles,
    never wrong ones)."""
    return quantile_normalize_multi(df, [col], bits, relative_error)[0]


def quantile_normalize_multi(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = APPROX_BITS,
    relative_error: float = 0.001,
) -> list[Column]:
    """All dimensions' boundaries from ONE approxQuantile pass (the stat
    API accepts a column list), so an N-dimension z-order costs a single
    extra scan regardless of N."""
    probs = [i / (2**bits) for i in range(1, 2**bits)]
    all_bounds = df.stat.approxQuantile(list(cols), probs, relative_error)
    out = []
    for col, bounds in zip(cols, all_bounds):
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        v = F.col(col).cast("double")
        out.append(F.size(F.filter(arr, lambda b: b <= v)).cast("long"))
    return out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    n_files: int = 8,
    max_records_per_file: int | None = None,
    approx: bool = False,
) -> None:
    """Write ``df`` clustered by the Morton code of ``cols``.

    ``approx=True`` normalizes via ``quantile_normalize`` (no global
    window — the 100 TB path) at ``APPROX_BITS`` per dimension; the
    default exact path keeps full rank resolution for small data."""
    if approx:
        bits = APPROX_BITS
        normed = quantile_normalize_multi(df, cols, bits)
    else:
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
