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


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram sketches: quantiles-over-range from stored
# per-partition state. Unlike GK/KLL (what approx_percentile uses
# internally), a dense equi-width histogram is DETERMINISTIC — the estimate
# is a pure function of the bin counts — so an independent engine (the
# DuckDB oracle) reproduces it bit-for-bit, and merging is an element-wise
# integer sum, associative and commutative regardless of arrival order.
# Cost model at 100 TB: one array<bigint> of n_bins per ingest partition
# (256 bins = 2 KB), merges touch sketch rows only — the same
# bytes-per-partition-not-per-row contract as the HLL rollup above. Error
# is bounded by bin width (values clamp into [lo, hi)); callers pick the
# range from domain knowledge, exactly like a monitoring histogram.
# ---------------------------------------------------------------------------


def histogram_sketches(
    df: DataFrame,
    value_col: str,
    part_cols: list[str],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """One row per partition: the partition columns, a DENSE equi-width
    histogram of ``value_col`` over ``[lo, hi)`` (``array<bigint>`` of
    ``n_bins`` counts; out-of-range values clamp to the edge bins), and
    the partition's exact row count. Build = one partial-agg shuffle of
    (partition, bin) pairs; the dense array is assembled per group with
    built-in HOFs (map lookup over a static bin sequence) — JVM-side
    throughout.

    Clamp observability: edge-bin clamping silently skews tail quantiles
    when the caller-supplied range misses real mass, so each sketch row
    also carries ``clamped_low`` / ``clamped_high`` — how many values
    fell below ``lo`` / at-or-above ``hi``. A monitoring check of
    ``clamped_* / n_rows`` makes a mis-sized range an observable signal
    instead of a silent estimate bias; ``merge_histograms`` sums the
    counts through every rollup."""
    width = (hi - lo) / n_bins
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    sparse = (
        df.select(
            *part_cols,
            bin_col.alias("_bin"),
            (F.col(value_col) < F.lit(lo)).cast("bigint").alias("_cl"),
            (F.col(value_col) >= F.lit(hi)).cast("bigint").alias("_ch"),
        )
        .groupBy(*part_cols, "_bin")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum("_cl").alias("_cl"),
            F.sum("_ch").alias("_ch"),
        )
    )
    # Dense-assembly strategy is bins-dependent. The map-lookup HOF is
    # O(bins²) per sketch row (element_at on a map is a linear scan when
    # interpreted) — cheap at the 256-bin default, a measured 42 s wall
    # at the count-min build's 4096 cells. The spine-join alternative is
    # O(bins log bins) but pays a distinct + join + extra shuffle, which
    # LOSES at small widths with many partitions (measured +15% on the
    # 2,500-day registry lane). Crossover sits around 512.
    #
    # r17: the assembly's input is metadata-scale BYTES but CPU-heavy per
    # row, so AQE's byte-based coalescing squeezed it onto 3 tasks (a
    # measured 1.3 s straggler at 2,500 day-sketches). Pinning the
    # exchange width by the group keys keeps the per-row HOF work spread
    # across the cores (−27% on the sf0.1 build); the groupBy reuses the
    # same hash partitioning, so no second exchange appears.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    if n_bins <= 512:
        return (
            sparse.repartition(n_part, *part_cols)
            .groupBy(*part_cols)
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("_bin", "_c"))
                ).alias("_m"),
                F.sum("_c").alias("n_rows"),
                F.sum("_cl").alias("clamped_low"),
                F.sum("_ch").alias("clamped_high"),
            )
            .select(
                *part_cols,
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_bins - 1)),
                    lambda i: F.coalesce(
                        F.element_at(F.col("_m"), i).cast("bigint"),
                        F.lit(0).cast("bigint"),
                    ),
                ).alias("hist"),
                "n_rows",
                "clamped_low",
                "clamped_high",
            )
        )
    spine = (
        df.select(*part_cols)
        .distinct()
        .select(
            *part_cols,
            F.explode(
                F.sequence(F.lit(0), F.lit(n_bins - 1))
            ).alias("_bin"),
        )
    )
    dense = spine.join(sparse, [*part_cols, "_bin"], "left")
    return dense.repartition(n_part, *part_cols).groupBy(*part_cols).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "_bin",
                        F.coalesce(F.col("_c"), F.lit(0))
                        .cast("bigint")
                        .alias("_c"),
                    )
                )
            ),
            lambda s: s["_c"],
        ).alias("hist"),
        F.sum(F.coalesce(F.col("_c"), F.lit(0))).alias("n_rows"),
        F.sum(F.coalesce(F.col("_cl"), F.lit(0))).alias("clamped_low"),
        F.sum(F.coalesce(F.col("_ch"), F.lit(0))).alias("clamped_high"),
    )


def merge_histograms(
    sketch_df: DataFrame,
    group_cols: list[str],
    hist_col: str = "hist",
) -> DataFrame:
    """Re-aggregate stored partition histograms to a coarser grain (or
    pass ``group_cols=[]``-style constant for a global merge): element-
    wise sum of the count arrays via ``aggregate``/``zip_with`` — sketch
    rows in, one sketch row per group out, raw data never touched.
    ``clamped_low`` / ``clamped_high`` counts sum through the merge when
    present (sketch tables stored before they existed still merge)."""
    merged = F.aggregate(
        F.collect_list(F.col(hist_col)),
        F.lit(None).cast("array<bigint>"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.zip_with(acc, x, lambda a, b: a + b)
        ),
    )
    aggs = [merged.alias(hist_col), F.sum("n_rows").alias("n_rows")]
    for c in ("clamped_low", "clamped_high"):
        if c in sketch_df.columns:
            aggs.append(F.sum(c).alias(c))
    return sketch_df.groupBy(*group_cols).agg(*aggs)


def histogram_quantile(
    hist_col: str,
    q: float,
    lo: float,
    hi: float,
    n_bins: int = 256,
):
    """Interpolated quantile read off a (merged) histogram — a Column.

    The estimate is the classic Prometheus/HDR read: walk bins until the
    cumulative count reaches ``q * n``, then interpolate linearly inside
    the crossing bin::

        est = lo + width * (bin + (target - cum_before) / c_bin)

    Implemented as ONE ``aggregate`` fold over the bin array (struct
    accumulator carrying cum count + found estimate) — no explode, no
    shuffle, pure integer/double arithmetic an oracle reproduces exactly.
    The crossing bin always has ``c_bin >= 1`` (cum stays short of the
    target until a non-empty bin crosses it), so the division is safe.

    Evaluation-cost note: the entry array and the q*n target are PACKED
    into a one-element array and consumed through a ``transform`` lambda,
    making them lambda VARIABLES inside the fold. Captured outer
    expressions in a higher-order function are re-evaluated per element
    (and project-collapse inlines any staging columns right back), so a
    naively captured target — itself a fold over the array — turns the
    walk O(n_bins²) interpreted; as a lambda variable it is evaluated
    once per row."""
    width = (hi - lo) / n_bins
    h = F.col(hist_col)
    total = F.aggregate(
        h, F.lit(0).cast("bigint"), lambda a, x: a + x
    ).cast("double")
    entries = F.zip_with(
        h,
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda c, i: F.struct(c.alias("c"), i.alias("i")),
    )
    packed = F.array(
        F.struct(
            entries.alias("en"),
            (F.lit(float(q)) * total).alias("tg"),
        )
    )

    def walk(x):
        init = F.struct(
            F.lit(0).cast("bigint").alias("cum"),
            F.lit(None).cast("double").alias("est"),
        )
        fold = F.aggregate(
            x["en"],
            init,
            lambda acc, e: F.when(acc["est"].isNotNull(), acc).otherwise(
                F.when(
                    (acc["cum"] + e["c"]).cast("double") >= x["tg"],
                    F.struct(
                        (acc["cum"] + e["c"]).alias("cum"),
                        (
                            F.lit(lo)
                            + F.lit(width)
                            * (
                                e["i"].cast("double")
                                + (x["tg"] - acc["cum"].cast("double"))
                                / e["c"].cast("double")
                            )
                        ).alias("est"),
                    ),
                ).otherwise(
                    F.struct(
                        (acc["cum"] + e["c"]).alias("cum"),
                        F.lit(None).cast("double").alias("est"),
                    )
                )
            ),
        )
        return fold["est"]

    return F.transform(packed, walk)[0]


# ---------------------------------------------------------------------------
# Mergeable count-min sketches: heavy-hitter frequency estimates over range
# from stored per-partition state. Same contract as the histogram sketches:
# DETERMINISTIC (cell values are plain bucket sums under md5-derived hash
# functions, so an independent engine reproduces the estimate exactly, and
# the classic CM guarantee est >= true / est <= true + eps*N is checkable),
# MERGEABLE (element-wise integer sum — merge_histograms works verbatim on
# the flattened cell array), and bytes ∝ partitions (d*w longs each, 32 KB
# at the 4x1024 default), never rows.
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024


def _cm_bucket(key_col, j: int, w: int):
    """Hash row j's bucket for a key: Kirsch-Mitzenmacher double hashing
    ``(h1 + j*h2) mod w`` with h1/h2 read off the two halves of ONE md5
    digest. One md5 per key serves all d rows — the naive per-row
    ``md5(key#j)`` scheme computes d digests with DISTINCT inputs, which
    defeats codegen common-subexpression elimination and measured 3x
    slower on the sf0.1 build. Engine-reproducible: both halves use the
    same '0x'-prefixed 15-hex-digit parse DuckDB mirrors; h1 + 3*h2 <
    2^62, no overflow."""
    m = F.md5(key_col.cast("string"))
    h1 = F.conv(F.substring(m, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(m, 17, 15), 16, 10).cast("long")
    return (h1 + F.lit(j) * h2) % F.lit(w)


def countmin_sketches(
    df: DataFrame,
    key_col: str,
    part_cols: list[str],
    d: int = CM_DEPTH,
    w: int = CM_WIDTH,
) -> DataFrame:
    """One row per partition: the partition columns, a flattened
    ``array<bigint>`` of ``d*w`` count-min cells (row j occupies
    ``[j*w, (j+1)*w)``), and the exact row count. Build = one
    partial-agg shuffle of (partition, cell) pairs — d rows per input
    row, then the same dense-array assembly as the histogram build."""
    # STAGE the two digest halves as columns before the explode: the
    # d bucket expressions inside one Generate input do not share
    # subexpressions (measured: inline hashing costs 2.2x the staged
    # form on the sf0.1 build — the same stage-the-expensive-subtree
    # rule as ops/dedup.word_shingles_from).
    m = F.md5(F.col(key_col).cast("string"))
    staged = df.select(
        *part_cols,
        F.conv(F.substring(m, 1, 15), 16, 10).cast("long").alias("_h1"),
        F.conv(F.substring(m, 17, 15), 16, 10).cast("long").alias("_h2"),
    )
    cell = F.explode(
        F.array(
            *[
                (
                    F.lit(j * w)
                    + (F.col("_h1") + F.lit(j) * F.col("_h2")) % F.lit(w)
                ).cast("int")
                for j in range(d)
            ]
        )
    )
    sparse = (
        staged.select(*part_cols, cell.alias("_cell"))
        .groupBy(*part_cols, "_cell")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # Dense assembly via a cell SPINE + sort, NOT a per-element map
    # lookup: element_at on a map is a linear scan in interpreted HOFs,
    # so the histogram-style map assembly is O(cells²) per sketch row —
    # at 4096 cells that was measured at ~40 s for an sf0.1 build (the
    # same pathology class as the r8 histogram_quantile capture bug).
    # Here: explode the full cell range once per partition (d*w rows,
    # metadata-scale), left-join the sparse counts, and collect sorted —
    # O(cells log cells) per row, one extra key shuffle of spine rows.
    spine = (
        df.select(*part_cols)
        .distinct()
        .select(
            *part_cols,
            F.explode(
                F.sequence(F.lit(0), F.lit(d * w - 1))
            ).alias("_cell"),
        )
    )
    # r17: same CPU-vs-bytes pin as the histogram assembly — AQE's
    # byte-based coalescing under-parallelizes the d*w-cell collect+sort.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    dense = spine.join(sparse, [*part_cols, "_cell"], "left")
    return dense.repartition(n_part, *part_cols).groupBy(*part_cols).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "_cell",
                        F.coalesce(F.col("_c"), F.lit(0))
                        .cast("bigint")
                        .alias("_c"),
                    )
                )
            ),
            lambda s: s["_c"],
        ).alias("cm"),
        (
            F.sum(F.coalesce(F.col("_c"), F.lit(0))) / F.lit(d)
        ).cast("bigint").alias("n_rows"),
    )


def countmin_estimate(
    cm_col: str, key_col, d: int = CM_DEPTH, w: int = CM_WIDTH
):
    """Frequency estimate for ``key_col`` read off a (merged) count-min
    row: min over hash rows of the key's cell — a Column. Classic CM
    guarantee: never under the true count."""
    h = F.col(cm_col)
    ests = [
        F.element_at(
            h, (F.lit(j * w) + _cm_bucket(key_col, j, w)).cast("int") + 1
        )
        for j in range(d)
    ]
    return F.least(*ests)
