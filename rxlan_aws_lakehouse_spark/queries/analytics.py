"""Product-analytics pack: funnels, retention cohorts, cumulative reach,
share-of-total, and anomaly scoring over the event stream.

The workloads a gold-layer events table exists to serve. Each composes
already-verified primitives (conditional aggregation, two-phase joins,
windows) into the full query a dashboard would run — one shuffle per
logical stage, counts exact, ratios derived from deterministic inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load, local_df, spread
from ..scratch import mkscratch as _mkscratch


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: each stage must happen at
    or after the previous stage's FIRST occurrence, per user.

    Scale-safe single-exchange shape: the three stage timestamps are
    sequential conditional window-mins over the user partition (each stage's
    predicate reads the previous stage's column), so no per-user aggregate is
    ever joined — let alone broadcast — back against the event stream. All
    three Window nodes share one hash partitioning on user_id, and the
    per-user collapse reuses that same partitioning, so the whole funnel is
    ONE wide shuffle plus the final scalar aggregate.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"),
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention: users grouped by first-seen date, counted per
    day-offset of later activity. The canonical retention triangle."""
    e = load(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    first = days.groupBy("user_id").agg(F.min("d").alias("cohort"))
    return (
        days.join(first, "user_id")
        .select(
            F.col("cohort").cast("string").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user reach per day: first-seen counts + a running
    sum — the exact streaming-friendly form of COUNT(DISTINCT) OVER
    (ORDER BY d), which neither engine supports directly."""
    e = load(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    per_day = first.groupBy("d").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        F.col("d").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


def orders_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total: each nation's revenue share — a grouped aggregate
    ratioed against a window total (one extra exchange of |groups| rows)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    total = Window.partitionBy()
    return per_nation.select(
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(total), 6).alias("share"),
    )


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event z-score against its type's distribution; report the top-20
    outliers. Group stats via one aggregate, broadcast back — the scalable
    alternative to a per-row window over the whole stream."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4).alias("z"),
        )
        .orderBy(F.abs(F.col("z")).desc(), "event_id")
        .limit(20)
    )


def events_trend_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of event values over time, via the built-in
    least-squares AGGREGATES (``regr_slope``/``regr_intercept``/``regr_r2``
    — one hash-agg pass, JVM-side partial aggregation, no per-group
    collect or model fit in Python).

    This is the grouped-model shape ("fit a line per key") that tempts a
    ``applyInPandas`` grouped-map UDF; at 100 TB the aggregate form wins
    outright — it is a single map-side-combinable shuffle with fixed-width
    state (6 moments per group). x is event time in DAYS since a fixed
    epoch (2024-01-01): day-scale x keeps the slope in a magnitude where
    the cross-engine float comparison is stable (slope/r2 rounded at 5
    decimals — their 6th straddles a float rounding boundary at sf0.01).
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    x = (
        F.unix_timestamp("ts").cast("double")
        - F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    ) / 86400.0
    y = F.col("value")
    return (
        e.groupBy("event_type")
        .agg(
            F.regr_count(y, x).alias("n"),
            F.round(F.regr_slope(y, x), 5).alias("slope_per_day"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 5).alias("r2"),
        )
        .orderBy("event_type")
    )


def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (the resample/densify step every metrics
    warehouse needs): hourly event counts per type with EXPLICIT zero
    rows for silent hours. The dense hour spine is generated with
    ``sequence`` over the observed [min, max] span (one tiny aggregate,
    no calendar table), cross-joined to the type dimension (broadcast —
    both sides are metadata-sized), then left-joined to the actual
    hourly counts. At scale the expensive side is the counts aggregate;
    the spine is O(hours x types) and never touches the fact table.
    Output profiles the fill: hours, zero-hours, total per type."""
    e = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    )
    span = e.agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = (
        span.select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h")
        )
        .crossJoin(F.broadcast(e.select("event_type").distinct()))
    )
    hourly = e.groupBy("h", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    dense = spine.join(hourly, ["h", "event_type"], "left").select(
        "h", "event_type", F.coalesce("n", F.lit(0)).alias("n")
    )
    return (
        dense.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.when(F.col("n") == 0, 1).otherwise(0)).alias(
                "n_silent_hours"
            ),
            F.sum("n").alias("n_events"),
            F.round(F.avg("n"), 4).alias("avg_per_hour"),
        )
        .orderBy("event_type")
    )


def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct rollup (round 8): per-day HLL sketches
    of ``user_id`` are built once (``ops/sketches.py``), persisted to
    parquet as binary columns, read back, and every later answer comes
    from the STORED sketches — per-day estimates, a weekly re-rollup at
    a coarser grain, and the 30-day merged union — never a second scan
    of the event rows. At 100 TB this is the only sane shape for
    distinct-over-range: sketch bytes scale with partition count, not
    row count, and new days merge into old unions without touching
    history. Correctness is pinned exactly where an approximate
    structure can be: per-day estimate within 5% of the per-day exact
    (``sketch_ok``), weekly rollup within 5% of the weekly exact
    (``week_rollup_ok``), merged union within 5% of the overall exact
    (``merged_ok``) — booleans the oracle states as TRUE, so estimator
    drift past tolerance hash-fails the gate."""
    import shutil
    import tempfile

    from ..ops import sketches

    e = load(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    work = _mkscratch("hll_rollup_")
    try:
        sketches.partition_sketches(e, "user_id", ["day"]).write.mode(
            "overwrite"
        ).parquet(work)
        stored = spark.read.parquet(work)
        est = sketches.rollup_estimates(stored, ["day"]).select(
            "day", F.col("estimate").alias("est_users")
        )
        merged_est = sketches.merged_estimate(stored).collect()[0][
            "estimate"
        ]
        overall_exact = e.agg(
            F.countDistinct("user_id").alias("n")
        ).collect()[0]["n"]
        merged_ok = abs(merged_est - overall_exact) <= 0.05 * overall_exact
        # coarser-grain re-rollup from the SAME stored daily sketches:
        # weekly distincts without revisiting raw rows
        week = F.weekofyear(F.to_date("day"))
        wk_est = sketches.rollup_estimates(
            stored.withColumn("week", week), ["week"]
        ).select("week", F.col("estimate").alias("est"))
        wk_exact = e.groupBy(
            F.weekofyear(F.to_date("day")).alias("week")
        ).agg(F.countDistinct("user_id").alias("exact"))
        week_rollup_ok = (
            wk_exact.join(wk_est, "week")
            .select(
                F.min(
                    F.abs(F.col("est") - F.col("exact"))
                    <= 0.05 * F.col("exact")
                ).alias("ok")
            )
            .collect()[0]["ok"]
        )
        exact = e.groupBy("day").agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        out = (
            exact.join(est, "day")
            .select(
                "day",
                "exact_users",
                "n_events",
                (
                    F.abs(F.col("est_users") - F.col("exact_users"))
                    <= 0.05 * F.col("exact_users")
                ).alias("sketch_ok"),
                F.lit(bool(week_rollup_ok)).alias("week_rollup_ok"),
                F.lit(bool(merged_ok)).alias("merged_ok"),
            )
            .orderBy("day")
        )
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def sketch_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch rollup (the distribution twin of
    ``sketch_hll_rollup``): per-day dense equi-width histograms of
    ``l_extendedprice`` (256 bins over [0, 120000) — array<bigint>, 2 KB
    per partition) are built once, persisted to parquet, read back, and
    the monthly p50/p95/p99 are read off MERGED stored sketches
    (element-wise bin sums) — the raw rows are scanned exactly once, at
    build time. Unlike GK/KLL, the equi-width estimate is a pure
    function of the bin counts, so the oracle reproduces the interpolated
    values EXACTLY (no tolerance flags): walk to the bin where the
    cumulative count crosses q*n, interpolate linearly inside it. At
    100 TB this answers percentile-over-arbitrary-range from KBs of
    stored state per partition instead of a quantile re-scan."""
    import shutil
    import tempfile

    from ..ops import sketches

    lo, hi, n_bins = 0.0, 120000.0, 256
    # spread(): the bin/groupBy build otherwise runs entirely inside the
    # one scan task a single-row-group file allows (guide §2.5); no-op
    # when the input layout already fills the cores (r17).
    li = spread(
        spark,
        load(spark, sf_dir, "lineitem").select(
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            "l_extendedprice",
        ),
        sf_dir,
        "lineitem",
    )
    work = _mkscratch("hist_rollup_")
    try:
        # 4 files: the sketch table is KBs (one 2 KB row per day) —
        # letting it inherit 32 shuffle partitions wrote 32 near-empty
        # files whose creation/fsync churn made the lane I/O-noise
        # exposed (r12 verdict task 6: +31% with zero code change).
        # repartition(4), NOT coalesce(4) (r17): coalesce collapses the
        # PARENT stage to 4 tasks — it silently serialized the CPU-bound
        # dense-assembly HOFs onto 4 cores (guide §2.4's exchange-reuse
        # coin, flipped). The repartition exchange moves ~2,500 KB-scale
        # rows (free at any scale) and lets the assembly keep the full
        # core-count partitioning pinned in ops/sketches.py.
        sketches.histogram_sketches(
            li, "l_extendedprice", ["day", "month"], lo=lo, hi=hi,
            n_bins=n_bins,
        ).repartition(4).write.mode("overwrite").parquet(work)
        stored = spark.read.parquet(work)
        merged = sketches.merge_histograms(stored, ["month"])
        out = merged.select(
            "month",
            "n_rows",
            # NO rounding: the estimates are exact binary fractions
            # (multiples of width/2^k), so round(x, 4) lands on .xxxx5
            # ties that Spark (half-even on doubles) and DuckDB
            # (half-away) break differently — while the raw interpolated
            # doubles are bit-identical IEEE arithmetic on both engines
            *[
                sketches.histogram_quantile(
                    "hist", q, lo=lo, hi=hi, n_bins=n_bins
                ).alias(f"est_p{int(q * 100)}")
                for q in (0.50, 0.95, 0.99)
            ],
        ).orderBy("month")
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (the financial/metrics resample): per type and
    hour bucket — open (first value), high, low, close (last value),
    volume. First/last are defined under the TOTAL order (ts, event_id)
    so ties at the same second are deterministic on both engines:
    ``min(struct(ts, event_id, value)).value`` is the open — one hash
    aggregate, no window pass over the raw stream, exactly the shape
    that holds when the bucket count is millions and the stream is
    billions of rows."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
        & (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
    )
    key = F.struct("ts", "event_id", F.col("value").alias("v"))
    return (
        e.groupBy(
            "event_type",
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00"
            ).alias("bucket"),
        )
        .agg(
            F.round(F.min(key)["v"], 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max(key)["v"], 2).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .orderBy("event_type", "bucket")
    )


def rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct users per day (the WAU curve): COUNT
    (DISTINCT) over a sliding window, which no engine supports as a
    window function. Scale shape: contribution expansion — each distinct
    (user, day) row contributes to the seven windows it falls in (one
    explode, 7x fanout of already-deduped rows), then one distinct-agg
    per window day. No self-join, no per-day rescan; at 100 TB the
    fanout input is |distinct user-days|, not |events|. Window days past
    the observed range are dropped so every reported day aggregates a
    full (possibly clipped at the start) window."""
    e = load(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    max_d = days.agg(F.max("d").alias("m"))
    out = (
        days.select(
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(6))
            ).alias("i"),
            "d",
        )
        .select("user_id", F.date_add(F.col("d"), F.col("i")).alias("wd"))
        .crossJoin(F.broadcast(max_d))
        .filter(F.col("wd") <= F.col("m"))
        .groupBy(F.col("wd").cast("string").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
        .orderBy("day")
    )
    return out


def sketch_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable COUNT-MIN heavy hitters (round 9, ``ops/sketches.py``):
    per-month count-min sketches (4x1024 cells, md5-derived hash rows)
    over lineitem part keys persist to storage, merge back globally with
    the same element-wise sum the histogram sketches use, and the true
    top-20 keys' frequencies are estimated off the 32 KB merged state
    instead of the rows. The estimate is a PURE FUNCTION of bucket sums,
    so the oracle reproduces it exactly — including the classic CM
    guarantee (``never_under``: estimates bound the true count from
    above)."""
    import shutil as _shutil
    import tempfile as _tempfile

    from ..ops import sketches

    # The md5/explode/partial-agg build is the lane's wall; the sf0.1
    # input is one single-row-group file, which pins the whole build
    # pipeline onto ONE scan task (guide §2.5 unsplittable input) —
    # spread() repartitions the 2-column projection only when the layout
    # actually under-fills the cores (r17; no-op at production layouts).
    li = spread(
        spark,
        load(spark, sf_dir, "lineitem").select(
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            "l_partkey",
        ),
        sf_dir,
        "lineitem",
    )
    work = _mkscratch("cm_topk_")
    try:
        sketches.countmin_sketches(
            li, "l_partkey", ["month"]
        ).write.mode("overwrite").parquet(work)
        stored = spark.read.parquet(work).withColumn("g", F.lit(1))
        merged = sketches.merge_histograms(
            stored, ["g"], hist_col="cm"
        ).drop("g")
        topk = (
            li.groupBy("l_partkey")
            .agg(F.count(F.lit(1)).alias("exact_count"))
            .orderBy(F.col("exact_count").desc(), "l_partkey")
            .limit(20)
        )
        est = sketches.countmin_estimate("cm", F.col("l_partkey"))
        out = (
            topk.crossJoin(F.broadcast(merged))
            .select(
                "l_partkey",
                "exact_count",
                est.alias("est_count"),
                (est >= F.col("exact_count")).alias("never_under"),
            )
            .orderBy("l_partkey")
        )
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        _shutil.rmtree(work, ignore_errors=True)


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer–supplier trade graph (round 9,
    ``ops/iterative.py:pagerank``): distinct (customer, supplier) pairs
    from orders⋈lineitem become SYMMETRIC edges (so no dangling mass),
    then three fixed Pregel-shaped iterations — each one join-shuffle +
    one aggregate shuffle on node id, lineage truncated per round. The
    oracle UNROLLS the same three iterations in SQL, so this is that
    rare thing: an iterative distributed algorithm under an exact
    value-hash gate (supplier ranks, rounded past summation-order
    noise)."""
    from ..ops.iterative import pagerank

    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= 2000
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    raw = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    edges = raw.unionByName(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank(edges, iters=3)
    return (
        pr.filter(F.col("node").startswith("s"))
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy("node")
    )


def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spatial self-join (round 9, ``ops/geo.py``): customers
    get deterministic modular-arithmetic coordinates, and the grid join
    finds every pair within eps = 2.0 units — candidates only from 3x3
    cell neighborhoods, exact squared-distance predicate, a pair matched
    exactly once. The ORACLE runs the brute-force O(n²) self-join over
    the same coordinates, so the hash gate proves the grid method is
    COMPLETE (no pair missed at cell boundaries), not just fast. Planar
    rational arithmetic throughout — both engines compute bit-identical
    doubles. Output: pair counts and mean d² per 60-unit longitude band
    of the lower-id point."""
    from ..ops.geo import grid_self_join

    c = load(spark, sf_dir, "customer").select("c_custkey")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (
            (F.col("c_custkey") * 7919 % 18000).cast("double") / 100.0
            - 90.0
        ).alias("lat"),
        (
            (F.col("c_custkey") * 104729 % 36000).cast("double") / 100.0
            - 180.0
        ).alias("lon"),
    )
    pairs = grid_self_join(pts, eps=2.0)
    lon_of = pts.select(
        F.col("id").alias("i"), F.col("lon").alias("lon_i")
    )
    return (
        pairs.join(lon_of, "i")
        .groupBy(
            F.floor(F.col("lon_i") / 60.0).cast("int").alias("lon_band")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("d2"), 6).alias("avg_d2"),
        )
        .orderBy("lon_band")
    )


QUERIES = {
    "sketch_hll_rollup": sketch_hll_rollup,
    "sketch_quantile_rollup": sketch_quantile_rollup,
    "events_funnel": events_funnel,
    "retention_cohorts": retention_cohorts,
    "running_distinct_users": running_distinct_users,
    "orders_market_share": orders_market_share,
    "events_anomaly_zscore": events_anomaly_zscore,
    "events_trend_regr": events_trend_regr,
    "events_gapfill_hourly": events_gapfill_hourly,
    "graph_pagerank": graph_pagerank,
    "geo_grid_join": geo_grid_join,
    "sketch_countmin_topk": sketch_countmin_topk,
    "rolling_wau": rolling_wau,
    "events_ohlc_hourly": events_ohlc_hourly,
}

ORACLE = {

    # OHLC via the same (ts, event_id) total order: arg_min/arg_max on a
    # ROW ordering key reproduce Spark's struct min/max deterministically
    "events_ohlc_hourly": """
        WITH e AS (
          SELECT event_type, event_id, value,
                 CAST(ts AS TIMESTAMP) AS tss
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL
            AND ts < TIMESTAMP '2024-01-08 00:00:00'),
        r AS (
          SELECT *,
                 row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', tss)
                   ORDER BY tss, event_id) AS rn_a,
                 row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', tss)
                   ORDER BY tss DESC, event_id DESC) AS rn_d
          FROM e)
        SELECT event_type,
               strftime(date_trunc('hour', tss), '%Y-%m-%d %H:00')
                 AS bucket,
               round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
               round(max(value), 2) AS high,
               round(min(value), 2) AS low,
               round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
               CAST(count(*) AS BIGINT) AS volume
        FROM r
        GROUP BY 1, 2
        ORDER BY event_type, bucket
    """,

    # sliding distinct via contribution expansion: each (user, day)
    # lands in its 7 trailing windows; clip windows past the data edge
    "rolling_wau": """
        WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        m AS (SELECT max(d) AS m FROM days),
        contrib AS (
          SELECT user_id, d + CAST(r.i AS INTEGER) AS wd
          FROM days, UNNEST(range(0, 7)) AS r(i))
        SELECT CAST(wd AS VARCHAR) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM contrib, m
        WHERE wd <= m.m
        GROUP BY wd
        ORDER BY day
    """,

    # count-min estimates are pure bucket sums under md5 hash rows:
    # recompute the 4 bucket-sum tables and take the per-key minimum
    "sketch_countmin_topk": """
        WITH counts AS (
          SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
        topk AS (
          SELECT k, c FROM counts ORDER BY c DESC, k LIMIT 20),
        b0 AS (SELECT (CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) + 0 * CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 17, 15)) AS BIGINT)) % 1024 AS b, sum(c) AS s FROM counts GROUP BY 1),
        b1 AS (SELECT (CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) + 1 * CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 17, 15)) AS BIGINT)) % 1024 AS b, sum(c) AS s FROM counts GROUP BY 1),
        b2 AS (SELECT (CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) + 2 * CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 17, 15)) AS BIGINT)) % 1024 AS b, sum(c) AS s FROM counts GROUP BY 1),
        b3 AS (SELECT (CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) + 3 * CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 17, 15)) AS BIGINT)) % 1024 AS b, sum(c) AS s FROM counts GROUP BY 1)
        SELECT t.k AS l_partkey,
               CAST(t.c AS BIGINT) AS exact_count,
               CAST(least(e0.s, e1.s, e2.s, e3.s) AS BIGINT) AS est_count,
               least(e0.s, e1.s, e2.s, e3.s) >= t.c AS never_under
        FROM topk t
        JOIN b0 e0 ON e0.b = (CAST(('0x' || substr(md5(CAST(t.k AS VARCHAR)), 1, 15)) AS BIGINT) + 0 * CAST(('0x' || substr(md5(CAST(t.k AS VARCHAR)), 17, 15)) AS BIGINT)) % 1024
        JOIN b1 e1 ON e1.b = (CAST(('0x' || substr(md5(CAST(t.k AS VARCHAR)), 1, 15)) AS BIGINT) + 1 * CAST(('0x' || substr(md5(CAST(t.k AS VARCHAR)), 17, 15)) AS BIGINT)) % 1024
        JOIN b2 e2 ON e2.b = (CAST(('0x' || substr(md5(CAST(t.k AS VARCHAR)), 1, 15)) AS BIGINT) + 2 * CAST(('0x' || substr(md5(CAST(t.k AS VARCHAR)), 17, 15)) AS BIGINT)) % 1024
        JOIN b3 e3 ON e3.b = (CAST(('0x' || substr(md5(CAST(t.k AS VARCHAR)), 1, 15)) AS BIGINT) + 3 * CAST(('0x' || substr(md5(CAST(t.k AS VARCHAR)), 17, 15)) AS BIGINT)) % 1024
        ORDER BY l_partkey
    """,

    # brute-force O(n^2) spatial self-join: the grid join must find the
    # exact same pair set (completeness at cell boundaries) — planar
    # rational arithmetic, bit-identical doubles on both engines
    "geo_grid_join": """
        WITH p AS (
          SELECT c_custkey AS id,
                 CAST(c_custkey * 7919 % 18000 AS DOUBLE) / 100.0 - 90.0
                   AS lat,
                 CAST(c_custkey * 104729 % 36000 AS DOUBLE) / 100.0 - 180.0
                   AS lon
          FROM customer),
        pairs AS (
          SELECT a.id AS i, a.lon AS lon_i,
                 (a.lat - b.lat) * (a.lat - b.lat)
                 + (a.lon - b.lon) * (a.lon - b.lon) AS d2
          FROM p a JOIN p b ON a.id < b.id
          WHERE (a.lat - b.lat) * (a.lat - b.lat)
                + (a.lon - b.lon) * (a.lon - b.lon) <= 4.0)
        SELECT CAST(floor(lon_i / 60.0) AS INT) AS lon_band,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(avg(d2), 6) AS avg_d2
        FROM pairs
        GROUP BY 1 ORDER BY 1
    """,

    # three PageRank iterations unrolled: identical recurrence, identical
    # symmetric edge set; round(., 6) absorbs summation-order noise
    "graph_pagerank": """
        WITH raw AS (
          SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                          's' || CAST(l_suppkey AS VARCHAR) AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          WHERE o_orderkey <= 2000),
        e AS (SELECT src, dst FROM raw
              UNION ALL SELECT dst, src FROM raw),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
        s1 AS (SELECT e.dst AS node, sum(r0.rank / deg.deg) AS s
               FROM e JOIN r0 ON e.src = r0.node
                      JOIN deg ON e.src = deg.src
               GROUP BY 1),
        r1 AS (SELECT nodes.node,
                      0.15 / (SELECT n FROM nn)
                      + 0.85 * coalesce(s1.s, 0) AS rank
               FROM nodes LEFT JOIN s1 USING (node)),
        s2 AS (SELECT e.dst AS node, sum(r1.rank / deg.deg) AS s
               FROM e JOIN r1 ON e.src = r1.node
                      JOIN deg ON e.src = deg.src
               GROUP BY 1),
        r2 AS (SELECT nodes.node,
                      0.15 / (SELECT n FROM nn)
                      + 0.85 * coalesce(s2.s, 0) AS rank
               FROM nodes LEFT JOIN s2 USING (node)),
        s3 AS (SELECT e.dst AS node, sum(r2.rank / deg.deg) AS s
               FROM e JOIN r2 ON e.src = r2.node
                      JOIN deg ON e.src = deg.src
               GROUP BY 1),
        r3 AS (SELECT nodes.node,
                      0.15 / (SELECT n FROM nn)
                      + 0.85 * coalesce(s3.s, 0) AS rank
               FROM nodes LEFT JOIN s3 USING (node))
        SELECT node, round(rank, 6) AS rank
        FROM r3 WHERE node LIKE 's%' ORDER BY node
    """,
    # mergeable histogram quantiles, reproduced EXACTLY: same 256-bin
    # equi-width histogram over [0, 120000), same crossing-bin linear
    # interpolation (min_by picks the first bin whose cumulative count
    # reaches q*n) — merging per-day sketches to months is associative
    # integer addition, so going straight from rows to monthly bins is
    # the same histogram the Spark side read from stored state
    "sketch_quantile_rollup": """
        WITH b AS (
          SELECT strftime(l_shipdate, '%Y-%m') AS month,
                 least(255, greatest(0, CAST(floor(l_extendedprice / 468.75) AS INT))) AS bin
          FROM lineitem),
        h AS (SELECT month, bin, count(*) AS c FROM b GROUP BY 1, 2),
        cum AS (
          SELECT month, bin, c,
                 sum(c) OVER (PARTITION BY month ORDER BY bin) AS cum,
                 sum(c) OVER (PARTITION BY month) AS n
          FROM h),
        q50 AS (SELECT month, min_by(468.75 * (bin + (CAST(0.50 AS DOUBLE) * n - (cum - c)) / c), bin) AS est
                FROM cum WHERE cum >= CAST(0.50 AS DOUBLE) * n GROUP BY month),
        q95 AS (SELECT month, min_by(468.75 * (bin + (CAST(0.95 AS DOUBLE) * n - (cum - c)) / c), bin) AS est
                FROM cum WHERE cum >= CAST(0.95 AS DOUBLE) * n GROUP BY month),
        q99 AS (SELECT month, min_by(468.75 * (bin + (CAST(0.99 AS DOUBLE) * n - (cum - c)) / c), bin) AS est
                FROM cum WHERE cum >= CAST(0.99 AS DOUBLE) * n GROUP BY month),
        nn AS (SELECT month, CAST(sum(c) AS BIGINT) AS n_rows FROM h GROUP BY month)
        SELECT nn.month, nn.n_rows,
               q50.est AS est_p50,
               q95.est AS est_p95,
               q99.est AS est_p99
        FROM nn
        JOIN q50 ON nn.month = q50.month
        JOIN q95 ON nn.month = q95.month
        JOIN q99 ON nn.month = q99.month
        ORDER BY nn.month
    """,
    # per-month exact distincts; the TRUE flags state the tolerance
    # contract the Spark side verified against its stored-sketch
    # estimates (per-month and merged-union within 5% of exact)
    "sketch_hll_rollup": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               count(DISTINCT user_id) AS exact_users,
               count(*) AS n_events,
               TRUE AS sketch_ok,
               TRUE AS week_rollup_ok,
               TRUE AS merged_ok
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "events_gapfill_hourly": """
        WITH e AS (
          SELECT date_trunc('hour', ts) AS h, event_type FROM events),
        span AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
        spine AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h,
                 t.event_type
          FROM span, (SELECT DISTINCT event_type FROM e) t),
        hourly AS (
          SELECT h, event_type, count(*) AS n FROM e GROUP BY 1, 2),
        dense AS (
          SELECT spine.h, spine.event_type, coalesce(hourly.n, 0) AS n
          FROM spine LEFT JOIN hourly
            ON spine.h = hourly.h AND spine.event_type = hourly.event_type)
        SELECT event_type,
               count(*) AS n_hours,
               CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_silent_hours,
               CAST(sum(n) AS BIGINT) AS n_events,
               round(avg(n), 4) AS avg_per_hour
        FROM dense GROUP BY event_type ORDER BY event_type
    """,
    "events_funnel": """
        WITH per_user AS (
          SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
          FROM events GROUP BY user_id
        ), clicks AS (
          SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN per_user p ON e.user_id = p.user_id
          WHERE e.event_type = 'click' AND e.ts >= p.t_view
          GROUP BY e.user_id
        ), purchases AS (
          SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN clicks c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
          GROUP BY e.user_id
        )
        SELECT count(*) AS n_users,
               count(t_view) AS n_view,
               count(t_click) AS n_view_click,
               count(t_purchase) AS n_view_click_purchase
        FROM per_user
        LEFT JOIN clicks USING (user_id)
        LEFT JOIN purchases USING (user_id)
    """,
    "retention_cohorts": """
        WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), first AS (
          SELECT user_id, min(d) AS cohort FROM days GROUP BY user_id
        )
        SELECT CAST(cohort AS VARCHAR) AS cohort_day,
               CAST(date_diff('day', cohort, d) AS INTEGER) AS day_offset,
               count(DISTINCT user_id) AS n_users
        FROM days JOIN first USING (user_id)
        GROUP BY 1, 2
    """,
    "running_distinct_users": """
        WITH first AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
        ), per_day AS (
          SELECT d, count(*) AS new_users FROM first GROUP BY d
        )
        SELECT CAST(d AS VARCHAR) AS day, new_users,
               CAST(sum(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_users
        FROM per_day
    """,
    "orders_market_share": """
        WITH per_nation AS (
          SELECT n_name, round(sum(o_totalprice), 2) AS revenue
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name
        )
        SELECT n_name, revenue,
               round(revenue / sum(revenue) OVER (), 6) AS share
        FROM per_nation
    """,
    "events_anomaly_zscore": """
        WITH stats AS (
          SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
          FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
          GROUP BY event_type
        )
        SELECT event_id, e.event_type AS event_type, round(value, 2) AS value,
               round((value - mu) / sd, 4) AS z
        FROM events e JOIN stats s ON e.event_type = s.event_type
        WHERE e.event_type IS NOT NULL AND value IS NOT NULL
        ORDER BY abs((value - mu) / sd) DESC, event_id
        LIMIT 20
    """,
    "events_trend_regr": """
        SELECT event_type,
               CAST(regr_count(value, x) AS BIGINT) AS n,
               round(regr_slope(value, x), 5) AS slope_per_day,
               round(regr_intercept(value, x), 4) AS intercept,
               round(regr_r2(value, x), 5) AS r2
        FROM (
          SELECT event_type, value,
                 (epoch(CAST(ts AS TIMESTAMP))
                  - epoch(TIMESTAMP '2024-01-01 00:00:00')) / 86400.0 AS x
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL
        )
        GROUP BY event_type
        ORDER BY event_type
    """,
}
