"""Relational completeness pack 2: subqueries, grouping sets, statistical
aggregates, exact percentiles, sessionization, range frames, lateral
explode, unpivot, null-safe joins, and four more TPC-H-shaped pipelines.

Extends queries/relational.py (SURVEY.md §2.3-2.7 new-capability surface).
Scale notes inline per query; the shared principles: dims broadcast, facts
shuffle at most once on their natural key, windows are one shuffle on the
partition key, and every filter/projection is declarative so Catalyst pushes
it into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load


# ---------------------------------------------------------------------------
# TPC-H-shaped join/agg pipelines
# ---------------------------------------------------------------------------

def tpch_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS subquery -> left-semi join, then priority counts.

    The semi join shuffles only the distinct orderkeys of the filtered
    lineitem side; no payload columns move.
    """
    # re-pinned round 16: r11-stale cohort re-check (r15 verdict task 4)
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure filter + single aggregate — the pushdown showcase.

    All three predicates reach the parquet scan (PushedFilters); the plan is
    scan -> partial agg -> final agg with no shuffle of data rows.
    """
    # re-pinned round 16: r11-stale cohort re-check (r15 verdict task 4)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 10)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-item revenue per customer, top 20.

    nation (bounded) broadcasts; customer scales with sf so AQE picks its
    join strategy. orders x lineitem is the only guaranteed shuffle.
    TakeOrderedAndProject caps driver memory at 20 rows.
    """
    # re-pinned round 16: r11-stale cohort re-check (r15 verdict task 4)
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(rev, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: conditional-aggregate ratio over a part join (promo revenue %)."""
    # re-pinned round 16: r11-stale cohort re-check (r15 verdict task 4)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING over a fact aggregate, join back to dims, top 10.

    The groupBy(orderkey) aggregate and the orders join share the same hash
    key, so AQE can plan the join shuffle-free on the aggregated side.
    """
    # re-pinned round 16: r11-stale cohort re-check (r15 verdict task 4)
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 120)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------

def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price.

    The inner aggregate is one row; Spark plans it as a subquery broadcast,
    not a join shuffle.
    """
    o = load(spark, sf_dir, "orders")
    avg_price = o.agg(F.avg("o_totalprice").alias("a"))
    return (
        o.join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("a"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_above_avg"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_above"),
        )
    )


def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery (parts above their type's average price),
    decorrelated the way optimizers do: a window average per group —
    one shuffle on p_type instead of a per-row subquery execution.
    """
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        p.withColumn("type_avg", F.avg("p_retailprice").over(w))
        .filter(F.col("p_retailprice") > F.col("type_avg"))
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_above"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets / unpivot
# ---------------------------------------------------------------------------

def grouping_sets_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((flag,status),(flag),()) with NULL-marker labels.

    One shuffle computes all three granularities (Spark expands grouping
    sets into a single Expand+Aggregate, not three scans).
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long unpivot of per-brand metric averages (§2.7 extension).

    The unpivot runs AFTER aggregation, so it melts ~25 brand rows, not the
    fact table.
    """
    # re-pinned round 16: r11-stale cohort re-check (r15 verdict task 4)
    p = load(spark, sf_dir, "part")
    wide = p.groupBy("p_brand").agg(
        F.round(F.avg("p_size"), 4).alias("avg_size"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
    )
    return wide.unpivot(
        ids=["p_brand"],
        values=["avg_size", "avg_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# Statistical aggregates / percentiles
# ---------------------------------------------------------------------------

def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moments + correlation per group: stddev/variance/corr/covar.

    All four are single-pass partial-aggregatable — one shuffle of tiny
    state per group, regardless of fact size.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
    )


def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (p25/p50/p75) per event type.

    Spark's `percentile` matches ANSI percentile_cont linear interpolation;
    at 100 TB you'd switch to approx_percentile (t-digest sketch, mergeable,
    bounded memory) — kept exact here because the oracle hash must match.
    """
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.25), 4).alias("p25"),
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.75), 4).alias("p75"),
    )


# ---------------------------------------------------------------------------
# Windows: range frames, distribution functions, sessionization
# ---------------------------------------------------------------------------

def window_range_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour RANGE frame per user: rolling event-value sum.

    RANGE frames include all peers of the current timestamp, so the result
    is deterministic even with duplicate (user_id, ts) pairs. The frame is
    defined over WHOLE-SECOND epochs (unix_timestamp truncates), and the
    oracle floors epoch(ts) to match — raw fractional epochs would flip
    membership for event pairs straddling the hour by sub-second amounts
    (caught by the sf0.1 sweep: one boundary pair in 100k rows).
    """
    # re-pinned round 16: r11-stale cohort re-check (r15 verdict task 4)
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a total order per group."""
    # re-pinned round 16: r11-stale cohort re-check (r15 verdict task 4)
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


def window_sliding_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding time windows (1h window, 30min slide) — each event lands in
    two overlapping windows; Spark's window() expands them scan-side.

    The oracle mirrors the expansion as a UNION ALL of the two candidate
    window starts per event — same multiset, no window-function needed.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates over different columns in one agg —
    Catalyst plans this with Expand (one scan, N distinct streams)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(F.to_date("ts").cast("string").alias("d")).agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct("event_type").alias("n_types"),
        F.count("*").alias("n_events"),
    )


def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER (WHERE ...) aggregate clause via the SQL surface."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_ord_fc")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               round(avg(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2) AS avg_big
        FROM _ord_fc GROUP BY o_orderstatus
        """
    )


def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions: first/last/nth over an explicit full-partition
    frame (last_value defaults to a running frame — the classic trap; the
    unbounded frame makes it the partition-global last)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(wfull).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
        F.nth_value("event_type", 2).over(wfull).alias("second_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


def agg_modern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern aggregate surface: count_if / bool_and / bool_or / median /
    max_by / min_by per group (ties impossible: the by-expression is the
    continuous value column jittered by unique event_id ordering)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    return e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 500).alias("n_high"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 990).alias("any_very_high"),
        F.round(F.median("value"), 4).alias("med_value"),
        # argmax/argmin via lexicographic struct extrema: value has ties in
        # the fixture, so plain max_by(event_id, value) is nondeterministic;
        # the (value, event_id) struct gives a total order in both engines.
        F.max(F.struct("value", "event_id")).getField("event_id").alias("argmax_event"),
        F.min(F.struct("value", "event_id")).getField("event_id").alias("argmin_event"),
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) — per-user session stats.

    The classic two-window trick: lag to flag session starts, running sum to
    assign session ids. Both windows share one shuffle on user_id. This is
    the batch twin of Structured Streaming's session_window.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_session = sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("dur_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.round(F.avg("n_events"), 4).alias("avg_sess_events"),
        F.max("dur_s").alias("max_sess_dur_s"),
    )


# ---------------------------------------------------------------------------
# Lateral explode / null-safe join / time bucketing / string agg
# ---------------------------------------------------------------------------

def explode_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode: top-20 tokens across the corpus.

    explode -> groupBy is the scale shape for token-level analytics: the
    shuffle carries (token, partial count) after map-side combine, never
    the exploded rows themselves.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match.

    NULLified event_type ('click' -> NULL) exercises the NULL-bucket path a
    plain equi-join would silently drop.
    """
    e = load(spark, sf_dir, "events")
    keyed = e.select(
        F.nullif(F.col("event_type"), F.lit("click")).alias("k"), "value"
    ).alias("f")
    dim = keyed.groupBy("k").agg(F.count("*").alias("n_k")).alias("d")
    return (
        keyed.join(F.broadcast(dim), F.col("f.k").eqNullSafe(F.col("d.k")))
        .select(F.col("f.k").alias("k"), "n_k", "value")
        .groupBy("k", "n_k")
        .agg(F.round(F.sum("value"), 2).alias("sum_value"))
    )


def time_bucket_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc time bucketing — weekly rollup of the event stream."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("week", F.col("ts")).alias("week_start"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per region (LISTAGG/string_agg semantics,
    made deterministic by sorting the collected array before joining)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


QUERIES = {
    "tpch_q4_exists": tpch_q4_exists,
    "tpch_q6_forecast": tpch_q6_forecast,
    "tpch_q10_returns": tpch_q10_returns,
    "tpch_q14_promo": tpch_q14_promo,
    "tpch_q18_big_orders": tpch_q18_big_orders,
    "subquery_scalar": subquery_scalar,
    "subquery_correlated": subquery_correlated,
    "grouping_sets_flags": grouping_sets_flags,
    "unpivot_part_metrics": unpivot_part_metrics,
    "stats_agg": stats_agg,
    "percentiles_exact": percentiles_exact,
    "window_range_1h": window_range_1h,
    "window_distribution": window_distribution,
    "window_sliding_1h": window_sliding_1h,
    "agg_multi_distinct": agg_multi_distinct,
    "agg_filter_clause": agg_filter_clause,
    "window_value_functions": window_value_functions,
    "agg_modern": agg_modern,
    "sessionize_events": sessionize_events,
    "explode_top_tokens": explode_top_tokens,
    "join_null_safe": join_null_safe,
    "time_bucket_weekly": time_bucket_weekly,
    "string_agg_nations": string_agg_nations,
}

ORACLE = {
    "tpch_q4_exists": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    "tpch_q6_forecast": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 10
    """,
    "tpch_q10_returns": """
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "tpch_q14_promo": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    "tpch_q18_big_orders": """
        WITH big AS (
          SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 120
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "subquery_scalar": """
        SELECT o_orderstatus, count(*) AS n_above_avg,
               round(avg(o_totalprice), 2) AS avg_above
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
    """,
    "subquery_correlated": """
        SELECT p_type, count(*) AS n_above, round(max(p_retailprice), 2) AS max_price
        FROM part p
        WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                               WHERE p2.p_type = p.p_type)
        GROUP BY p_type
    """,
    "grouping_sets_flags": """
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "unpivot_part_metrics": """
        WITH wide AS (
          SELECT p_brand, round(avg(p_size), 4) AS avg_size,
                 round(avg(p_retailprice), 4) AS avg_price
          FROM part GROUP BY p_brand
        )
        SELECT p_brand, 'avg_size' AS metric, avg_size AS value FROM wide
        UNION ALL
        SELECT p_brand, 'avg_price' AS metric, avg_price AS value FROM wide
    """,
    "stats_agg": """
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(var_samp(l_extendedprice), 2) AS var_price,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc
        FROM lineitem GROUP BY l_returnflag
    """,
    "percentiles_exact": """
        SELECT event_type,
               round(quantile_cont(value, 0.25), 4) AS p25,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.75), 4) AS p75
        FROM events GROUP BY event_type
    """,
    "window_range_1h": """
        SELECT event_id, user_id,
               round(sum(value) OVER (
                 PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS sum_1h
        FROM events
    """,
    "window_distribution": """
        SELECT o_orderkey, o_orderpriority,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    "window_sliding_1h": """
        WITH expanded AS (
          SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS w0, value FROM events
          UNION ALL
          SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS w0, value
          FROM events
        )
        SELECT w0 AS window_start, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM expanded GROUP BY w0
    """,
    "agg_multi_distinct": """
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
               count(DISTINCT user_id) AS n_users,
               count(DISTINCT event_type) AS n_types,
               count(*) AS n_events
        FROM events GROUP BY 1
    """,
    "agg_filter_clause": """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               round(avg(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2) AS avg_big
        FROM orders GROUP BY o_orderstatus
    """,
    "window_value_functions": """
        SELECT event_id, user_id,
               first_value(event_type) OVER wf AS first_type,
               last_value(event_type) OVER wf AS last_type,
               nth_value(event_type, 2) OVER wf AS second_type,
               lead(event_type, 1) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "agg_modern": """
        SELECT event_type,
               CAST(count_if(value > 500) AS BIGINT) AS n_high,
               bool_and(value >= 0) AS all_nonneg,
               bool_or(value > 990) AS any_very_high,
               round(median(value), 4) AS med_value,
               (max(struct_pack(v := value, e := event_id))).e AS argmax_event,
               (min(struct_pack(v := value, e := event_id))).e AS argmin_event
        FROM events
        WHERE event_type IS NOT NULL
        GROUP BY event_type
    """,
    "sessionize_events": """
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                        OR lag(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, ts,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM flagged
        ), per_session AS (
          SELECT user_id, sess_id, count(*) AS n_events,
                 CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS dur_s
          FROM sess GROUP BY user_id, sess_id
        )
        SELECT user_id, count(*) AS n_sessions,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               round(avg(n_events), 4) AS avg_sess_events,
               max(dur_s) AS max_sess_dur_s
        FROM per_session GROUP BY user_id
    """,
    "explode_top_tokens": """
        SELECT tok, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 20
    """,
    "join_null_safe": """
        WITH keyed AS (
          SELECT nullif(event_type, 'click') AS k, value FROM events
        ), dim AS (
          SELECT k, count(*) AS n_k FROM keyed GROUP BY k
        )
        SELECT keyed.k AS k, n_k, round(sum(value), 2) AS sum_value
        FROM keyed JOIN dim ON keyed.k IS NOT DISTINCT FROM dim.k
        GROUP BY keyed.k, n_k
    """,
    "time_bucket_weekly": """
        SELECT date_trunc('week', ts) AS week_start,
               count(*) AS n,
               round(sum(value), 2) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1
    """,
    "string_agg_nations": """
        SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
}
