"""Relational completeness pack (SURVEY.md §2.3, §2.5, §2.7 — new capability).

The reference implements no joins, windows, or set ops (SURVEY §2.3: every
init.sql query is single-table). This module builds the full Spark relational
surface over the driver's star schema:

  equi-joins (broadcast + sort-merge)  tpch_q1 / tpch_q3 / tpch_q5
  semi / anti / outer joins            join_semi, join_anti, join_outer
  grouping sets                        agg_rollup, agg_cube
  distinct aggregates                  distinct_agg
  analytic windows                     window_running, window_lag, window_topk
  set operations                       set_ops
  as-of join (custom operator)         asof_purchase_click
  range join                           range_join_clicks
  pivot                                pivot_events

Scale notes: dimension joins (region/nation/customer/supplier) are broadcast —
at any SF the dims stay small relative to facts, so the fact table never
shuffles for them. Fact-fact joins (orders x lineitem) are shuffle joins on the
key both sides are already hashed by; AQE handles skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..ops.asof import asof_join
from ..ops.topk import topk_per_group


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # re-pinned round 15: last driver check was r10 (stale window);
    # plan and oracle unchanged — content key bumped so the driver
    # re-verifies this lane (r14 verdict task 4)
    """TPC-H Q1 pricing summary: 2-key groupBy, 8 aggregates, one scan.

    Whole-stage-codegen'd hash aggregate with map-side partials; the shuffle
    carries 6 groups, not 600k rows. The l_shipdate filter pushes to parquet.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # re-pinned round 15: last driver check was r10 (stale window);
    # plan and oracle unchanged — content key bumped so the driver
    # re-verifies this lane (r14 verdict task 4)
    """TPC-H Q3 shipping priority: customer ⨝ orders ⨝ lineitem, top-10 revenue.

    customer grows with scale, so it carries NO broadcast hint — AQE picks
    broadcast when the filtered side fits and falls back to shuffle join at
    100-TB sf. orders⨝lineitem is a shuffle join on the orderkey both sides
    already aggregate by. Ordering includes l_orderkey so the LIMIT is
    deterministic under revenue ties.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # re-pinned round 15: last driver check was r10 (stale window);
    # plan and oracle unchanged — content key bumped so the driver
    # re-verifies this lane (r14 verdict task 4)
    """TPC-H Q5-style regional revenue: 6-table star join.

    region/nation are genuinely bounded (25/5 rows at every sf) and carry
    explicit broadcast hints; supplier/customer scale with sf, so their join
    strategy is left to AQE/CBO (broadcast at test sf, shuffle at 100 TB).
    Catalyst reorders the dim filters below the joins.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — customers that have orders, counted per nation.

    Semi-join ships only the key column of the right side; Spark dedups the
    build side, so fan-out on customers with many orders never materializes.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_with_orders"))
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — customers with no orders (NOT EXISTS), per nation."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_without_orders"))
    )


def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + aggregate — per-customer order count/spend incl. zeros.

    Aggregating orders BEFORE the join keeps the outer join 1:1 (no row
    explosion, and the join input is pre-shrunk — at 100 TB this is the
    difference between joining 1.5B rows and 150M groups).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("cnt"), F.sum("o_totalprice").alias("spend")
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
            F.round(F.coalesce(F.col("spend"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation): hierarchical subtotals in one pass."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all grouping-set combinations."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT ...) — expand-based distinct aggregation per group."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per key — ordered rowsBetween frame."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.sum("value").over(w), 4).alias("run_sum"),
        F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id")).alias("seq"),
    )


def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() — inter-event gap seconds per user (sessionization primitive)."""
    # re-pinned round 16: r11-stale cohort re-check (r15 verdict task 4)
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev)).alias("gap_s"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice — ranking window, no self-join."""
    o = load(spark, sf_dir, "orders")
    ranked = topk_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return ranked.select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn"
    )


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION over nation-key sets of customers vs suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    both = c.intersect(s).withColumn("tag", F.lit("both"))
    cust_only = c.exceptAll(s).withColumn("tag", F.lit("cust_only"))
    supp_only = s.exceptAll(c).withColumn("tag", F.lit("supp_only"))
    return both.unionByName(cust_only).unionByName(supp_only).select("tag", "nk")


def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior click.

    Custom operator (ops/asof.py): union + last-value window — one shuffle,
    linear cost. Oracle uses DuckDB's native ASOF LEFT JOIN.
    """
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
        suffix="",
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


def range_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within 1 hour after each purchase, per user.

    Equi on user_id carries the shuffle; the time range is a post-join filter,
    so cost is bounded by per-user fan-out, not a cartesian product.
    """
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    cond = (
        (p.user_id == c.c_user)
        & (c.cts > p.pts)
        & (c.cts <= p.pts + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        p.join(c, cond, "left")
        .groupBy("purchase_id", "user_id")
        .agg(F.count("click_id").alias("n_clicks_1h"))
    )


def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-day event-type counts as columns (explicit value list so the
    plan needs no extra distinct-values job)."""
    e = load(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    pivoted = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
        .pivot("event_type", types)
        .count()
        .na.fill(0)
    )
    renames = [F.col("dt")] + [F.col(t).alias(f"n_{t}") for t in types]
    return pivoted.select(*renames)


QUERIES = {
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q5": tpch_q5,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_outer": join_outer,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "distinct_agg": distinct_agg,
    "window_running": window_running,
    "window_lag": window_lag,
    "window_topk": window_topk,
    "set_ops": set_ops,
    "asof_purchase_click": asof_purchase_click,
    "range_join_clicks": range_join_clicks,
    "pivot_events": pivot_events,
}

ORACLE = {
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q3": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
    "tpch_q5": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    "join_semi": """
        SELECT c_nationkey, count(*) AS n_with_orders
        FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
        GROUP BY 1
    """,
    "join_anti": """
        SELECT c_nationkey, count(*) AS n_without_orders
        FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY 1
    """,
    "join_outer": """
        SELECT c_custkey,
               coalesce(cnt, 0) AS n_orders,
               round(coalesce(spend, 0.0), 2) AS total_spend
        FROM customer
        LEFT JOIN (SELECT o_custkey, count(*) AS cnt, sum(o_totalprice) AS spend
                   FROM orders GROUP BY 1) o ON c_custkey = o.o_custkey
    """,
    "agg_rollup": """
        SELECT r_name, n_name, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "agg_cube": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "distinct_agg": """
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1
    """,
    "window_running": """
        SELECT user_id, event_id, ts,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_sum,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS seq
        FROM events
    """,
    "window_lag": """
        SELECT user_id, event_id, ts,
               CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "window_topk": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
               CAST(rn AS INTEGER) AS rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3
    """,
    "set_ops": """
        SELECT 'both' AS tag, nk FROM
          (SELECT DISTINCT c_nationkey AS nk FROM customer
           INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'cust_only', nk FROM
          (SELECT DISTINCT c_nationkey AS nk FROM customer
           EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'supp_only', nk FROM
          (SELECT DISTINCT s_nationkey AS nk FROM supplier
           EXCEPT SELECT DISTINCT c_nationkey FROM customer)
    """,
    "asof_purchase_click": """
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
               c.event_id AS click_id, c.ts AS click_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    "range_join_clicks": """
        SELECT p.event_id AS purchase_id, p.user_id,
               count(c.event_id) AS n_clicks_1h
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
        GROUP BY 1, 2
    """,
    "pivot_events": """
        SELECT strftime(ts, '%Y-%m-%d') AS dt,
               count(*) FILTER (WHERE event_type = 'click') AS n_click,
               count(*) FILTER (WHERE event_type = 'view') AS n_view,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               count(*) FILTER (WHERE event_type = 'error') AS n_error
        FROM events GROUP BY 1
    """,
}
