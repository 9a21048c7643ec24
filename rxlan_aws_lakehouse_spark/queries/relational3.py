"""Relational completeness pack 3: min-subquery joins, self-joined dims,
disjunctive predicates, NOT-IN/anti patterns, distinct-count aggregates,
array aggregation, and the datetime function surface.

Rounds out the TPC-H query-shape coverage (Q2/Q7/Q12/Q16/Q19/Q22 analogues
adapted to the driver's star schema — no partsupp table, so per-type min
price stands in for min supply cost, etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load


def tpch_q2_min_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: join against a min-per-group subquery (cheapest part per
    type). The aggregate side is tiny (|types| rows) and broadcasts; the
    dimension never shuffles."""
    p = load(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_type").alias("t")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_type == mins.t) & (p.p_retailprice == mins.min_price),
        )
        .select("p_type", "p_partkey", "p_name", F.round("p_retailprice", 2).alias("price"))
        .orderBy("p_type", "p_partkey")
    )


def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: the same dimension joined twice under different roles
    (customer nation x supplier nation revenue matrix).

    nation (bounded) broadcasts twice with distinct aliases — Catalyst treats
    each as an independent build side; customer/supplier scale with sf and
    are left to AQE. The fact stream is scanned once.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.c_nk)
        .join(F.broadcast(n2), s.s_nationkey == n2.s_nk)
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2") & F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(rev, 2).alias("revenue"))
    )


def tpch_q12_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: join + two conditional aggregates bucketing order priority."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-count aggregate behind a NOT-IN exclusion.

    count_distinct shuffles (group, suppkey) pairs once; the NOT-IN list is
    a literal filter, pushed to the scan.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(~F.col("p_brand").isin("Brand#1", "Brand#2"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
        .limit(30)
    )


def tpch_q19_or_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive clauses across the join —
    the predicate the optimizer must NOT split (OR of ANDs)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    cond = (
        ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size").between(5, 20)) & (F.col("l_quantity") >= 5))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") < 5))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.round(rev, 2).alias("revenue"), F.count("*").alias("n_lines"))
    )


def tpch_q22_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar subquery threshold + anti join (above-average-balance
    customers with no URGENT orders), grouped by a derived code."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    pos_avg = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    rich = c.join(F.broadcast(pos_avg)).filter(F.col("c_acctbal") > F.col("a"))
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    code = F.substring(F.col("c_name"), 17, 2)
    return (
        no_orders.groupBy(code.alias("code"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def arrays_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation surface: collect_set -> sort -> membership/size,
    serialized with array_join so the result hashes identically everywhere."""
    e = load(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").isNotNull())
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types"))
        .select(
            "user_id",
            F.array_join(F.col("types"), ",").alias("types_csv"),
            F.size("types").alias("n_types"),
            F.array_contains("types", "purchase").cast("int").alias("has_purchase"),
        )
    )


def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function surface: add_months / months_between / last_day /
    datediff / dayofweek / quarter over the orders timeline."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date(F.add_months("o_orderdate", 3)).cast("string").alias("plus3m"),
        F.to_date(F.last_day("o_orderdate")).cast("string").alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")).alias("days_to_2002"),
        F.dayofweek("o_orderdate").alias("dow1"),  # Sunday=1
        F.quarter("o_orderdate").alias("qtr"),
        F.round(F.months_between(F.lit("2002-01-01").cast("date"), "o_orderdate"), 4).alias("months_to_2002"),
    )


def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row LIMIT: each customer's top-3
    orders — the lateral form of per-group top-k. Catalyst decorrelates it
    into a ranked window join; the declarative form stays per-row."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_cust_lat")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_ord_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM _cust_lat c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM _ord_lat o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        WHERE c.c_custkey < 50
        """
    )


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface: abs/ceil/floor/pow/sqrt/ln/log10/exp/mod/sign —
    all codegen'd JVM expressions, rounded where float repr could differ."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("abs_v"),
        F.ceil("l_extendedprice").alias("ceil_p"),
        F.floor("l_extendedprice").alias("floor_p"),
        F.round(F.pow("l_discount", 2), 6).alias("disc_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_q"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_p"),
        F.round(F.exp("l_discount"), 6).alias("exp_d"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("sign_v"),
    )


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: pad/trim/replace/reverse/repeat/slice/search."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("lpadded"),
        F.rpad("p_type", 10, ".").alias("rpadded"),
        F.reverse(F.col("p_name")).alias("rev_name"),
        F.repeat(F.col("p_brand"), 2).alias("doubled"),
        F.substring("p_name", 2, 5).alias("mid"),
        F.instr(F.col("p_name"), "a").alias("pos_a"),
        F.translate(F.col("p_type"), "AEO", "aeo").alias("translated"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("replaced"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.left(F.col("p_name"), F.lit(3)).alias("l3"),
        F.right(F.col("p_name"), F.lit(3)).alias("r3"),
    )


def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: global replace, group extract, match test,
    match count. Spark regexp_replace is global by default; the DuckDB twin
    needs the explicit 'g' flag — pinned by the oracle."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"\b(the|a|an)\b", "_").alias("no_articles"),
        F.regexp_extract(F.col("text"), r"(\w+) (\w+)", 2).alias("second_word"),
        F.col("text").rlike("spark").cast("int").alias("mentions_spark"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\bdata\b"), 0)).alias("n_data"),
    )


def sql_cte_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL entry path: a multi-CTE pipeline (join -> aggregate ->
    window rank -> filter) submitted as one spark.sql text over registered
    views — the reference's Redshift-SQL usage mode
    (/root/reference/init.sql:19-55) generalized to the full surface."""
    from ..catalog import register_all

    register_all(spark, sf_dir)
    return spark.sql(
        """
        WITH revenue AS (
          SELECT n.n_name AS nation, r.r_name AS region,
                 round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name, r.r_name
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY region
                                       ORDER BY rev DESC, nation) AS rn
          FROM revenue
        )
        SELECT region, nation, rev, rn FROM ranked WHERE rn <= 3
        """
    )


def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts INCLUDING
    zero-order customers — the left join makes the zero bucket exist, which
    an inner-join formulation silently drops."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips NULLs
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: argmax against an aggregated view — suppliers whose
    revenue equals the global max (subquery on the aggregate, not a sort,
    so ties all surface)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated-average filter — lineitems below 20% of their
    part's average quantity, decorrelated as an aggregate join (the
    optimizer's rewrite, expressed directly)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL keep multiplicity
    (min / difference of duplicate counts), unlike the distinct forms."""
    li = load(spark, sf_dir, "lineitem").select(F.col("l_returnflag").alias("f"))
    o = load(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("f"))
    inter = li.intersectAll(o).groupBy("f").agg(F.count("*").alias("n")).withColumn(
        "op", F.lit("intersect_all")
    )
    diff = li.exceptAll(o).groupBy("f").agg(F.count("*").alias("n")).withColumn(
        "op", F.lit("except_all")
    )
    return inter.unionByName(diff).select("op", "f", "n")


def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers — distinguishes a real NULL group key
    from a rollup subtotal row, which coalesce-style labels cannot."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gid")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               count(*) AS n
        FROM _li_gid
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """
    )


def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface: try_cast on non-numeric strings and
    try_divide by zero yield NULL instead of failing the job — what keeps a
    100 TB batch alive through dirty rows."""
    e = load(spark, sf_dir, "events")
    zero = F.col("value") - F.col("value")
    return e.select(
        "event_id",
        F.col("event_type").try_cast("int").alias("type_as_int"),
        F.col("props").try_cast("double").alias("props_as_double"),
        F.round(F.try_divide(F.col("value"), zero), 4).alias("div_by_zero"),
        F.round(F.try_divide(F.col("value"), F.lit(2.0)), 4).alias("half"),
    )


def null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL ordering: Spark's default ASC is NULLS FIRST, DuckDB's
    is NULLS LAST — portable queries must pin it. NULLs derived via nullif
    (the fixture has none)."""
    e = load(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("click"))
    # NULLS FIRST under DESC puts the nullif-derived NULLs inside the limit,
    # so the result actually encodes the placement rule.
    return (
        e.select("event_id", k.alias("k"))
        .orderBy(F.col("k").desc_nulls_first(), F.col("event_id").desc())
        .limit(50)
    )


def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI NOT IN vs NULL: a NULL in the subquery list makes NOT IN return
    UNKNOWN for every row (0 matches); the NULL-filtered variant behaves
    intuitively. The classic three-valued-logic trap, pinned cross-engine."""
    load(spark, sf_dir, "events").createOrReplaceTempView("_ev_nin")
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM _ev_nin
           WHERE event_type NOT IN
             (SELECT nullif(event_type, 'click') FROM _ev_nin)) AS n_with_null_list,
          (SELECT count(*) FROM _ev_nin
           WHERE event_type NOT IN
             (SELECT nullif(event_type, 'click') FROM _ev_nin
              WHERE nullif(event_type, 'click') IS NOT NULL)) AS n_filtered_list
        """
    )


def mod_sign_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modulo sign semantics on negatives: % truncates toward zero in both
    engines (sign follows the dividend); pmod is the always-positive form,
    expressed in the oracle as ((x % n) + n) % n."""
    li = load(spark, sf_dir, "lineitem")
    x = (F.col("l_quantity") - 25).cast("int")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        x.alias("x"),
        (x % 7).alias("mod7"),
        F.pmod(x, F.lit(7)).alias("pmod7"),
        (x / F.lit(4)).cast("int").alias("div4_trunc"),
    )


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width binning histogram — the aggregation shape behind data
    profiling dashboards; one shuffle of (bucket, count) pairs."""
    # re-pinned round 16: r11-stale cohort re-check (r15 verdict task 4)
    e = load(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 100).cast("int")
    return (
        e.filter(F.col("value").isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based approximate aggregates under the correctness gate.

    HLL++ (approx_count_distinct) and KLL-style quantile sketches
    (approx_percentile) are the only way distinct counts / percentiles fit
    in bounded memory at 100 TB — exact NDV shuffles every distinct key;
    the sketch shuffles a few KB per partition. Their values are
    approximate, so the cross-engine contract is: both engines compute the
    EXACT statistic (hash-compared by the driver), and the Spark side
    additionally gates its sketch against that exact value — ``within_tol``
    flips false (hash mismatch vs the oracle's literal true) if the
    approximation ever drifts past 5% / 2 units (HLL at rsd=0.01, so the
    gate sits 5 sigma out). Spark's sketches are deterministic for fixed
    input, so the gate is stable.
    """
    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")

    def gate(approx, exact, rel=0.05):
        return (F.abs(approx - exact) <= rel * F.abs(exact)).alias("within_tol")

    ndv_users = e.agg(
        F.approx_count_distinct("user_id", 0.01).alias("a"),
        F.count_distinct("user_id").alias("x"),
    ).select(
        F.lit("ndv_event_users").alias("metric"),
        F.col("x").cast("double").alias("exact_value"),
        gate(F.col("a").cast("double"), F.col("x").cast("double")),
    )
    ndv_cust = o.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("a"),
        F.count_distinct("o_custkey").alias("x"),
    ).select(
        F.lit("ndv_order_custkeys").alias("metric"),
        F.col("x").cast("double").alias("exact_value"),
        gate(F.col("a").cast("double"), F.col("x").cast("double")),
    )
    ev = e.filter(F.col("value").isNotNull())
    p50 = ev.agg(
        F.percentile_approx("value", 0.5, 10000).alias("a"),
        F.expr("percentile(value, 0.5)").alias("x"),
    ).select(
        F.lit("p50_event_value").alias("metric"),
        F.round(F.col("x"), 2).alias("exact_value"),
        (F.abs(F.col("a") - F.col("x")) <= 2.0).alias("within_tol"),
    )
    p95 = ev.agg(
        F.percentile_approx("value", 0.95, 10000).alias("a"),
        F.expr("percentile(value, 0.95)").alias("x"),
    ).select(
        F.lit("p95_event_value").alias("metric"),
        F.round(F.col("x"), 2).alias("exact_value"),
        (F.abs(F.col("a") - F.col("x")) <= 2.0).alias("within_tol"),
    )
    return ndv_users.unionByName(ndv_cust).unionByName(p50).unionByName(p95)


def json_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over the VARIANT type (Spark 4's shredded
    binary JSON — the open-lakehouse answer to string-typed JSON columns):
    order rows serialize to JSON, ``parse_json`` ingests them ONCE into
    variant, and typed ``variant_get`` paths drive the filter and the
    aggregation. Against a string column every extraction re-parses the
    JSON; against variant the parse is paid once and extractions are
    pointer walks into the binary encoding — the difference between
    O(fields x parse) and O(parse + fields) per row at 100 TB.

    The oracle reads the same JSON with DuckDB's native JSON extraction.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    j = o.select(
        F.to_json(
            F.struct(
                "o_orderkey",
                "o_orderpriority",
                "o_totalprice",
                F.struct(
                    F.col("o_orderstatus").alias("status"),
                    (F.col("o_custkey") % 7).alias("bucket"),
                ).alias("meta"),
            )
        ).alias("js")
    )
    v = j.select(F.parse_json(F.col("js")).alias("v"))
    return (
        v.select(
            F.variant_get(F.col("v"), "$.o_orderpriority", "string").alias(
                "priority"
            ),
            F.variant_get(F.col("v"), "$.meta.status", "string").alias(
                "status"
            ),
            F.variant_get(F.col("v"), "$.o_totalprice", "double").alias(
                "price"
            ),
            F.try_variant_get(F.col("v"), "$.missing.path", "string").alias(
                "absent"
            ),
        )
        .filter(F.col("price") > 1000.0)
        .groupBy("priority", "status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("price"), 2).alias("total_price"),
            F.count("absent").alias("n_absent"),
        )
        .orderBy("priority", "status")
    )


QUERIES = {
    "approx_aggregates": approx_aggregates,
    "sql_cte_pipeline": sql_cte_pipeline,
    "tpch_q13_custdist": tpch_q13_custdist,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q17_small_qty": tpch_q17_small_qty,
    "set_ops_all": set_ops_all,
    "rollup_grouping_id": rollup_grouping_id,
    "try_functions": try_functions,
    "null_ordering": null_ordering,
    "not_in_null_semantics": not_in_null_semantics,
    "mod_sign_semantics": mod_sign_semantics,
    "value_histogram": value_histogram,
    "tpch_q2_min_price": tpch_q2_min_price,
    "tpch_q7_volume": tpch_q7_volume,
    "tpch_q12_priority": tpch_q12_priority,
    "tpch_q16_supplier_cnt": tpch_q16_supplier_cnt,
    "tpch_q19_or_preds": tpch_q19_or_preds,
    "tpch_q22_no_orders": tpch_q22_no_orders,
    "arrays_per_user": arrays_per_user,
    "datetime_functions": datetime_functions,
    "lateral_top_orders": lateral_top_orders,
    "math_functions": math_functions,
    "string_functions": string_functions,
    "regex_functions": regex_functions,
    "json_variant_ops": json_variant_ops,
}

ORACLE = {
    # exact_value cross-checked for real; within_tol is the Spark-side
    # sketch-vs-exact gate (literal true here -> hash fails if Spark's
    # approximation drifts out of tolerance)
    "approx_aggregates": """
        SELECT 'ndv_event_users' AS metric,
               CAST(count(DISTINCT user_id) AS DOUBLE) AS exact_value,
               true AS within_tol
        FROM events
        UNION ALL
        SELECT 'ndv_order_custkeys',
               CAST(count(DISTINCT o_custkey) AS DOUBLE), true
        FROM orders
        UNION ALL
        SELECT 'p50_event_value',
               round(quantile_cont(value, 0.5), 2), true
        FROM events WHERE value IS NOT NULL
        UNION ALL
        SELECT 'p95_event_value',
               round(quantile_cont(value, 0.95), 2), true
        FROM events WHERE value IS NOT NULL
    """,
    "sql_cte_pipeline": """
        WITH revenue AS (
          SELECT n.n_name AS nation, r.r_name AS region,
                 round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name, r.r_name
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY region
                                       ORDER BY rev DESC, nation) AS rn
          FROM revenue
        )
        SELECT region, nation, rev, rn FROM ranked WHERE rn <= 3
    """,
    "tpch_q13_custdist": """
        WITH per_cust AS (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q15_top_supplier": """
        WITH rev AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    "tpch_q17_small_qty": """
        WITH avg_qty AS (
          SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS threshold
          FROM lineitem GROUP BY l_partkey
        )
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN avg_qty ON l_partkey = pk
        WHERE p_brand = 'Brand#3' AND l_quantity < threshold
    """,
    "set_ops_all": """
        WITH i AS (
          SELECT l_returnflag AS f FROM lineitem
          INTERSECT ALL
          SELECT o_orderstatus FROM orders
        ), d AS (
          SELECT l_returnflag AS f FROM lineitem
          EXCEPT ALL
          SELECT o_orderstatus FROM orders
        )
        SELECT 'intersect_all' AS op, f, count(*) AS n FROM i GROUP BY f
        UNION ALL
        SELECT 'except_all' AS op, f, count(*) AS n FROM d GROUP BY f
    """,
    "rollup_grouping_id": """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
               CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "try_functions": """
        SELECT event_id,
               TRY_CAST(event_type AS INTEGER) AS type_as_int,
               TRY_CAST(props AS DOUBLE) AS props_as_double,
               round(value / nullif(value - value, 0), 4) AS div_by_zero,
               round(value / 2.0, 4) AS half
        FROM events
    """,
    "null_ordering": """
        SELECT event_id, nullif(event_type, 'click') AS k
        FROM events
        ORDER BY k DESC NULLS FIRST, event_id DESC
        LIMIT 50
    """,
    "not_in_null_semantics": """
        SELECT
          (SELECT count(*) FROM events
           WHERE event_type NOT IN
             (SELECT nullif(event_type, 'click') FROM events)) AS n_with_null_list,
          (SELECT count(*) FROM events
           WHERE event_type NOT IN
             (SELECT nullif(event_type, 'click') FROM events
              WHERE nullif(event_type, 'click') IS NOT NULL)) AS n_filtered_list
    """,
    "mod_sign_semantics": """
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity - 25 AS INTEGER) AS x,
               CAST(CAST(l_quantity - 25 AS INTEGER) % 7 AS INTEGER) AS mod7,
               CAST(((CAST(l_quantity - 25 AS INTEGER) % 7) + 7) % 7 AS INTEGER) AS pmod7,
               CAST(trunc(CAST(l_quantity - 25 AS INTEGER) / 4.0) AS INTEGER) AS div4_trunc
        FROM lineitem
    """,
    "value_histogram": """
        SELECT CAST(floor(value / 100) AS INTEGER) AS bucket,
               count(*) AS n,
               round(min(value), 2) AS lo,
               round(max(value), 2) AS hi
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
    """,
    "lateral_top_orders": """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        WHERE c.c_custkey < 50
    """,
    "math_functions": """
        SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25) AS abs_v,
               CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
               CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
               round(pow(l_discount, 2), 6) AS disc_sq,
               round(sqrt(l_quantity), 6) AS sqrt_q,
               round(ln(l_extendedprice), 6) AS ln_p,
               round(log10(l_extendedprice), 6) AS log10_p,
               round(exp(l_discount), 6) AS exp_d,
               l_orderkey % 7 AS mod7,
               CAST(sign(l_quantity - 25) AS INTEGER) AS sign_v
        FROM lineitem
    """,
    "string_functions": """
        SELECT p_partkey,
               lpad(p_brand, 12, '*') AS lpadded,
               rpad(p_type, 10, '.') AS rpadded,
               reverse(p_name) AS rev_name,
               repeat(p_brand, 2) AS doubled,
               substr(p_name, 2, 5) AS mid,
               CAST(instr(p_name, 'a') AS INTEGER) AS pos_a,
               translate(p_type, 'AEO', 'aeo') AS translated,
               replace(p_brand, '#', '-') AS replaced,
               concat_ws('|', p_brand, p_type) AS joined,
               left(p_name, 3) AS l3,
               right(p_name, 3) AS r3
        FROM part
    """,
    "regex_functions": """
        SELECT doc_id,
               regexp_replace(text, '\\b(the|a|an)\\b', '_', 'g') AS no_articles,
               regexp_extract(text, '(\\w+) (\\w+)', 2) AS second_word,
               CAST(regexp_matches(text, 'spark') AS INTEGER) AS mentions_spark,
               CAST(len(regexp_extract_all(text, '\\bdata\\b')) AS INTEGER) AS n_data
        FROM documents
    """,
    "tpch_q2_min_price": """
        WITH mins AS (
          SELECT p_type AS t, min(p_retailprice) AS min_price
          FROM part GROUP BY p_type
        )
        SELECT p_type, p_partkey, p_name, round(p_retailprice, 2) AS price
        FROM part JOIN mins ON p_type = t AND p_retailprice = min_price
        ORDER BY p_type, p_partkey
    """,
    "tpch_q7_volume": """
        SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
               CAST(extract(year FROM l_shipdate) AS INTEGER) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
        GROUP BY 1, 2, 3
    """,
    "tpch_q12_priority": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag
    """,
    "tpch_q16_supplier_cnt": """
        SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
        GROUP BY p_brand, p_type
        ORDER BY supplier_cnt DESC, p_brand, p_type
        LIMIT 30
    """,
    "tpch_q19_or_preds": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 5 AND 20 AND l_quantity >= 5)
           OR (p_type = 'PROMO' AND l_quantity < 5)
    """,
    "tpch_q22_no_orders": """
        SELECT substr(c_name, 17, 2) AS code, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
        GROUP BY 1
    """,
    "arrays_per_user": """
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
               CAST(len(list(DISTINCT event_type)) AS INTEGER) AS n_types,
               CAST(list_contains(list(DISTINCT event_type), 'purchase') AS INTEGER) AS has_purchase
        FROM events
        WHERE event_type IS NOT NULL
        GROUP BY user_id
    """,
    "datetime_functions": """
        SELECT o_orderkey,
               CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow1,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               round(12.0 * (extract(year FROM DATE '2002-01-01') - extract(year FROM o_orderdate))
                     + (extract(month FROM DATE '2002-01-01') - extract(month FROM o_orderdate))
                     + (extract(day FROM DATE '2002-01-01') - extract(day FROM o_orderdate)) / 31.0, 4)
                 AS months_to_2002
        FROM orders
    """,
    "json_variant_ops": """
        WITH j AS (
          SELECT to_json(struct_pack(
                   o_orderkey := o_orderkey,
                   o_orderpriority := o_orderpriority,
                   o_totalprice := o_totalprice,
                   meta := struct_pack(status := o_orderstatus,
                                       bucket := o_custkey % 7)
                 )) AS js
          FROM orders WHERE o_orderkey <= 5000
        )
        SELECT json_extract_string(js, '$.o_orderpriority') AS priority,
               json_extract_string(js, '$.meta.status') AS status,
               count(*) AS n_orders,
               round(sum(CAST(json_extract(js, '$.o_totalprice') AS DOUBLE)), 2)
                 AS total_price,
               count(json_extract_string(js, '$.missing.path')) AS n_absent
        FROM j
        WHERE CAST(json_extract(js, '$.o_totalprice') AS DOUBLE) > 1000.0
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
}
