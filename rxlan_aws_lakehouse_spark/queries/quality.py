"""Driver-visible data-quality lanes: column profiling and declarative
expectations (ops/profile.py) over the fixture tables — the dbt-test /
Great-Expectations layer, oracle-gated."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..ops import profile as pr


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of orders in ONE aggregate pass (rows, nulls,
    exact distincts, min/max as strings) — the first query anyone runs
    on an unfamiliar table. DuckDB recomputes each column's row from
    plain aggregates."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )
    return pr.profile(o).orderBy("column")


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A rule suite over orders: row-local rules (not-null, accepted
    values, positive amounts) in one aggregate pass, plus set-level
    uniqueness and referential integrity against customer. Violation
    COUNTS ride the hash — including the deliberately-failing rule
    (status 'F' rows exist), so the gate proves the evaluator counts
    real violations rather than printing zeros."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    row_local = pr.expectations(
        o,
        [
            ("orderkey_not_null", F.col("o_orderkey").isNotNull()),
            (
                "status_accepted",
                F.col("o_orderstatus").isin("F", "O", "P"),
            ),
            ("price_positive", F.col("o_totalprice") > 0),
            # deliberately failing rule: 'F' (finished) orders DO exist
            ("no_finished_orders", F.col("o_orderstatus") != "F"),
        ],
    )
    uniq = pr.expect_unique(o, ["o_orderkey"], "orderkey_unique")
    fk = pr.expect_references(
        o, "o_custkey", c, "c_custkey", "custkey_references_customer"
    )
    return (
        row_local.unionByName(uniq)
        .unionByName(fk)
        .withColumn("passed", F.col("violations") == 0)
        .orderBy("rule")
    )


QUERIES = {
    "profile_orders": profile_orders,
    "dq_expectations": dq_expectations,
}

ORACLE = {
    "profile_orders": """
        WITH s AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                          o_totalprice, o_orderpriority
                   FROM orders)
        SELECT * FROM (
          SELECT 'o_orderkey' AS "column",
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
                 CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
                 CAST(min(o_orderkey) AS VARCHAR) AS min_value,
                 CAST(max(o_orderkey) AS VARCHAR) AS max_value
          FROM s
          UNION ALL
          SELECT 'o_custkey', CAST(count(*) AS BIGINT),
                 CAST(count(*) - count(o_custkey) AS BIGINT),
                 CAST(count(DISTINCT o_custkey) AS BIGINT),
                 CAST(min(o_custkey) AS VARCHAR),
                 CAST(max(o_custkey) AS VARCHAR)
          FROM s
          UNION ALL
          SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
                 CAST(count(*) - count(o_orderstatus) AS BIGINT),
                 CAST(count(DISTINCT o_orderstatus) AS BIGINT),
                 CAST(min(o_orderstatus) AS VARCHAR),
                 CAST(max(o_orderstatus) AS VARCHAR)
          FROM s
          UNION ALL
          SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
                 CAST(count(*) - count(o_totalprice) AS BIGINT),
                 CAST(count(DISTINCT o_totalprice) AS BIGINT),
                 CAST(min(o_totalprice) AS VARCHAR),
                 CAST(max(o_totalprice) AS VARCHAR)
          FROM s
          UNION ALL
          SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
                 CAST(count(*) - count(o_orderpriority) AS BIGINT),
                 CAST(count(DISTINCT o_orderpriority) AS BIGINT),
                 CAST(min(o_orderpriority) AS VARCHAR),
                 CAST(max(o_orderpriority) AS VARCHAR)
          FROM s
        ) ORDER BY "column"
    """,
    "dq_expectations": """
        SELECT * FROM (
          SELECT 'orderkey_not_null' AS rule,
                 CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS violations,
                 sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
                   AS passed
          FROM orders
          UNION ALL
          SELECT 'status_accepted',
                 CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P')
                          THEN 1 ELSE 0 END) AS BIGINT),
                 sum(CASE WHEN o_orderstatus NOT IN ('F','O','P')
                     THEN 1 ELSE 0 END) = 0
          FROM orders
          UNION ALL
          SELECT 'price_positive',
                 CAST(sum(CASE WHEN NOT (o_totalprice > 0)
                          THEN 1 ELSE 0 END) AS BIGINT),
                 sum(CASE WHEN NOT (o_totalprice > 0)
                     THEN 1 ELSE 0 END) = 0
          FROM orders
          UNION ALL
          SELECT 'no_finished_orders',
                 CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                      AS BIGINT),
                 sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = 0
          FROM orders
          UNION ALL
          SELECT 'orderkey_unique',
                 CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
                 count(*) = count(DISTINCT o_orderkey)
          FROM orders
          UNION ALL
          SELECT 'custkey_references_customer',
                 CAST(count(*) AS BIGINT), count(*) = 0
          FROM orders
          WHERE o_custkey IS NOT NULL
            AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        ) ORDER BY rule
    """,
}
