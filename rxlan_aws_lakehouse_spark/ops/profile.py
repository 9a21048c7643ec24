"""Data profiling and declarative expectations (the dbt-test /
Great-Expectations layer a lakehouse runs before promoting data).

Two operators, both single-pass aggregate shapes that hold at 100 TB:

* ``profile``: one wide aggregate over the table computes, per column,
  row/null/distinct counts and min/max — then pivots driver-side into
  one row per column (the aggregate output is a single row of fixed
  width; the pivot touches no data). Exact counts, not estimates: the
  scan is one pass either way, and COUNT(DISTINCT c1), COUNT(DISTINCT
  c2), ... in one aggregate is the standard multi-distinct expand Spark
  plans for it.
* ``expectations``: a rule set evaluated as conditional aggregates in
  ONE pass wherever the rule is row-local (not-null, accepted values,
  ranges); set-level rules (uniqueness, referential integrity) each
  cost their natural aggregate/anti-join. Violations are COUNTED, not
  boolean-ized — a monitoring system wants the magnitude.

Reference parity: the reference has no data-quality layer at all (its
Glue job trusts the API payload shape); this is the completeness gap a
production lakehouse fills first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: ``(column, n_rows, n_nulls, n_distinct,
    min_value, max_value)`` — min/max rendered as strings so the profile
    has one uniform schema across column types. Single aggregate pass;
    the per-column pivot happens on the one-row result, not the data."""
    cols = cols or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return one.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.*")


def expectations(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Row-local rules in ONE aggregate pass: each rule is a boolean
    Column; a row violates when the rule is definitively FALSE (NULL
    passes — ANSI CHECK semantics, matching the txn store's
    constraints). Returns ``(rule, violations)``, one row per rule."""
    one = df.agg(
        *(
            F.sum(
                F.when(
                    ~F.coalesce(cond.cast("boolean"), F.lit(True)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias(name)
            for name, cond in rules
        )
    )
    rows = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(name).cast("long").alias("violations"),
        )
        for name, _ in rules
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def expect_unique(df: DataFrame, keys: list[str], name: str) -> DataFrame:
    """Set-level uniqueness: violations = rows beyond the first per key
    (``count(*) - count(distinct key-tuple)`` over one aggregate)."""
    return df.agg(
        F.lit(name).alias("rule"),
        (
            F.count(F.lit(1))
            - F.count_distinct(*[F.col(k) for k in keys])
        ).cast("long").alias("violations"),
    )


def expect_references(
    df: DataFrame, key: str, dim: DataFrame, dim_key: str, name: str
) -> DataFrame:
    """Referential integrity: violations = child rows whose non-null key
    has no parent (left-anti against the dimension's key set)."""
    return (
        df.filter(F.col(key).isNotNull())
        .join(
            dim.select(F.col(dim_key).alias(key)).distinct(),
            key,
            "left_anti",
        )
        .agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).cast("long").alias("violations"),
        )
    )
