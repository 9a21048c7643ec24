"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``rxlan_aws_lakehouse_spark/``; this module is the
thin registry the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rxlan_aws_lakehouse_spark.queries import all_oracles, all_queries  # noqa: E402
from rxlan_aws_lakehouse_spark.queries.relational import tpch_q1  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1 pricing summary: full-scan, filter pushdown, 2-key hash
    aggregate with 8 aggregates — the engine's bread-and-butter plan.
    """
    return tpch_q1(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query — one for EVERY key in
    ``queries()``, no omissions: the real Structured Streaming runs have
    batch-equivalent closed forms, the iterative algorithms (k-means,
    connected components) unroll as CTEs, and the Arrow mapInPandas
    extractors (features, BMP decode, rotated buckets) are pinned by
    value-recomputing twins."""
    return all_oracles()
