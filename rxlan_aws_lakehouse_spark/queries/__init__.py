"""Named query registry.

Each submodule exposes two dicts keyed by query name:
    QUERIES : name -> Callable[(SparkSession, sf_dir str), DataFrame]
    ORACLE  : name -> ANSI SQL string DuckDB can run on the same parquet views
              (absent for genuinely non-SQL-expressible ops -> rows-only check)

Column names and value rounding are aligned between the Spark plan and the
oracle SQL so the driver's order-insensitive value hash matches.
"""

from __future__ import annotations

from . import analytics, llm, reference, relational, relational2, relational3


def all_queries():
    out = {}
    for mod in (reference, relational, relational2, relational3, analytics, llm):
        overlap = set(out) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in (reference, relational, relational2, relational3, analytics, llm):
        out.update(mod.ORACLE)
    return out
