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

_MODULES = (reference, relational, relational2, relational3, analytics, llm)

# Names that already have a green row in CORRECTNESS_r01.json. The driver
# records at most the first N registry entries per round, so queries it has
# never checked are ordered FIRST to maximize cumulative driver coverage.
_DRIVER_GREEN_R1 = {
    "ref_count_star", "ref_group_count_max", "ref_dup_detect",
    "ref_null_profile", "ref_fully_null_probe", "ref_validate_annotate",
    "ref_partition_prune", "ref_top_n_recent", "ref_case_when",
    "ref_json_expand", "ref_string_ops", "ref_time_ops", "ref_latest_per_key",
    "tpch_q1", "tpch_q3", "tpch_q5", "join_semi", "join_anti", "join_outer",
    "agg_rollup", "agg_cube", "distinct_agg", "window_running", "window_lag",
    "window_topk", "set_ops", "asof_purchase_click", "range_join_clicks",
    "pivot_events", "tpch_q4_exists", "tpch_q6_forecast", "tpch_q10_returns",
    "tpch_q14_promo", "tpch_q18_big_orders", "subquery_scalar",
    "subquery_correlated", "grouping_sets_flags", "unpivot_part_metrics",
    "stats_agg", "percentiles_exact", "window_range_1h", "window_distribution",
    "window_sliding_1h", "agg_multi_distinct", "agg_filter_clause",
    "window_value_functions", "sessionize_events", "explode_top_tokens",
    "join_null_safe",
    # agg_modern was checked r1 but hash-failed (HUGEINT cast, now fixed) —
    # keep it in the front block so the fix gets a fresh driver row.
}


def all_queries():
    merged = {}
    for mod in _MODULES:
        overlap = set(merged) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    oracles = set()
    for mod in _MODULES:
        oracles.update(mod.ORACLE)
    # Within the unchecked block, hash-checkable queries (oracle present)
    # outrank rows-only ones — a hash row is stronger driver evidence.
    front = [n for n in merged if n not in _DRIVER_GREEN_R1 and n in oracles]
    front += [n for n in merged if n not in _DRIVER_GREEN_R1 and n not in oracles]
    back = [n for n in merged if n in _DRIVER_GREEN_R1]
    return {n: merged[n] for n in front + back}


def all_oracles():
    merged = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    queries_order = list(all_queries())
    rank = {n: i for i, n in enumerate(queries_order)}
    return dict(sorted(merged.items(), key=lambda kv: rank.get(kv[0], 10**9)))
