"""Named query registry.

Each submodule exposes two dicts keyed by query name:
    QUERIES : name -> Callable[(SparkSession, sf_dir str), DataFrame]
    ORACLE  : name -> ANSI SQL string DuckDB can run on the same parquet views
              (absent for genuinely non-SQL-expressible ops -> rows-only check)

Column names and value rounding are aligned between the Spark plan and the
oracle SQL so the driver's order-insensitive value hash matches.
"""

from __future__ import annotations

from . import (
    analytics,
    llm,
    reference,
    relational,
    relational2,
    relational3,
    relational4,
    sampling,
    streaming_live,
)

_MODULES = (
    reference, relational, relational2, relational3, relational4, analytics,
    llm, sampling, streaming_live,
)

# Names with a green row in CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json (99
# names). The driver records at most the first N registry entries per round,
# so queries it has never checked are ordered FIRST to maximize cumulative
# driver coverage. After round 2 the unchecked block is exactly the 11
# emb_*/multimodal_*/dedup_clusters/streaming queries.
_DRIVER_GREEN = {
    "agg_cube", "agg_filter_clause", "agg_modern", "agg_multi_distinct", "agg_rollup",
    "approx_aggregates", "arrays_per_user", "asof_purchase_click", "contamination_check",
    "datetime_functions", "dedup_exact_keep", "dedup_exact_stats", "dedup_fingerprint",
    "dedup_minhash_pairs", "dedup_minhash_sig", "dedup_ngram_jaccard", "dedup_simhash",
    "distinct_agg", "emb_ann_lsh", "emb_ann_multitable", "emb_cosine_topk",
    "events_anomaly_zscore", "events_funnel", "explode_top_tokens",
    "grouping_sets_flags", "join_anti", "join_null_safe", "join_outer", "join_semi",
    "lateral_top_orders", "math_functions", "mod_sign_semantics",
    "not_in_null_semantics", "null_ordering", "orders_market_share",
    "percentiles_exact", "pivot_events", "quality_filter_pipeline",
    "range_join_clicks", "ref_case_when", "ref_count_star", "ref_dup_detect",
    "ref_fully_null_probe", "ref_group_count_max", "ref_json_expand",
    "ref_latest_per_key", "ref_null_profile", "ref_partition_prune",
    "ref_string_ops", "ref_time_ops", "ref_top_n_recent", "ref_validate_annotate",
    "regex_functions", "retention_cohorts", "rollup_grouping_id",
    "running_distinct_users", "sessionize_events", "set_ops", "set_ops_all",
    "sql_cte_pipeline", "stats_agg", "string_agg_nations", "string_functions",
    "subquery_correlated", "subquery_scalar", "text_bpe_tokens", "text_langid",
    "text_oov_rate", "text_quality", "text_repetition", "text_tokens",
    "time_bucket_weekly", "tpch_q1", "tpch_q10_returns", "tpch_q12_priority",
    "tpch_q13_custdist", "tpch_q14_promo", "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt", "tpch_q17_small_qty", "tpch_q18_big_orders",
    "tpch_q19_or_preds", "tpch_q22_no_orders", "tpch_q2_min_price", "tpch_q3",
    "tpch_q4_exists", "tpch_q5", "tpch_q6_forecast", "tpch_q7_volume",
    "try_functions", "unpivot_part_metrics", "value_histogram",
    "window_distribution", "window_lag", "window_range_1h", "window_running",
    "window_sliding_1h", "window_topk", "window_value_functions",
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
    front = [n for n in merged if n not in _DRIVER_GREEN and n in oracles]
    front += [n for n in merged if n not in _DRIVER_GREEN and n not in oracles]
    back = [n for n in merged if n in _DRIVER_GREEN]
    return {n: merged[n] for n in front + back}


def all_oracles():
    merged = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    queries_order = list(all_queries())
    rank = {n: i for i, n in enumerate(queries_order)}
    return dict(sorted(merged.items(), key=lambda kv: rank.get(kv[0], 10**9)))
