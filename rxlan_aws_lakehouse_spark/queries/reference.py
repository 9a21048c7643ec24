"""Reference-parity analytics queries (SURVEY.md §2.1-2.2, §2.4-2.6, §2.8).

The reference runs its analytics surface as Redshift SQL over a single
``public.weather`` table (/root/reference/init.sql:19-55, README.md:196-211).
Every operator in that surface is re-expressed here over the driver's star
schema, as a declarative DataFrame plan Catalyst can optimize end-to-end:

  A1 full-table count .............. ref_count_star
  A3 multi-key group + count/max ... ref_group_count_max   (README.md:206-211)
  A4 GROUP BY + HAVING dup detect .. ref_dup_detect        (init.sql:46-52)
  A5 per-column null profiling ..... ref_null_profile      (init.sql:39-44)
  P5 range-validation annotate ..... ref_validate_annotate (handler.py:92-100)
  P6 conjunctive all-null probe .... ref_fully_null_probe  (init.sql:30-36)
  P7/S8 partition-value predicate .. ref_partition_prune   (README.md:206-210)
  O1/O2 top-N by recency ........... ref_top_n_recent      (init.sql:25-28)
  F19 CASE WHEN conditional agg .... ref_case_when         (init.sql:41-43)
  F14 JSON field expansion ......... ref_json_expand       (bronze_to_silver:54-57)
  F9-F11 string ops ................ ref_string_ops        (handler.py:66-69,124)
  F3-F8 time ops ................... ref_time_ops          (bronze_to_silver:89-91)
  §2.5 latest-record-per-key ....... ref_latest_per_key    (README.md:62-65 access pattern)

Aliases match the oracle SQL exactly; float aggregates are rounded on both
sides so the driver's value hash is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load

ORDERS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def ref_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: SELECT COUNT(*) — a single full-scan aggregate.

    At scale this is a metadata-only parquet operation (row-group counts);
    Spark's parquet source answers it without reading data pages.
    """
    return load(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


def ref_group_count_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: rows per (dt, hr) with COUNT(*) and MAX(ts) — load reconciliation.

    Mirrors the reference's per-partition load check (README.md:206-211).
    Partial aggregation (map-side combine) happens automatically; the shuffle
    carries only (dt, hr) -> (count, max) pairs, not rows.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
            F.hour("ts").cast("int").alias("hr"),
        )
        .agg(F.count("*").alias("n"), F.max("ts").alias("max_ts"))
    )


def ref_dup_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/O2: GROUP BY ... HAVING COUNT(*) > 1, ordered dup report.

    The reference detects at-least-once duplicates post-hoc
    (init.sql:46-52). Deterministic tiebreak keys make the LIMIT stable.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .orderBy(F.col("n").desc(), "user_id", "event_type")
        .limit(20)
    )


def ref_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: per-column null counts in one pass (init.sql:39-44).

    One aggregate node computes every SUM(CASE WHEN c IS NULL...) — a single
    scan regardless of column count.
    """
    o = load(spark, sf_dir, "orders")
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        for c in ORDERS_COLS
    ] + [F.count("*").alias("n_rows")]
    return o.agg(*aggs)


def ref_fully_null_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: count rows where every payload column is NULL (init.sql:30-36)."""
    e = load(spark, sf_dir, "events")
    cond = F.col("value").isNull() & F.col("props").isNull() & F.col("event_type").isNull()
    return e.filter(cond).agg(F.count("*").alias("n_fully_null"))


def ref_validate_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: range-validation that annotates rows instead of dropping them.

    The reference's ingest validator appends error strings per rule
    (handler.py:92-100). concat_ws skips NULLs identically in Spark and
    ANSI SQL, so the annotation is a single codegen'd expression — no UDF.
    """
    e = load(spark, sf_dir, "events")
    known = ["click", "view", "purchase", "signup", "error"]
    errs = F.concat_ws(
        ",",
        F.when(F.col("value") < 0, F.lit("value_negative")),
        F.when(F.col("value") > 1000.0, F.lit("value_too_large")),
        F.when(~F.col("event_type").isin(known), F.lit("unknown_type")),
    )
    annotated = e.withColumn("validation_errors", errs).withColumn(
        "is_valid", (F.col("validation_errors") == "").cast("int")
    )
    return (
        annotated.groupBy("event_type", "validation_errors")
        .agg(F.count("*").alias("n"), F.sum("is_valid").alias("n_valid"))
    )


def ref_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/S8: partition-value predicate — one day's slice, per-hour counts.

    The reference documents but never implements dt/hour pruning (SURVEY §0);
    here the filter is declarative so on a dt/hour-partitioned layout Catalyst
    prunes at file-listing time and on raw parquet it pushes a min/max
    row-group filter.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.filter(F.to_date("ts") == F.lit("2024-01-15").cast("date"))
        .groupBy(F.hour("ts").cast("int").alias("hr"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def ref_top_n_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: ORDER BY recency DESC LIMIT 50 (init.sql:25-28).

    Spark plans orderBy+limit as TakeOrderedAndProject — a true distributed
    top-k (per-partition heaps + driver merge), never a full sort.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.select("event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value"))
        .orderBy(F.col("ts").desc(), "event_id")
        .limit(50)
    )


def ref_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19/A5: CASE WHEN inside aggregation (init.sql:41-43 pattern)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") > 500.0, 1).otherwise(0)).alias("n_high"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


def ref_json_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: JSON string column -> typed fields (bronze_to_silver:54-57).

    get_json_object is a codegen'd JVM expression — the JSON hot path stays
    out of Python entirely.
    """
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_null_k"),
        )
    )


def ref_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9-F11: split / substring / coalesce over documents (handler.py:66-69,124)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.split(F.col("text"), " ").getItem(0)).alias("first_tok_upper"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.length("text").alias("n_chars_calc"),
        F.coalesce(F.nullif(F.col("lang"), F.lit("")), F.lit("unknown")).alias("lang_or_default"),
    )


def ref_time_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3-F8: timestamp parse/format/derive (bronze_to_silver:89-91).

    dt/hour derivation is the reference's partition-column logic; epoch
    seconds mirror raw.dt handling (docs/ingest_payload.md:47).
    """
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("dt_str"),
        F.date_format("ts", "HH").alias("hour_str"),
        F.unix_timestamp("ts").alias("epoch_s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts_plus_1h"),
    )


def ref_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: latest record per key — the DDB pk/sk access pattern
    (README.md:62-65) as row_number() = 1.

    At 100 TB this is the canonical 'current state from an append log' query:
    one shuffle on the key, no self-join.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
        )
    )


QUERIES = {
    "ref_count_star": ref_count_star,
    "ref_group_count_max": ref_group_count_max,
    "ref_dup_detect": ref_dup_detect,
    "ref_null_profile": ref_null_profile,
    "ref_fully_null_probe": ref_fully_null_probe,
    "ref_validate_annotate": ref_validate_annotate,
    "ref_partition_prune": ref_partition_prune,
    "ref_top_n_recent": ref_top_n_recent,
    "ref_case_when": ref_case_when,
    "ref_json_expand": ref_json_expand,
    "ref_string_ops": ref_string_ops,
    "ref_time_ops": ref_time_ops,
    "ref_latest_per_key": ref_latest_per_key,
}

_NULL_PROFILE_AGGS = ",\n       ".join(
    f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_{c}"
    for c in ORDERS_COLS
)

ORACLE = {
    "ref_count_star": "SELECT count(*) AS n FROM lineitem",
    "ref_group_count_max": """
        SELECT strftime(ts, '%Y-%m-%d') AS dt,
               CAST(extract(hour FROM ts) AS INTEGER) AS hr,
               count(*) AS n,
               max(ts) AS max_ts
        FROM events GROUP BY 1, 2
    """,
    "ref_dup_detect": """
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type HAVING count(*) > 1
        ORDER BY n DESC, user_id, event_type LIMIT 20
    """,
    "ref_null_profile": f"""
        SELECT {_NULL_PROFILE_AGGS},
               count(*) AS n_rows
        FROM orders
    """,
    "ref_fully_null_probe": """
        SELECT count(*) AS n_fully_null FROM events
        WHERE value IS NULL AND props IS NULL AND event_type IS NULL
    """,
    "ref_validate_annotate": """
        WITH annotated AS (
          SELECT event_type,
                 concat_ws(',',
                   CASE WHEN value < 0 THEN 'value_negative' END,
                   CASE WHEN value > 1000.0 THEN 'value_too_large' END,
                   CASE WHEN event_type NOT IN ('click','view','purchase','signup','error')
                        THEN 'unknown_type' END) AS validation_errors
          FROM events)
        SELECT event_type, validation_errors, count(*) AS n,
               CAST(sum(CASE WHEN validation_errors = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
        FROM annotated GROUP BY 1, 2
    """,
    "ref_partition_prune": """
        SELECT CAST(extract(hour FROM ts) AS INTEGER) AS hr,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
        GROUP BY 1
    """,
    "ref_top_n_recent": """
        SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
        FROM events ORDER BY ts DESC, event_id LIMIT 50
    """,
    "ref_case_when": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CASE WHEN value > 500.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               round(avg(value), 4) AS avg_value
        FROM events GROUP BY 1
    """,
    "ref_json_expand": """
        SELECT event_type,
               round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
               max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
               CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
        FROM events GROUP BY 1
    """,
    "ref_string_ops": """
        SELECT doc_id,
               upper(split_part(text, ' ', 1)) AS first_tok_upper,
               substr(text, 1, 20) AS prefix20,
               CAST(length(text) AS INTEGER) AS n_chars_calc,
               coalesce(nullif(lang, ''), 'unknown') AS lang_or_default
        FROM documents
    """,
    "ref_time_ops": """
        SELECT event_id,
               strftime(ts, '%Y-%m-%d') AS dt_str,
               strftime(ts, '%H') AS hour_str,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
               ts + INTERVAL 1 HOUR AS ts_plus_1h
        FROM events
    """,
    "ref_latest_per_key": """
        SELECT user_id, event_id AS last_event_id, ts AS last_ts, event_type AS last_type
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
}
