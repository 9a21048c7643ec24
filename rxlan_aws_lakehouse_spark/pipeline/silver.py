"""Silver layer: typed, validated, annotated records.

Re-expresses the reference's normalize step (glue/
bronze_to_silver_openweather.py:85-102) and the ingest validator
(lambda/ingest_weather/handler.py:92-100) as pure column expressions —
no UDFs, everything whole-stage-codegen eligible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schema import CONTRACT_FIELDS, TS_FORMAT


def expand_payload_column(df: DataFrame, sample_rows: int = 200) -> DataFrame:
    """F14/F15/F18: if a string ``payload``/``data`` column exists, expand it.

    Mirrors the reference's plan-time dispatch on df.columns
    (bronze_to_silver_openweather.py:43-57): sample up to ``sample_rows``
    non-null values, infer a MERGED JSON schema across the whole sample
    (the reference's spark.read.json(sample.rdd) trick — a single exemplar
    would miss fields absent from the first row), then ``from_json`` +
    struct explode. The sample is bounded so the inference job is
    O(sample), not O(table).
    """
    payload_col = next((c for c, t in df.dtypes if c in ("payload", "data") and t == "string"), None)
    if payload_col is None:
        return df
    sample_df = df.select(payload_col).filter(F.col(payload_col).isNotNull()).limit(sample_rows)
    sample = [r[0] for r in sample_df.collect()]
    if not sample:
        return df.drop(payload_col)
    spark = df.sparkSession
    schema = spark.read.json(spark.sparkContext.parallelize(sample)).schema
    expanded = df.withColumn("_j", F.from_json(F.col(payload_col), schema))
    others = [c for c in df.columns if c != payload_col]
    return expanded.select(*others, "_j.*")


def normalize(df: DataFrame) -> DataFrame:
    """Cast the 13 contract columns (injecting typed NULLs for missing ones),
    parse the event timestamp, derive dt/hour partition values, stamp
    loaded_at. One Project node; Catalyst collapses the chain."""
    cols: list[Column] = []
    for name, typ in CONTRACT_FIELDS:
        if name in df.columns:
            cols.append(F.col(name).cast(typ).alias(name))
        else:
            cols.append(F.lit(None).cast(typ).alias(name))
    ts = F.to_timestamp(F.col("fetched_at_utc"), TS_FORMAT)
    return df.select(
        *cols,
        ts.alias("ts"),
        F.date_format(ts, "yyyy-MM-dd").alias("dt"),
        F.date_format(ts, "HH").alias("hour"),
        F.current_timestamp().alias("loaded_at"),
    )


def _rules() -> list[tuple[str, Column]]:
    """Validation rules: (error tag, violation predicate) —
    lambda/ingest_weather/handler.py:92-100 plus the README-recommended
    null-city guard (README.md:263-265) the reference never implemented."""
    return [
        ("temp_out_of_range", (F.col("temp_c") < -90) | (F.col("temp_c") > 60)),
        ("humidity_out_of_range", (F.col("humidity") < 0) | (F.col("humidity") > 100)),
        ("pressure_not_positive", F.col("pressure") <= 0),
        ("city_missing", F.col("city").isNull() | (F.col("city") == "")),
    ]


def validate(df: DataFrame) -> DataFrame:
    """P5: annotate (never drop) with ``validation_errors`` array<string>."""
    errs = F.array_compact(
        F.array(
            *[
                F.when(cond, F.lit(tag)).otherwise(F.lit(None).cast("string"))
                for tag, cond in _rules()
            ]
        )
    )
    return df.withColumn("validation_errors", errs)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Good rows vs quarantined rows (any validation error)."""
    annotated = df if "validation_errors" in df.columns else validate(df)
    good = annotated.filter(F.size("validation_errors") == 0)
    bad = annotated.filter(F.size("validation_errors") > 0)
    return good, bad
