"""Data contract for the weather pipeline.

The reference fixes its warehouse schema in DDL
(/root/reference/glue/bronze_to_silver_openweather.py:111-131, init.sql:1-17)
and documents the ingest contract in docs/ingest_payload.md:8-26. Here the
contract is a first-class StructType: bronze reads use it explicitly
(inference is a fallback, not the default — the reference's sample-based
inference costs extra jobs and is nondeterministic, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# (name, spark type) for the 13 payload columns the ETL casts
# (bronze_to_silver_openweather.py:71-86).
CONTRACT_FIELDS: tuple[tuple[str, T.DataType], ...] = (
    ("app", T.StringType()),
    ("stage", T.StringType()),
    ("source", T.StringType()),
    ("fetched_at_utc", T.StringType()),
    ("city", T.StringType()),
    ("country", T.StringType()),
    ("lat", T.DoubleType()),
    ("lon", T.DoubleType()),
    ("temp_c", T.DoubleType()),
    ("feels_like_c", T.DoubleType()),
    ("humidity", T.IntegerType()),
    ("pressure", T.IntegerType()),
    ("wind_speed", T.DoubleType()),
)

# Bronze rows arrive as strings (NDJSON from the CDC path); the contract
# schema reads everything as string and silver casts — the same
# cast-from-string behavior as the reference ETL.
BRONZE_SCHEMA = T.StructType(
    [T.StructField(name, T.StringType(), True) for name, _ in CONTRACT_FIELDS]
    + [
        # nested passthrough of the source payload (README.md:58)
        T.StructField(
            "raw",
            T.StructType(
                [
                    T.StructField("id", T.LongType(), True),
                    T.StructField("dt", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

# Final gold layout: 13 contract cols + event ts + partition cols + audit
# (bronze_to_silver_openweather.py:93-102; 17 cols with loaded_at).
GOLD_COLUMNS: tuple[str, ...] = tuple(n for n, _ in CONTRACT_FIELDS) + (
    "ts",
    "dt",
    "hour",
    "loaded_at",
)

# Timestamp format the ingest stamps and the ETL parses
# (bronze_to_silver_openweather.py:89).
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
