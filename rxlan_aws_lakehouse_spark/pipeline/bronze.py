"""Bronze layer: Hive-partitioned gzip NDJSON landing zone.

Layout mirrors the reference's Firehose prefix
(s3://.../raw/openweather/dt=YYYY-MM-DD/hour=HH/part-*.json.gz,
/root/reference/README.md:67-71,149-154) on any filesystem Spark can reach.

The reference's Glue job scans the ENTIRE prefix every run
(glue/bronze_to_silver_openweather.py:36-40) even though the README promises
hour-scoped reads; here dt/hour are real arguments and pruning happens at
file-listing time via partition-column filters — at 100 TB that is the
difference between listing one hour directory and reading years of history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import BRONZE_SCHEMA

CORRUPT_COL = "_corrupt_record"


def write_bronze(df: DataFrame, path: str, mode: str = "append") -> None:
    """Append NDJSON gzip partitioned by dt/hour — the Firehose buffer's
    output shape (S6). ``df`` must carry string ``dt``/``hour`` columns."""
    (
        df.write.mode(mode)
        .partitionBy("dt", "hour")
        .option("compression", "gzip")
        .json(path)
    )


def read_bronze(
    spark: SparkSession,
    path: str,
    dt: str | None = None,
    hour: str | None = None,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """Scan bronze with the contract schema and optional partition pruning.

    S7 (recursive gzip NDJSON scan) + S8 (the documented-but-unimplemented
    dt/hour slice, implemented for real). With ``infer=True`` the schema
    comes from Spark's JSON inference (the reference's behavior,
    glue/bronze_to_silver_openweather.py:36-40); default is the explicit
    contract schema — no inference job, stable types.

    Partition columns dt/hour come from the directory layout; filters on
    them prune at file-listing time (verify: .explain shows PartitionFilters,
    tests assert the pruned count).
    """
    reader = spark.read.option("recursiveFileLookup", "false").option(
        "basePath", path
    )
    if not infer:
        s = schema or BRONZE_SCHEMA
        # partition cols are appended by the source; don't duplicate them.
        # PERMISSIVE + a corrupt-record column: malformed NDJSON lines (a
        # reality of at-least-once gzip delivery) surface as quarantinable
        # rows instead of failing the batch or being silently dropped.
        fields = [f for f in s.fields if f.name not in ("dt", "hour")]
        fields.append(T.StructField(CORRUPT_COL, T.StringType(), True))
        reader = (
            reader.schema(T.StructType(fields))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
        )
    df = reader.json(path)
    if dt is not None:
        df = df.filter(F.col("dt") == dt)
    if hour is not None:
        df = df.filter(F.col("hour") == hour)
    return df


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(parsed rows without the corrupt column, corrupt raw lines)."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0).select(F.lit(None).cast("string").alias(CORRUPT_COL))
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    # Spark refuses plans whose only referenced data column is the internal
    # corrupt-record column; keep every column in the quarantine branch so
    # the scan stays legal (the extra columns are NULL for corrupt lines).
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad
