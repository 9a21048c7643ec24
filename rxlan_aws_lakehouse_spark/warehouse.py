"""Warehouse layer: managed gold tables + stats + compaction.

The reference's warehouse is Redshift: CREATE TABLE IF NOT EXISTS preaction,
append COPY, ANALYZE postaction (/root/reference/glue/
bronze_to_silver_openweather.py:111-148), SORTKEY DDL (init.sql:16-17), and
Firehose buffering as the only small-file mitigation (README.md:150,278-279).
Lakehouse-native equivalents:

  * ``create_gold_table`` — saveAsTable parquet with CREATE-if-missing
    semantics + ANALYZE TABLE after load (CBO stats for join planning).
  * ``compact_partitions`` — small-file compaction: rewrite a partition's
    files to ~target size, sorted on the reference's sort key so parquet
    row-group min/max stats do the SORTKEY scan-skipping job.

At 100 TB compaction is what keeps file counts sane under streaming
ingest: hourly partitions of KB-sized micro-batch files become a listing
bottleneck long before they become a storage problem.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SORT_KEY = ("city", "fetched_at_utc")  # init.sql:17
TARGET_FILE_BYTES = 128 * 1024 * 1024


def create_gold_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    mode: str = "append",
    analyze: bool = True,
) -> None:
    """S9 equivalent: managed partitioned table with post-load statistics."""
    sort_cols = [c for c in SORT_KEY if c in df.columns]
    writer = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    writer.write.mode(mode).partitionBy(
        *[c for c in ("dt", "hour") if c in df.columns]
    ).format("parquet").saveAsTable(table)
    if analyze:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")


def partition_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """File-count/size profile per partition directory — the compaction
    trigger metric."""
    files = []
    for root, _dirs, names in os.walk(path):
        part = os.path.relpath(root, path)
        for n in names:
            if n.endswith((".parquet", ".json", ".json.gz")) and not n.startswith("."):
                files.append((part, os.path.getsize(os.path.join(root, n))))
    return spark.createDataFrame(files or [("", 0)], "partition string, bytes long").groupBy(
        "partition"
    ).agg(
        F.count("*").alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    dt: str,
    hour: str | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite one dt (or dt/hour) slice into ~target-size sorted files.

    Reads only the target partitions (pruned listing), coalesces to
    ceil(bytes/target) files, sorts within files on the SORTKEY, and
    replaces just those partitions via dynamic partition overwrite — safe
    under the same idempotence contract as the hourly reload (T7).
    Returns the file count written.
    """
    df = spark.read.option("basePath", path).parquet(path).filter(F.col("dt") == dt)
    if hour is not None:
        df = df.filter(F.col("hour") == hour)

    slice_dir = os.path.join(path, f"dt={dt}") + (f"/hour={hour}" if hour else "")
    size = sum(
        os.path.getsize(os.path.join(r, n))
        for r, _d, ns in os.walk(slice_dir)
        for n in ns
        if n.endswith(".parquet")
    )
    n_files = max(1, -(-size // target_file_bytes))
    sort_cols = [c for c in SORT_KEY if c in df.columns]
    out = df.coalesce(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy("dt", "hour").parquet(path)
    return n_files
