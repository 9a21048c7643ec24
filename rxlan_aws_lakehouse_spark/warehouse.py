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

from .session import ensure_runtime_confs

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


def _table_layout(spark: SparkSession, table: str) -> tuple[list[str], tuple[int, list[str], list[str]] | None]:
    """(partition columns, bucket spec) of a metastore table, so rewrites
    can reproduce the physical layout instead of silently flattening it."""
    part_cols = [c.name for c in spark.catalog.listColumns(table) if c.isPartition]
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r.col_name: (r.data_type or "").strip() for r in rows}
    bucket = None
    if info.get("Num Buckets"):
        n = int(info["Num Buckets"])
        bcols = [c.strip(" `") for c in info.get("Bucket Columns", "").strip("[]").split(",") if c.strip(" `")]
        scols = [c.strip(" `") for c in info.get("Sort Columns", "").strip("[]").split(",") if c.strip(" `")]
        bucket = (n, bcols, scols)
    return part_cols, bucket


def recover_stage(spark: SparkSession, target_table: str) -> bool:
    """Crash recovery for the metastore MERGE shim: if a previous
    ``merge_upsert`` died between DROP and RENAME, the complete merged
    result still exists as ``<table>__stage`` — promote it. Returns True
    if a recovery happened. Safe to call at startup for every gold table.
    """
    if spark.catalog.tableExists(target_table) or not spark.catalog.tableExists(
        f"{target_table}__stage"
    ):
        return False
    spark.sql(f"ALTER TABLE {target_table}__stage RENAME TO {target_table}")
    part_cols, _ = _table_layout(spark, target_table)
    if part_cols:
        spark.sql(f"MSCK REPAIR TABLE {target_table}")
    return True


def merge_upsert(
    spark: SparkSession,
    target_table: str,
    updates: DataFrame,
    keys: list[str],
) -> None:
    """SCD1 upsert: replace matching keys, append new ones — the DynamoDB
    PutItem composite-key semantics (reference README.md:62-65) expressed as
    a lakehouse MERGE.

    COMPATIBILITY SHIM for metastore-managed (especially bucketed) tables —
    ``bucketBy`` only exists on ``saveAsTable``, so these can't ride the
    snapshot store. The default gold path is ``txn.TxnTable`` (file-granular
    merge, atomic pointer swap, used by ``pipeline.gold``); prefer it for
    any table with concurrent readers.

    The stage table is written with the TARGET's partition/bucket layout
    (read from the catalog), so a dt/hour-partitioned or bucketed gold table
    keeps its layout through every upsert. The anti-join carries no
    broadcast hint — an upsert batch is unbounded in general; AQE broadcasts
    the key side while it actually fits.

    The DROP + RENAME swap is metastore-atomic per statement but not across
    the pair; the window is recoverable, and recovery is AUTOMATIC: the
    stage table holds the complete merged result before the target is
    touched, and both this function and ``recover_stage`` promote a
    stranded ``__stage`` on the next run.
    """
    if recover_stage(spark, target_table):
        pass  # a crashed predecessor's merge is now the visible table
    target = spark.table(target_table)
    part_cols, bucket = _table_layout(spark, target_table)
    update_keys = updates.select(*keys).distinct()
    kept = target.join(update_keys, keys, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns))
    # The merged plan only READS the target; the stage write targets a
    # different table, so no materialization barrier is needed before it.
    spark.sql(f"DROP TABLE IF EXISTS {target_table}__stage")
    writer = merged.write.mode("overwrite").format("parquet")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    if bucket:
        n, bcols, scols = bucket
        writer = writer.bucketBy(n, *bcols)
        if scols:
            writer = writer.sortBy(*scols)
    writer.saveAsTable(f"{target_table}__stage")
    spark.sql(f"DROP TABLE {target_table}")
    spark.sql(f"ALTER TABLE {target_table}__stage RENAME TO {target_table}")
    if part_cols:
        # RENAME moves the directory but hive partition entries keep the old
        # per-partition locations; re-discover them at the new root.
        spark.sql(f"MSCK REPAIR TABLE {target_table}")


def create_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: pre-hash-partitioned on the join key so
    bucket-to-bucket joins need NO exchange (verified in tests).

    This is the 100 TB co-location strategy for repeated fact-fact joins:
    pay the shuffle once at write time, never again at read time.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def _list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """Recursive (relative_path, bytes) listing via the Hadoop FileSystem
    API — the portability seam: the same call pattern resolves to
    LocalFileSystem here and S3AFileSystem/HDFS on a cluster, so nothing in
    the compaction lane assumes POSIX. (Prefer the TxnTable lane for big
    tables: its manifests make this listing unnecessary entirely.)"""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    base = fs.makeQualified(jpath).toString().rstrip("/")
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        full = st.getPath().toString()
        rel = full[len(base) + 1 :] if full.startswith(base + "/") else full
        name = rel.rsplit("/", 1)[-1]
        if name.startswith((".", "_")):
            continue
        out.append((rel, int(st.getLen())))
    return out


def partition_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """File-count/size profile per partition directory — the compaction
    trigger metric."""
    files = [
        (rel.rsplit("/", 1)[0] if "/" in rel else "", size)
        for rel, size in _list_files(spark, path)
        if rel.endswith((".parquet", ".json", ".json.gz"))
    ]
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
    # dynamic partition overwrite is load-bearing here: in static mode the
    # mode("overwrite") write below would truncate the ENTIRE table, not
    # just the slice being rewritten.
    ensure_runtime_confs(spark)
    if spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower() != "dynamic":
        raise RuntimeError(
            "compact_partitions requires partitionOverwriteMode=dynamic; "
            "static mode would truncate the whole table"
        )
    df = spark.read.option("basePath", path).parquet(path).filter(F.col("dt") == dt)
    if hour is not None:
        df = df.filter(F.col("hour") == hour)

    slice_dir = os.path.join(path, f"dt={dt}") + (f"/hour={hour}" if hour else "")
    size = sum(
        b
        for rel, b in _list_files(spark, slice_dir)
        if rel.endswith(".parquet")
    )
    n_files = max(1, -(-size // target_file_bytes))
    sort_cols = [c for c in SORT_KEY if c in df.columns]
    out = df.coalesce(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy("dt", "hour").parquet(path)
    return n_files
