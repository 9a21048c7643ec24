"""Gold layer: partitioned analytics table.

Replaces the reference's Redshift JDBC load (glue/
bronze_to_silver_openweather.py:134-148) with a partitioned parquet table:
same warehouse semantics (CREATE IF NOT EXISTS + append + post-load stats)
expressed as lakehouse-native writes. ``SORTKEY (city, fetched_at_utc)``
(init.sql:17) maps to sortWithinPartitions before write so parquet row-group
min/max stats give the same scan-skipping effect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_gold(df: DataFrame, path: str, overwrite_partitions: bool = True) -> None:
    """Write partitioned by dt/hour.

    ``overwrite_partitions=True`` relies on dynamic partition overwrite
    (session.py pins partitionOverwriteMode=dynamic): only the partitions
    present in ``df`` are replaced — the reference's "idempotent hourly
    re-run" (README.md:217-219) without truncating the table.
    """
    (
        df.sortWithinPartitions("city", "fetched_at_utc")
        .write.mode("overwrite" if overwrite_partitions else "append")
        .partitionBy("dt", "hour")
        .parquet(path)
    )


def load_gold(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("basePath", path).parquet(path)


def write_gold_txn(spark: SparkSession, df: DataFrame, path: str) -> str:
    """Gold write with the reference's transactional property: the staged
    Redshift COPY commits atomically (glue/bronze_to_silver_openweather.py:
    134-148); here the snapshot + pointer swap in ``txn.TxnTable`` does —
    a reader concurrent with the reload never sees a torn table. Returns
    the committed version id; read back via ``TxnTable(path).read(spark)``.
    """
    from ..txn import TxnTable

    return TxnTable(path).commit(
        df,
        partition_by=[c for c in ("dt", "hour") if c in df.columns],
        sort_within=[c for c in ("city", "fetched_at_utc") if c in df.columns],
        operation="gold_load",
    )
