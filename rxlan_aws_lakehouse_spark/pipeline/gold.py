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
