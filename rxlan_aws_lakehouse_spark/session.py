"""SparkSession factory with lakehouse-friendly defaults.

The reference delegates session setup to AWS Glue (GlueContext over SparkContext,
/root/reference/glue/bronze_to_silver_openweather.py:28-31). Here the session is
first-class: AQE on (runtime re-planning, skew-join handling, small-partition
coalescing), UTC pinned (oracle comparability + deterministic dt/hour derivation),
Arrow on (fast pandas interchange for the vectorized UDF path), and dynamic
partition overwrite (idempotent hour-scoped reloads, README.md:217-219).

At 100 TB these defaults matter: AQE coalesces the post-shuffle partition count to
data size instead of a static number, and dynamic partition overwrite keeps
re-runs scoped to the partitions actually written.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe (and desirable) to apply to an externally-created
# session at runtime. Everything here is a runtime-settable SQL conf.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet pushdown is on by default; keep explicit so a misconfigured
    # upstream session can't silently disable scan pruning.
    "spark.sql.parquet.filterPushdown": "true",
    # dt/hour partition values stay strings (reference DDL: VARCHAR(10)/
    # VARCHAR(2)); inference would read hour=09 back as 9.
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    # The driver's events table stores TIMESTAMP(NANOS), which Spark's parquet
    # reader rejects natively; read as long and convert in the catalog.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "rxlan_aws_lakehouse_spark") -> SparkSession:
    """Create (or fetch) a SparkSession tuned for local-mode testing.

    Local mode is a stand-in for a multi-executor cluster: parallelism and
    shuffle-partition counts are sized to cores, and all plan-shaping configs
    (AQE, pushdown, overwrite mode) are the ones a cluster deployment would use.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # In local mode every task IS process-local; the default 3 s
        # locality wait only stalls tasks whose preferred locations can't
        # match (e.g. a coalesce(1) over a parallelized collection waits
        # the full delay before scheduling — measured 4.5 s for a 1-row
        # write). On a real cluster this stays at its default.
        .config("spark.locality.wait", "0s")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from .py4j_hotpath import install_py4j_reflection_cache

    install_py4j_reflection_cache()
    return spark


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not create.

    The correctness driver passes its own SparkSession into ``queries()``
    callables; timezone and AQE behavior must not depend on how that session
    was built.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in some deployments; defaults are acceptable there
    from .py4j_hotpath import install_py4j_reflection_cache

    install_py4j_reflection_cache()
    return spark
