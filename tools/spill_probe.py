"""Spill-pressure probe (r9 verdict task 3): prove the heavy plans
SURVIVE memory pressure instead of assuming it.

local[32]/16g at sf0.1 never spills, but at 100 TB every big hash
aggregate and sort-merge join does — the question is whether the plans
degrade gracefully (spill to disk, bounded slowdown) or cliff-edge
(OOM). This probe runs under a CONSTRAINED heap
(``SPARK_GRAFT_DRIVER_MEM``, local mode: driver == executor) with the
Spark UI enabled, then reads per-stage ``memoryBytesSpilled`` /
``diskBytesSpilled`` off the UI REST API — the same counters the Spark
UI shows — and prints one JSON line per workload:

    {"workload": ..., "heap": ..., "wall_sec": ..., "spilled_mem_mb":
     ..., "spilled_disk_mb": ..., "rows": ...}

Workloads:
  * ``agg``  — forced-spill hash aggregate: 20-aggregate groupBy over
    sf1 lineitem (6M rows) with few shuffle partitions, so each task's
    hash map outgrows its execution-memory share.
  * ``smj``  — forced-spill sort-merge join: lineitem self-join on
    orderkey with broadcast disabled; the per-partition external sorts
    carry the pressure.
  * the 5 heaviest registry lanes by driver bench wall (BENCH_r09) at
    sf0.1, unchanged code paths under the constrained heap.

Usage:
    SPARK_GRAFT_DRIVER_MEM=1g python tools/spill_probe.py [workload ...]
(default: all workloads; results land in SCALING.md by hand)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.scratch/sf1")
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEAVY_LANES = [
    "sketch_countmin_topk",
    "sketch_quantile_rollup",
    "streaming_replay_counts",
    "emb_index_incremental",
    "txn_stream_writer_sink",
]


def get_session():
    from pyspark.sql import SparkSession

    from rxlan_aws_lakehouse_spark.session import (
        RUNTIME_CONFS,
        default_parallelism,
    )

    cpus = default_parallelism()
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spill-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "1g"),
        )
        .config("spark.ui.enabled", "true")  # REST API = spill counters
        .config("spark.ui.port", "4049")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return b.getOrCreate()


def stage_spill(spark) -> tuple[float, float]:
    """Total (memoryBytesSpilled, diskBytesSpilled) MB across all
    completed stages, via the UI REST API."""
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem / 1e6, disk / 1e6


def run_workload(spark, name: str) -> dict:
    from pyspark.sql import functions as F

    m0, d0 = stage_spill(spark)
    t0 = time.perf_counter()
    if name == "agg":
        li = spark.read.parquet(os.path.join(SF1, "lineitem.parquet"))
        # few, fat partitions: each task's agg hash map must spill
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            aggs = []
            for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
                aggs += [
                    F.sum(c).alias(f"s_{c}"),
                    F.avg(c).alias(f"a_{c}"),
                    F.min(c).alias(f"mi_{c}"),
                    F.max(c).alias(f"ma_{c}"),
                    F.stddev(c).alias(f"sd_{c}"),
                ]
            rows = (
                li.groupBy("l_orderkey", "l_linenumber")
                .agg(*aggs)
                .count()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    elif name == "smj":
        li = spark.read.parquet(os.path.join(SF1, "lineitem.parquet"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            a = li.select("l_orderkey", "l_partkey", "l_extendedprice")
            b = li.select(
                F.col("l_orderkey").alias("r_orderkey"),
                F.col("l_suppkey").alias("r_suppkey"),
                F.col("l_shipdate").alias("r_shipdate"),
                F.col("l_returnflag").alias("r_flag"),
            )
            rows = (
                a.join(b, a.l_orderkey == b.r_orderkey)
                .where(F.col("l_partkey") % 10 == F.col("r_suppkey") % 10)
                .count()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    else:
        import __spark_entry__ as entrymod

        rows = entrymod.queries()[name](spark, SF01).count()
    wall = time.perf_counter() - t0
    m1, d1 = stage_spill(spark)
    return {
        "workload": name,
        "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "1g"),
        "wall_sec": round(wall, 2),
        "spilled_mem_mb": round(m1 - m0, 1),
        "spilled_disk_mb": round(d1 - d0, 1),
        "rows": rows,
    }


def main() -> None:
    names = sys.argv[1:] or (["agg", "smj"] + HEAVY_LANES)
    spark = get_session()
    for name in names:
        try:
            out = run_workload(spark, name)
        except Exception as e:  # noqa: BLE001
            out = {
                "workload": name,
                "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "1g"),
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
