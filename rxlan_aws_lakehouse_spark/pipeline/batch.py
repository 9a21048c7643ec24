"""The batch ETL entry point — the reference's flagship path (SURVEY.md §3.1)
as one declarative plan with a single materialization.

The reference runs >=3 full passes over bronze per job (two count() gates
plus the write, no cache — glue/bronze_to_silver_openweather.py:63,104,143).
Here the counts ride the write via ``observe()``: one pass, same telemetry.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from .bronze import read_bronze, split_corrupt
from .gold import write_gold
from .silver import expand_payload_column, normalize, validate


@dataclass
class BatchMetrics:
    input_rows: int
    good_rows: int
    quarantined_rows: int


def run_batch(
    spark: SparkSession,
    bronze_path: str,
    gold_path: str,
    dt: str | None = None,
    hour: str | None = None,
    quarantine_path: str | None = None,
    infer: bool = False,
) -> BatchMetrics:
    """bronze -> expand -> normalize -> validate -> gold, hour-scoped.

    Returns reconciliation counts (the reference's CloudWatch counters,
    observed on the write job itself — no extra actions).
    """
    df = read_bronze(spark, bronze_path, dt=dt, hour=hour, infer=infer)
    df, corrupt = split_corrupt(df)
    if quarantine_path is not None:
        # rename: "_corrupt_record" is reserved by the JSON reader, so a
        # round-trip of the quarantine file would null it out. The city/
        # fetched_at_utc context columns also keep a real data column in the
        # plan — Spark rejects scans whose only referenced data column is
        # the internal corrupt-record column.
        corrupt.select(
            F.col("_corrupt_record").alias("corrupt_line"),
            "city",
            "fetched_at_utc",
            "dt",
            "hour",
        ).write.mode("append").json(f"{quarantine_path}/corrupt")
    df = expand_payload_column(df)
    silver = validate(normalize(df))
    if quarantine_path is not None:
        # two sinks (gold + invalid) read silver; persist so the bronze->
        # silver plan runs once, not once per sink
        silver = silver.persist()

    obs = Observation("batch_metrics")
    observed = silver.observe(
        obs,
        F.count(F.lit(1)).alias("input_rows"),
        F.sum((F.size("validation_errors") == 0).cast("long")).alias("good_rows"),
    )
    good = observed.filter(F.size("validation_errors") == 0).drop("validation_errors")
    write_gold(good, gold_path)
    got = obs.get
    input_rows = int(got["input_rows"])
    good_rows = int(got["good_rows"] or 0)

    if quarantine_path is not None:
        bad = silver.filter(F.size("validation_errors") > 0).withColumn(
            "validation_errors", F.to_json("validation_errors")
        )
        # separate subdir: mixing a partitioned layout with the corrupt/
        # subdir at one root would conflict at read time
        bad.write.mode("append").partitionBy("dt", "hour").json(
            f"{quarantine_path}/invalid"
        )
        silver.unpersist()

    return BatchMetrics(
        input_rows=input_rows,
        good_rows=good_rows,
        quarantined_rows=input_rows - good_rows,
    )
