"""Driver-visible streaming artifact.

The T1-T8 streaming lane is pytest-verified (the driver's oracle gate has
no streaming mode), but this module puts one real Structured Streaming run
under the driver's eye as a rows-only query: synthesize DDB-stream
envelopes from the ``events`` fixture table, run the actual CDC pipeline
(``streaming.cdc.forward_cdc`` — INSERT filter, typed decode, watermark
dedup, event-time dt/hour partitioning) with ``Trigger.AvailableNow``, and
return the sink's per-partition counts.

Deterministic by construction: AvailableNow drains the landing directory
and stops; the dedup key (city, ts) collapses the injected at-least-once
duplicates identically on every run; MODIFY envelopes are filtered. Fresh
temp dirs per call keep reruns independent (reference behavior:
lambda/ddb_stream_forwarder/handler.py + Firehose buffering,
README.md:147-154).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..streaming.cdc import forward_cdc
from ..streaming.stateful import run_sessionize

_N_EVENTS = 2000


def _attr_s(val):
    return F.struct(val.cast("string").alias("S"), F.lit(None).cast("string").alias("N"))


def _attr_n(val):
    return F.struct(F.lit(None).cast("string").alias("S"), val.cast("string").alias("N"))


def _envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture -> DDB-stream NEW_IMAGE envelopes (JSON strings).

    event_id % 10 == 0 becomes MODIFY (must be filtered); event_id % 7 == 0
    is emitted twice with distinct eventIDs (at-least-once duplicates the
    watermark dedup must collapse).
    """
    # bound BOTH the row count and the event-time span: dt/hour is the sink
    # partitioning, so an unbounded ts range would fan out into thousands of
    # tiny partition dirs (a listing problem, not a data problem)
    e = load(spark, sf_dir, "events").filter(
        (F.col("event_id") < _N_EVENTS)
        & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
    )
    base = e.select(
        F.col("event_id"),
        F.concat(F.lit("City"), (F.col("user_id") % 25).cast("string")).alias("city"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso_ts"),
        F.round(F.col("value"), 2).alias("temp"),
    )
    dups = base.filter(F.col("event_id") % 7 == 0).withColumn(
        "event_id", F.col("event_id") + 1_000_000
    )
    both = base.unionByName(dups)
    new_image = F.create_map(
        F.lit("app"), _attr_s(F.lit("rxlan")),
        F.lit("stage"), _attr_s(F.lit("dev")),
        F.lit("source"), _attr_s(F.lit("events_fixture")),
        F.lit("fetched_at_utc"), _attr_s(F.col("iso_ts")),
        F.lit("city"), _attr_s(F.col("city")),
        F.lit("country"), _attr_s(F.lit("US")),
        F.lit("lat"), _attr_n(F.lit(30.27)),
        F.lit("lon"), _attr_n(F.lit(-97.74)),
        F.lit("temp_c"), _attr_n(F.col("temp")),
        F.lit("feels_like_c"), _attr_n(F.col("temp")),
        F.lit("humidity"), _attr_n(F.lit(50)),
        F.lit("pressure"), _attr_n(F.lit(1013)),
        F.lit("wind_speed"), _attr_n(F.lit(3.5)),
    )
    env = F.struct(
        F.concat(F.lit("evt-"), F.col("event_id").cast("string")).alias("eventID"),
        F.when(F.col("event_id") % 10 == 0, F.lit("MODIFY"))
        .otherwise(F.lit("INSERT"))
        .alias("eventName"),
        F.struct(
            new_image.alias("NewImage"),
            F.lit(1709287500.0).alias("ApproximateCreationDateTime"),
        ).alias("dynamodb"),
    )
    return both.select(F.to_json(env).alias("value"))


def streaming_cdc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the CDC streaming pipeline end-to-end; per-dt/hour sink counts."""
    work = tempfile.mkdtemp(prefix="cdc_stream_")
    landing, out_dir, ckpt = f"{work}/landing", f"{work}/out", f"{work}/ckpt"
    _envelopes(spark, sf_dir).coalesce(1).write.mode("overwrite").text(landing)
    q = forward_cdc(spark, landing, out_dir, ckpt, available_now=True)
    q.awaitTermination()
    sink = spark.read.option("basePath", out_dir).json(out_dir)
    return (
        sink.groupBy("dt", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("city").alias("n_cities"),
        )
        .orderBy("dt", "hour")
    )


def streaming_sessionize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the STATEFUL streaming lane (applyInPandasWithState sessionizer,
    ``streaming/stateful.py``) under the driver's eye: synthesize envelopes,
    drain them in ONE AvailableNow batch, and aggregate the emitted sessions
    per city.

    Determinism: a single landing file -> a single micro-batch, so every
    session CLOSED BY DATA (a later event exceeding the 30-minute gap)
    emits in that batch, identically on every run; each city's trailing
    session stays in state awaiting a watermark that never comes — also
    identically on every run. The events fixture gives each city ~40 events
    over two days (mean gap ~36 min), so both session splits and multi-event
    sessions occur.
    """
    work = tempfile.mkdtemp(prefix="cdc_sessions_")
    landing, out_dir, ckpt = f"{work}/landing", f"{work}/out", f"{work}/ckpt"
    _envelopes(spark, sf_dir).coalesce(1).write.mode("overwrite").text(landing)
    q = run_sessionize(spark, landing, out_dir, ckpt, gap_minutes=30)
    q.awaitTermination()
    sessions = spark.read.schema(
        "city string, session_start timestamp, session_end timestamp, "
        "n_events long"
    ).parquet(out_dir)
    return (
        sessions.groupBy("city")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max(
                F.unix_timestamp("session_end")
                - F.unix_timestamp("session_start")
            ).alias("max_session_sec"),
        )
        .orderBy("city")
    )


QUERIES = {
    "streaming_cdc_counts": streaming_cdc_counts,
    "streaming_sessionize_counts": streaming_sessionize_counts,
}
ORACLE: dict[str, str] = {}  # genuinely non-SQL: streaming runs, rows-only
