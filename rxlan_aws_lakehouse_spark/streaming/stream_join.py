"""Stream-stream join: two live streams joined on key + event-time range.

The last streaming join shape (after windowed aggregation, the stateful
sessionizer, and the stream-static dimension join in ``enrich.py``):
BOTH sides arrive incrementally, so Structured Streaming buffers each
side's rows in the state store until the other side's watermark proves no
more matches can arrive — the time-range condition in the join is what
BOUNDS that state (without it, both sides buffer forever; Spark rejects
unbounded stream-stream outer joins for exactly this reason).

Canonical use: attribution — join conversions to the clicks that preceded
them within an attribution window. State per key lives only
``attribution window + watermark delay``, so at 100 TB/day the state
store holds a bounded sliding slice of each stream, not the streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CLICK_SCHEMA = "user_id long, click_id long, ts timestamp"
CONVERSION_SCHEMA = "user_id long, conv_id long, ts timestamp, amount double"


def attribute_conversions(
    clicks: DataFrame,
    conversions: DataFrame,
    window_minutes: int = 30,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """INNER join: each conversion matched to every click by the same user
    in the preceding ``window_minutes``. Works identically on batch or
    streaming inputs; on streams the watermarks + the range predicate let
    Spark evict buffered rows once the other side's watermark passes
    ``click_ts + window`` (the state-bound contract).
    """
    c = clicks.withWatermark("ts", watermark_delay).select(
        "user_id", "click_id", F.col("ts").alias("click_ts")
    )
    v = conversions.withWatermark("ts", watermark_delay).select(
        "user_id", "conv_id", F.col("ts").alias("conv_ts"), "amount"
    )
    return v.join(
        c,
        (v.user_id == c.user_id)
        & (F.col("click_ts") <= F.col("conv_ts"))
        & (
            F.col("conv_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")
        ),
    ).select(
        v.user_id.alias("user_id"),
        "conv_id",
        "click_id",
        "click_ts",
        "conv_ts",
        "amount",
    )


def run_attribution(
    spark: SparkSession,
    clicks_dir: str,
    conversions_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_minutes: int = 30,
    watermark_delay: str = "10 minutes",
    available_now: bool = True,
):
    """File-source streams (NDJSON landing dirs) -> attribution join ->
    parquet sink. Returns the StreamingQuery."""
    clicks = spark.readStream.schema(CLICK_SCHEMA).json(clicks_dir)
    convs = spark.readStream.schema(CONVERSION_SCHEMA).json(conversions_dir)
    joined = attribute_conversions(
        clicks, convs, window_minutes=window_minutes,
        watermark_delay=watermark_delay,
    )
    writer = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
