"""Stream-static enrichment: a streaming join against a dimension table.

The reference's pipeline is single-entity (weather records keyed by city,
/root/reference/lambda/ddb_stream_forwarder/handler.py) — any per-city
metadata (region, tier, SLA) would have to be denormalized upstream. The
Spark-native answer is a STREAM-STATIC JOIN: the micro-batch stream joins
a bounded dimension DataFrame inside each batch, broadcast to every
executor — no state store, no shuffle of the stream, and the dimension
can be re-read per batch if it changes slowly.

This is the third streaming join shape (after the T1-T8 lane's windowed
aggregations and the stateful sessionizer): stream-static is the one
Structured Streaming supports with NO watermark bookkeeping, because the
static side is complete by definition — the right default for dimension
enrichment at any scale. (Stream-stream joins need watermarks on both
sides and state eviction; that shape lives with the stateful operators.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc import DDB_EVENT_SCHEMA, cdc_transform


def enrich_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    dim: DataFrame,
    on: str = "city",
    available_now: bool = True,
    watermark_delay: str = "10 minutes",
):
    """CDC envelopes -> decode/dedup (``cdc_transform``) -> broadcast join
    with ``dim`` on ``on`` -> parquet sink. Returns the StreamingQuery.

    The join is LEFT: a stream row with no dimension match passes through
    with NULL attributes (dropping it would make the sink's completeness
    depend on dimension freshness — annotate, don't drop, the same policy
    as the reference's range validation).
    """
    raw = spark.readStream.schema(DDB_EVENT_SCHEMA).json(landing_dir)
    decoded = cdc_transform(raw, watermark_delay=watermark_delay)
    enriched = decoded.join(F.broadcast(dim), on, "left")
    writer = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
