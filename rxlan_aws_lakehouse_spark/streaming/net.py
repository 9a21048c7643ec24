"""Network (TCP socket) streaming source for the CDC pipeline.

The reference's stream transport is Kinesis (README.md:147-154) — a real
network source Spark reaches via the kinesis connector in production. That
connector isn't in this environment, but Spark's built-in ``socket`` source
IS a real network receiver (a TCP client reading newline-delimited records),
so this module runs the SAME CDC transform (``cdc.cdc_transform`` — INSERT
filter, typed decode, watermark dedup, event-time dt/hour) over live
network input instead of landing files. The transform is source-agnostic by
construction; swapping in Kinesis/Kafka means changing only the reader:

    spark.readStream.format("kinesis")... / .format("kafka")...

Caveats the docstrings are honest about: the socket source is
at-most-once (no replay — Spark documents it as not fault-tolerant), so
production transports stay Kinesis/Kafka; here it exists to prove the
pipeline's network path — connect, stream, decode, watermark — against a
real socket, not a directory listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc import DDB_EVENT_SCHEMA, cdc_transform


def cdc_from_socket(
    spark: SparkSession,
    host: str,
    port: int,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """DDB-stream envelopes over a live TCP socket -> the standard CDC
    transform. One JSON envelope per line, same wire shape the
    file-landing path decodes."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    env = raw.select(
        F.from_json("value", DDB_EVENT_SCHEMA).alias("e")
    ).select("e.*")
    return cdc_transform(env, watermark_delay=watermark_delay)


def run_cdc_socket(
    spark: SparkSession,
    host: str,
    port: int,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: float = 0.5,
):
    """Run the socket-fed CDC query into a parquet sink; returns the
    StreamingQuery (caller stops it — a socket has no AvailableNow:
    the source is unbounded until the peer closes)."""
    out = cdc_from_socket(spark, host, port)
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
