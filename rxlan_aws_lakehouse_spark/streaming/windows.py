"""Streaming window operators beyond the tumbling hourly window:
session windows and watermarked stream-stream joins.

Completes the Structured Streaming surface (SURVEY.md §2.9): the reference
only ever materializes hourly tumbling windows as directory partitions;
these are the operators its roadmap would need next — per-key activity
sessions and cross-stream correlation — expressed with native Spark
streaming primitives so state is watermark-bounded and executor-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str | None = None,
    key: str = "city",
    ts: str = "ts",
) -> DataFrame:
    """Gap-based session windows (native session_window, merging state).

    Works on a streaming or batch DataFrame; in streaming, the watermark
    closes sessions once event time passes (session end + delay), so state
    per key is bounded by active sessions, not history. This is the
    streaming twin of the batch two-window sessionization
    (queries/relational2.sessionize_events).

    ``watermark_delay=None`` assumes the input already carries a watermark
    (e.g. cdc_transform output) — Spark disallows redefining one.
    """
    if watermark_delay is not None:
        events = events.withWatermark(ts, watermark_delay)
    return (
        events
        .groupBy(F.session_window(F.col(ts), gap).alias("sw"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            key,
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    CURRENT state of the static side (re-read per batch for file-backed
    dims — the slowly-changing-dimension lookup pattern).

    No state, no watermark needed: the static side is finite, so Spark
    plans a plain (usually broadcast) join inside every micro-batch.
    """
    return stream.join(dim, on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Watermarked interval join: right rows within [left_ts - within,
    left_ts], per key — the streaming correlation pattern (e.g. purchase
    attributed to a preceding click).

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can expire buffered state: without the interval
    predicate a stream-stream join would buffer both streams forever.
    ``watermark_delay=None`` assumes both inputs are already watermarked.
    """
    l = (
        left.withWatermark(left_ts, watermark_delay) if watermark_delay else left
    ).alias("l")
    r = (
        right.withWatermark(right_ts, watermark_delay) if watermark_delay else right
    ).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")


def run_watermark_dedup(
    spark,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = "1 hour",
):
    """Multi-batch watermarked exact dedup (T5/T6 as a REAL streaming run):
    NDJSON ``{city, ts}`` landing files drain one-file-per-micro-batch
    (``maxFilesPerTrigger=1`` under ``Trigger.AvailableNow``, files ordered
    by modification time), so the event-time watermark genuinely ADVANCES
    between batches — unlike the single-batch CDC lane, where the initial
    watermark never moves. ``dropDuplicatesWithinWatermark`` then collapses
    at-least-once duplicates both within a batch and ACROSS batches, with
    state bounded by the watermark horizon instead of growing with history
    (the 100 TB property: keys expire ``delay`` past the frontier).

    Measured semantics this implementation relies on (Spark 4.1, pinned by
    tests/test_streaming_windows.py): rows are NEVER dropped for being
    below the watermark (the operator uses the watermark only for state
    eviction), and a duplicate whose original's ``ts + delay`` is still
    >= the current watermark is ALWAYS suppressed. Callers who want a
    batch-SQL-equivalent result therefore keep duplicates within ``delay``
    of their batch frontier — then the output is exactly
    ``SELECT DISTINCT city, ts`` over the landed rows.
    """
    stream = (
        spark.readStream.schema("city string, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(landing_dir)
        .select("city", F.to_timestamp("ts").alias("ts"))
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["city", "ts"])
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
