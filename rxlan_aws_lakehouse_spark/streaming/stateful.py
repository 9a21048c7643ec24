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


SESSION_STATE_SCHEMA = "start_ms long, end_ms long, n long"
SESSION_OUTPUT_SCHEMA = (
    "city string, session_start timestamp, session_end timestamp, n_events long"
)


def make_session_fn(gap_ms: int):
    """Stateful sessionizer with EVENT-TIME timeout.

    Per key: accumulate (start, end, count); arm a timeout at
    (session end + gap). When the watermark passes that point the state
    times out — the closed session is emitted and the state cleared. This
    is the hand-rolled equivalent of session_window, demonstrating custom
    eviction semantics (emit-on-close rather than emit-on-update); the
    same skeleton carries any custom state machine (fraud windows,
    per-user rate trackers, ...).
    """

    def emit(key, sessions):
        import pandas as pd

        return pd.DataFrame(
            {
                "city": [key[0]] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="ms") for s, _e, _n in sessions],
                "session_end": [pd.Timestamp(e, unit="ms") for _s, e, _n in sessions],
                "n_events": [n for _s, _e, n in sessions],
            }
        )

    def update(key, pdfs, state):
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield emit(key, [(start_ms, end_ms, n)])
            return

        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(v) for v in pdf["ts"].astype("int64") // 1_000_000)
        ts_list.sort()

        if state.exists:
            start_ms, end_ms, n = state.get
        else:
            start_ms, end_ms, n = None, None, 0

        closed = []
        for t in ts_list:
            if n and t > end_ms + gap_ms:
                # gap exceeded by DATA: close the old session immediately
                closed.append((start_ms, end_ms, n))
                start_ms, end_ms, n = t, t, 1
            else:
                start_ms = t if start_ms is None else min(start_ms, t)
                end_ms = t if end_ms is None else max(end_ms, t)
                n += 1
        if n:
            state.update((start_ms, end_ms, n))
            # close by WATERMARK when no later data arrives
            state.setTimeoutTimestamp(end_ms + gap_ms)
        yield emit(key, closed)

    return update


def sessionize_stateful(decoded: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessions that emit ONLY when closed by the watermark."""
    return (
        decoded.select("city", "ts")
        .groupBy("city")
        .applyInPandasWithState(
            make_session_fn(gap_minutes * 60 * 1000),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize(
    spark: Any,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
):
    from .cdc import DDB_EVENT_SCHEMA, cdc_transform

    raw = spark.readStream.schema(DDB_EVENT_SCHEMA).json(landing_dir)
    sessions = sessionize_stateful(cdc_transform(raw), gap_minutes=gap_minutes)
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
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
