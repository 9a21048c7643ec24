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

from ..catalog import load, local_df
from ..streaming.cdc import forward_cdc
from ..streaming.stateful import run_sessionize
from ..scratch import mkscratch as _mkscratch

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
    work = _mkscratch("cdc_stream_")
    landing, out_dir, ckpt = f"{work}/landing", f"{work}/out", f"{work}/ckpt"
    _envelopes(spark, sf_dir).coalesce(1).write.mode("overwrite").text(landing)
    q = forward_cdc(spark, landing, out_dir, ckpt, available_now=True)
    q.awaitTermination()
    sink = spark.read.option("basePath", out_dir).json(out_dir)
    # dt/hour come back through partition-type inference (date / int) —
    # normalize to the strings the oracle emits so the schema compare holds
    return (
        sink.groupBy(
            F.col("dt").cast("string").alias("dt"),
            F.lpad(F.col("hour").cast("string"), 2, "0").alias("hour"),
        )
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
    work = _mkscratch("cdc_sessions_")
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


def streaming_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join under the driver's eye: the CDC stream enriched
    with a region dimension (broadcast join inside each micro-batch,
    ``streaming/enrich.py``), drained AvailableNow, aggregated per region.

    The dimension is fixture-derived and total (every synthesized city
    maps to a region), so the LEFT join is lossless and the result has an
    exact batch SQL description: city index i = user_id % 25, region =
    the fixture region with r_regionkey = i % 5.
    """
    from ..streaming.enrich import enrich_stream

    work = _mkscratch("cdc_enrich_")
    landing, out_dir, ckpt = f"{work}/landing", f"{work}/out", f"{work}/ckpt"
    _envelopes(spark, sf_dir).coalesce(1).write.mode("overwrite").text(landing)
    region = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    dim = (
        spark.range(25)
        .select(
            F.concat(F.lit("City"), F.col("id").cast("string")).alias("city"),
            (F.col("id") % 5).alias("r_regionkey"),
        )
        .join(region, "r_regionkey")
        .select("city", F.col("r_name").alias("region"))
    )
    q = enrich_stream(spark, landing, out_dir, ckpt, dim, on="city")
    q.awaitTermination()
    sink = spark.read.parquet(out_dir)
    # counts only: the watermark dedup keeps an ARBITRARY row per
    # (city, ts) key, so value columns (e.g. temp) of a collided key are
    # nondeterministic — sf0.1 has exactly one such key
    return (
        sink.groupBy("region")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("city").alias("n_cities"),
        )
        .orderBy("region")
    )


def streaming_stream_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM join under the driver's eye: clicks and purchases from
    the events fixture land as two NDJSON streams, the attribution join
    (``streaming/stream_join.py`` — key + 30-minute event-time range,
    watermarks on both sides bounding state) drains AvailableNow, and the
    matched pairs aggregate per conversion day.

    Deterministic: one landing file per side -> one micro-batch, the
    initial watermark drops nothing, and an inner range join of complete
    inputs is exactly its batch SQL description.
    """
    from ..streaming.stream_join import run_attribution

    work = _mkscratch("stream_join_")
    clicks_dir, convs_dir = f"{work}/clicks", f"{work}/convs"
    out_dir, ckpt = f"{work}/out", f"{work}/ckpt"
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < _N_EVENTS)
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts")
    e.filter(F.col("event_type") == "click").select(
        F.to_json(
            F.struct("user_id", F.col("event_id").alias("click_id"), iso)
        ).alias("value")
    ).coalesce(1).write.mode("overwrite").text(clicks_dir)
    e.filter(F.col("event_type") == "purchase").select(
        F.to_json(
            F.struct(
                "user_id",
                F.col("event_id").alias("conv_id"),
                iso,
                F.round("value", 2).alias("amount"),
            )
        ).alias("value")
    ).coalesce(1).write.mode("overwrite").text(convs_dir)
    q = run_attribution(spark, clicks_dir, convs_dir, out_dir, ckpt)
    q.awaitTermination()
    pairs = spark.read.schema(
        "user_id long, conv_id long, click_id long, "
        "click_ts timestamp, conv_ts timestamp, amount double"
    ).parquet(out_dir)
    return (
        pairs.groupBy(F.date_format("conv_ts", "yyyy-MM-dd").alias("conv_day"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("conv_id").alias("n_conversions"),
            F.countDistinct("click_id").alias("n_clicks"),
            F.round(F.sum("amount"), 2).alias("attributed_amount"),
        )
        .orderBy("conv_day")
    )


def streaming_watermark_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark dedup as a MULTI-BATCH streaming run (T5/T6 under the
    driver gate, r7 verdict task 5): per-day landing files drain one per
    micro-batch, so the watermark advances between batches and
    ``dropDuplicatesWithinWatermark`` exercises cross-batch state, not
    just in-batch distinct.

    Synthesized arrival schedule from the events fixture (event_id < 2000,
    ts < 2024-01-04, city = City{user_id%25}, second-floored ts):
      - file d carries day d's rows, mtime-ordered so batch order = day order;
      - event_id % 7 == 0 rows are doubled IN-FILE (in-batch duplicates);
      - rows with event_id % 9 == 0 in a day's LAST HOUR are replayed in
        the next file (cross-batch at-least-once duplicates — their
        originals' ts + 1h delay is past the next batch's watermark, so
        their dedup state is guaranteed live: deterministically dropped);
      - rows with event_id % 13 == 0 in the last hour arrive one file LATE
        (out-of-order NEW data — kept: the operator never drops below-
        watermark input, it only expires state).
    Every duplicate is therefore suppressed and every original emitted:
    the closed form is exactly DISTINCT (city, ts), aggregated per day.
    """
    from ..streaming.windows import run_watermark_dedup
    import glob as _glob
    import os as _os
    import shutil as _shutil

    work = _mkscratch("wm_dedup_")
    landing, out_dir, ckpt = f"{work}/landing", f"{work}/out", f"{work}/ckpt"
    _os.makedirs(landing)
    e = load(spark, sf_dir, "events").filter(
        (F.col("event_id") < _N_EVENTS)
        & (F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp"))
    )
    base = e.select(
        "event_id",
        F.concat(F.lit("City"), (F.col("user_id") % 25).cast("string")).alias("city"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
        F.dayofmonth("ts").alias("day"),
        (F.hour("ts") == 23).alias("last_hour"),
    )
    late = F.col("last_hour") & (F.col("event_id") % 13 == 0)
    dup_infile = F.col("event_id") % 7 == 0
    replay = F.col("last_hour") & (F.col("event_id") % 9 == 0)
    sched = base.select(
        "city",
        "iso_ts",
        (F.col("day") + F.when(late, F.lit(1)).otherwise(F.lit(0))).alias("file_id"),
        "day",
        dup_infile.alias("dup_infile"),
        replay.alias("replay"),
    )
    arrivals = sched.select("city", "iso_ts", "file_id").unionByName(
        sched.filter("dup_infile").select("city", "iso_ts", "file_id")
    ).unionByName(
        sched.filter("replay").select(
            "city", "iso_ts", (F.col("day") + 1).alias("file_id")
        )
    )
    rows = F.to_json(F.struct("city", F.col("iso_ts").alias("ts")))
    for i, fid in enumerate(sorted(
        r["file_id"] for r in arrivals.select("file_id").distinct().collect()
    )):
        tmp = f"{work}/tmp{fid}"
        arrivals.filter(F.col("file_id") == fid).select(
            rows.alias("value")
        ).coalesce(1).write.mode("overwrite").text(tmp)
        part = _glob.glob(f"{tmp}/part-*")[0]
        dst = f"{landing}/b{fid:02d}.json"
        _shutil.move(part, dst)
        _os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    q = run_watermark_dedup(spark, landing, out_dir, ckpt, delay="1 hour")
    q.awaitTermination()
    sink = spark.read.schema("city string, ts timestamp").parquet(out_dir)
    return (
        sink.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("city").alias("n_cities"),
            F.countDistinct(F.hour("ts")).alias("n_hours"),
        )
        .orderBy("dt")
    )


def streaming_replay_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replayable Kinesis-shaped stream source under the driver gate
    (round 9, r8 verdict task 7): events become JSON records in a
    file-backed shard log (4 shards, per-shard sequence numbers —
    ``sources/replay_source.py``), consumed via
    ``readStream.format("replaylog")`` across TWO runs sharing one
    checkpoint: run 1 is CAPPED (``maxSeqsPerTrigger``) so it stops with
    a backlog outstanding — a forced mid-stream cutoff — then a second
    tranche lands and run 2 drains everything from the checkpointed
    offsets. The per-day aggregate of what the SINK holds must equal
    DuckDB's closed form over the fixture: any lost record (offset
    skipped past an undrained range) or duplicate (redelivery past a
    committed offset) breaks the hash. This is the at-least-once +
    replay semantics the TCP socket source (``streaming/net.py``)
    structurally cannot give."""
    import json as _json
    import os as _os

    from ..sources.replay_source import ReplayLog, register_replay_source

    register_replay_source(spark)
    work = _mkscratch("replaylog_")
    try:
        root = f"{work}/log"
        _os.makedirs(root)
        log = ReplayLog(root, n_shards=4)
        rows = (
            load(spark, sf_dir, "events")
            .filter(F.col("event_id") < 3000)
            .select(
                "user_id",
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("t"),
                "value",
            )
            .collect()
        )
        recs = [
            (
                r["user_id"],
                _json.dumps(
                    {"u": r["user_id"], "t": r["t"], "v": r["value"]}
                ),
            )
            for r in rows
        ]
        early = [(k, d) for k, d in recs if _json.loads(d)["t"] < "2024-01-15"]
        late = [(k, d) for k, d in recs if _json.loads(d)["t"] >= "2024-01-15"]
        log.put_many(early)
        sink, ckpt = f"{work}/sink", f"{work}/ckpt"

        def drain(**opts) -> None:
            reader = spark.readStream.format("replaylog").option(
                "startingPosition", "earliest"
            )
            for k, v in opts.items():
                reader = reader.option(k, str(v))
            q = (
                reader.load(root)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # capped run: consumes at most 100 seqs/shard, leaves a backlog
        drain(maxSeqsPerTrigger=100)
        log.put_many(late)
        drain()  # uncapped: backlog + fresh tranche, exactly once
        parsed = (
            spark.read.parquet(sink)
            .select(
                F.from_json(
                    "data", "u bigint, t timestamp, v double"
                ).alias("r")
            )
            .select("r.*")
        )
        out = (
            parsed.groupBy(F.date_format("t", "yyyy-MM-dd").alias("dt"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("u").alias("n_users"),
                F.round(F.sum("v"), 2).alias("total_value"),
            )
            .orderBy("dt")
        )
        final = out.collect()
        return local_df(spark, final, out.schema)
    finally:
        import shutil as _shutil

        _shutil.rmtree(work, ignore_errors=True)


def streaming_session_window_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NATIVE ``session_window`` aggregation as a MULTI-BATCH streaming
    run (round 9; the built-in merging-session-state twin of the
    ``applyInPandasWithState`` sessionizer already gated as
    ``streaming_sessionize_counts``): per-day landing files drain one
    per micro-batch (``maxFilesPerTrigger=1``), so the watermark
    advances between batches and sessions merge/close across batch
    boundaries, not inside one. A final sentinel file (one far-future
    event per city) pushes the watermark past every real session, so
    ALL of them emit; the sentinel's own sessions stay open in state and
    never reach the sink. The oracle recomputes the sessions with the
    plain gaps-and-islands SQL (new session when the gap >= 30 minutes —
    Spark's boundary semantics: an event at exactly session_end starts a
    new session)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from ..streaming.windows import session_windows

    work = _mkscratch("sesswin_")
    landing, out_dir, ckpt = f"{work}/landing", f"{work}/out", f"{work}/ckpt"
    _os.makedirs(landing)
    try:
        e = load(spark, sf_dir, "events").filter(
            (F.col("event_id") < _N_EVENTS)
            & (F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp"))
        )
        base = e.select(
            F.concat(
                F.lit("City"), (F.col("user_id") % 25).cast("string")
            ).alias("city"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
            F.dayofmonth("ts").alias("day"),
        )
        rows = F.to_json(F.struct("city", F.col("iso_ts").alias("ts")))
        days = sorted(
            r["day"] for r in base.select("day").distinct().collect()
        )
        for i, d in enumerate(days):
            tmp = f"{work}/tmp{d}"
            base.filter(F.col("day") == d).select(rows.alias("value")) \
                .coalesce(1).write.mode("overwrite").text(tmp)
            part = _glob.glob(f"{tmp}/part-*")[0]
            dst = f"{landing}/b{d:02d}.json"
            _shutil.move(part, dst)
            _os.utime(dst, (1_700_000_000 + i * 60,) * 2)
        # sentinel: one far-future row per city -> watermark passes every
        # real session; the sentinel sessions themselves never close
        base.select("city").distinct().select(
            F.to_json(
                F.struct(
                    "city", F.lit("2024-02-01T00:00:00").alias("ts")
                )
            ).alias("value")
        ).coalesce(1).write.mode("overwrite").text(f"{work}/tmpz")
        dst = f"{landing}/zz_sentinel.json"
        _shutil.move(_glob.glob(f"{work}/tmpz/part-*")[0], dst)
        _os.utime(dst, (1_700_000_000 + 100 * 60,) * 2)
        raw = (
            spark.readStream.format("json")
            .schema("city string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .load(landing)
        )
        sess = session_windows(
            raw, gap="30 minutes", watermark_delay="1 hour"
        )
        q = (
            sess.select(
                "city", "session_start", "session_end", "n_events",
                "first_ts", "last_ts",
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        sink = spark.read.schema(
            "city string, session_start timestamp, session_end timestamp, "
            "n_events long, first_ts timestamp, last_ts timestamp"
        ).parquet(out_dir)
        out = (
            sink.groupBy("city")
            .agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.sum("n_events").alias("n_events"),
                F.max(
                    F.unix_timestamp("last_ts")
                    - F.unix_timestamp("first_ts")
                ).alias("max_session_sec"),
            )
            .orderBy("city")
        )
        final = out.collect()
        return local_df(spark, final, out.schema)
    finally:
        _shutil.rmtree(work, ignore_errors=True)

def streaming_reshard_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kinesis resharding end-to-end under the driver gate (round 10):
    a 2-shard replay log takes a capped first drain (backlog left on
    both shards), then a SPLIT of shard 0 (closed at its frontier, two
    children owning the hash-range halves) with a second tranche routed
    by key range, then — after the split drains — a MERGE of the two
    children with a third tranche landing in the merged shard. Five
    checkpointed AvailableNow runs drain it all; the reader's
    parent-drain rule orders every handoff (children held until the
    closed parent is consumed through its close sequence). The per-day
    aggregate of the SINK must equal DuckDB's closed form over the
    fixture slice: a record lost at either reshard boundary, or
    redelivered past a committed offset, breaks the hash."""
    import json as _json
    import os as _os

    from ..sources.replay_source import ReplayLog, register_replay_source

    register_replay_source(spark)
    work = _mkscratch("reshard_")
    try:
        root = f"{work}/log"
        _os.makedirs(root)
        log = ReplayLog(root, n_shards=2)
        rows = (
            load(spark, sf_dir, "events")
            .filter(
                (F.col("event_id") >= 3000) & (F.col("event_id") < 5000)
            )
            .select(
                "user_id",
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("t"),
                "value",
            )
            .collect()
        )
        recs = [
            (
                r["user_id"],
                _json.dumps(
                    {"u": r["user_id"], "t": r["t"], "v": r["value"]}
                ),
            )
            for r in rows
        ]
        t1 = [x for x in recs if _json.loads(x[1])["t"] < "2024-01-10"]
        t2 = [
            x
            for x in recs
            if "2024-01-10" <= _json.loads(x[1])["t"] < "2024-01-20"
        ]
        t3 = [x for x in recs if _json.loads(x[1])["t"] >= "2024-01-20"]
        log.put_many(t1)
        sink, ckpt = f"{work}/sink", f"{work}/ckpt"

        # r17 (guide §4 — the Python boundary): each readStream frame
        # construction spawns a fresh create_data_source worker (~0.7 s
        # of interpreter+pyspark import), and the four uncapped drains
        # use IDENTICAL reader options — build that frame ONCE and
        # reuse it. Shard discovery is per-RUN (the runner re-calls
        # streamReader at every start), so the reused plan sees each
        # reshard; spawn-count probe: create_data_source 5 -> 2 per
        # lane pass, exactly-once and the parent-drain ordering
        # unchanged (oracle-checked).
        def drain(frame) -> None:
            q = (
                frame.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        capped = (
            spark.readStream.format("replaylog")
            .option("startingPosition", "earliest")
            .option("maxSeqsPerTrigger", "40")
            .load(root)
        )
        uncapped = (
            spark.readStream.format("replaylog")
            .option("startingPosition", "earliest")
            .load(root)
        )
        drain(capped)  # capped: backlog outstanding
        c1, c2 = log.split_shard(log.shards[0])
        log.put_many(t2)  # hash-range routed: children + shard 1
        drain(uncapped)  # parents drain; children HELD
        drain(uncapped)  # children released
        merged = log.merge_shards(c1, c2)
        log.put_many(t3)  # all t3 keys owned by the merged child
        drain(uncapped)  # children drain to close; merged HELD
        drain(uncapped)  # merged released
        parsed = (
            spark.read.parquet(sink)
            .select(
                F.from_json(
                    "data", "u bigint, t timestamp, v double"
                ).alias("r")
            )
            .select("r.*")
        )
        out = (
            parsed.groupBy(F.date_format("t", "yyyy-MM-dd").alias("dt"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("u").alias("n_users"),
                F.round(F.sum("v"), 2).alias("total_value"),
            )
            .orderBy("dt")
        )
        final = out.collect()
        return local_df(spark, final, out.schema)
    finally:
        import shutil as _shutil

        _shutil.rmtree(work, ignore_errors=True)


QUERIES = {
    "streaming_cdc_counts": streaming_cdc_counts,
    "streaming_sessionize_counts": streaming_sessionize_counts,
    "streaming_join_counts": streaming_join_counts,
    "streaming_stream_join_counts": streaming_stream_join_counts,
    "streaming_watermark_dedup_counts": streaming_watermark_dedup_counts,
    "streaming_replay_counts": streaming_replay_counts,
    "streaming_reshard_counts": streaming_reshard_counts,
    "streaming_session_window_counts": streaming_session_window_counts,
}

# Batch-equivalent oracles: both runs drain DETERMINISTIC synthesized
# envelopes in one AvailableNow batch, so the RESULT (not the execution)
# has an exact SQL description over the same events fixture. The envelope
# synthesis inverts to: event_id < 2000, ts < 2024-01-03, MODIFY rows
# (event_id % 10 = 0) filtered, second-floored timestamps (the ISO
# round-trip), at-least-once duplicates collapsed by DISTINCT (city, ts) —
# exactly what the watermark dedup does to a single batch.
_ENVELOPE_BASE = """
  SELECT DISTINCT 'City' || CAST(user_id % 25 AS VARCHAR) AS city,
         date_trunc('second', CAST(ts AS TIMESTAMP)) AS tss
  FROM events
  WHERE event_id < 2000
    AND ts < TIMESTAMP '2024-01-03 00:00:00'
    AND event_id % 10 <> 0
"""

ORACLE: dict[str, str] = {
    "streaming_cdc_counts": f"""
        WITH base AS ({_ENVELOPE_BASE})
        SELECT strftime(tss, '%Y-%m-%d') AS dt,
               strftime(tss, '%H') AS hour,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT city) AS BIGINT) AS n_cities
        FROM base
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    # A session emits either CLOSED BY DATA (a later event of its city
    # exceeds the 30-minute gap inside the drained batch) or TIMED OUT by
    # the final AvailableNow batch, whose watermark is the global max
    # event time minus the 10-minute delay: states with
    # session_end + gap < watermark fire; younger trailing sessions stay
    # in state unemitted.
    "streaming_sessionize_counts": f"""
        WITH base AS ({_ENVELOPE_BASE}),
        flagged AS (
          SELECT city, tss,
                 CASE WHEN lag(tss) OVER w IS NULL
                        OR epoch(tss) - epoch(lag(tss) OVER w) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM base
          WINDOW w AS (PARTITION BY city ORDER BY tss)
        ), sess AS (
          SELECT city, tss,
                 sum(new_sess) OVER (PARTITION BY city ORDER BY tss
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        ), agg AS (
          SELECT city, sid, min(tss) AS session_start,
                 max(tss) AS session_end, count(*) AS n_events
          FROM sess GROUP BY city, sid
        ), closed AS (
          SELECT * FROM (
            SELECT agg.*, max(sid) OVER (PARTITION BY city) AS max_sid,
                   (SELECT max(tss) - INTERVAL 10 MINUTE FROM base) AS wm
            FROM agg
          ) WHERE sid < max_sid
             OR session_end + INTERVAL 30 MINUTE < wm
        )
        SELECT city,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(max(epoch(session_end) - epoch(session_start)) AS BIGINT)
                 AS max_session_sec
        FROM closed GROUP BY city ORDER BY city
    """,
    # Stream-static join: the dimension is total over the 25 synthesized
    # cities (region key = city index % 5), so the LEFT join is lossless
    # and the batch description is the envelope base joined to the region
    # fixture the same way.
    "streaming_join_counts": f"""
        WITH base AS ({_ENVELOPE_BASE}),
        keyed AS (
          SELECT city,
                 CAST(substr(city, 5) AS INTEGER) % 5 AS r_regionkey
          FROM base
        )
        SELECT r.r_name AS region,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT k.city) AS BIGINT) AS n_cities
        FROM keyed k JOIN region r USING (r_regionkey)
        GROUP BY 1
        ORDER BY 1
    """,
    # Stream-stream attribution join: inner join of complete single-batch
    # inputs == the same join in batch SQL. Timestamps second-floored by
    # the ISO round-trip through the NDJSON landing files.
    "streaming_stream_join_counts": f"""
        WITH clicks AS (
          SELECT user_id, event_id AS click_id,
                 date_trunc('second', CAST(ts AS TIMESTAMP)) AS click_ts
          FROM events
          WHERE event_id < {_N_EVENTS} AND event_type = 'click'
        ), convs AS (
          SELECT user_id, event_id AS conv_id,
                 date_trunc('second', CAST(ts AS TIMESTAMP)) AS conv_ts,
                 round(value, 2) AS amount
          FROM events
          WHERE event_id < {_N_EVENTS} AND event_type = 'purchase'
        )
        SELECT strftime(conv_ts, '%Y-%m-%d') AS conv_day,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
               CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks,
               round(sum(amount), 2) AS attributed_amount
        FROM convs v JOIN clicks c
          ON v.user_id = c.user_id
         AND c.click_ts <= v.conv_ts
         AND v.conv_ts <= c.click_ts + INTERVAL 30 MINUTE
        GROUP BY 1
        ORDER BY 1
    """,
}

# Watermark-dedup closed form: originals are never dropped (the operator
# never filters below-watermark input) and every injected duplicate —
# in-batch (%7 doubles) and cross-batch (last-hour %9 replays, whose
# originals' state is provably live at the next batch's watermark) — is
# suppressed, so the sink is exactly DISTINCT (city, second-floored ts)
# over the synthesized base. The %13 late arrivals are REORDERINGS of
# base rows, not additions, so they don't change the distinct set.
ORACLE["streaming_watermark_dedup_counts"] = """
    WITH base AS (
      SELECT DISTINCT 'City' || CAST(user_id % 25 AS VARCHAR) AS city,
             date_trunc('second', CAST(ts AS TIMESTAMP)) AS tss
      FROM events
      WHERE event_id < 2000
        AND ts < TIMESTAMP '2024-01-04 00:00:00'
    )
    SELECT strftime(tss, '%Y-%m-%d') AS dt,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT city) AS BIGINT) AS n_cities,
           CAST(count(DISTINCT extract(hour FROM tss)) AS BIGINT) AS n_hours
    FROM base
    GROUP BY 1
    ORDER BY 1
"""

# Replay-source closed form: the shard log carries every event_id < 3000
# row exactly once by construction (dense per-shard sequence numbers),
# and the two-run checkpointed consumption must deliver exactly that set
# — any loss or redelivery past a committed offset changes a count or a
# sum. Timestamps ride as second-floored ISO strings (dt unaffected).
# Reshard closed form: splits and merges move WHERE records live, never
# WHICH records exist — the five checkpointed drains must deliver the
# fixture slice exactly once through both reshard boundaries.
ORACLE["streaming_reshard_counts"] = """
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE event_id >= 3000 AND event_id < 5000
    GROUP BY 1
    ORDER BY 1
"""

ORACLE["streaming_replay_counts"] = """
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE event_id < 3000
    GROUP BY 1
    ORDER BY 1
"""

# Native session_window closed form (gaps and islands): new session when
# the gap since the previous event of the same city is >= 30 minutes —
# Spark's boundary semantics ([start, last+gap): an event AT last+gap
# starts a new session). Session length is measured between first and
# last EVENT (not the gap-padded window end). Sentinel rows never emit.
ORACLE["streaming_session_window_counts"] = """
    WITH rows_in AS (
      SELECT 'City' || CAST(user_id % 25 AS VARCHAR) AS city,
             date_trunc('second', CAST(ts AS TIMESTAMP)) AS tss
      FROM events
      WHERE event_id < 2000
        AND ts < TIMESTAMP '2024-01-04 00:00:00'
    ),
    flagged AS (
      SELECT city, tss,
             CASE WHEN lag(tss) OVER w IS NULL
                       OR tss - lag(tss) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM rows_in
      WINDOW w AS (PARTITION BY city ORDER BY tss)
    ),
    sid AS (
      SELECT city, tss,
             sum(new_s) OVER (
               PARTITION BY city ORDER BY tss
               ROWS UNBOUNDED PRECEDING) AS s
      FROM flagged
    ),
    sessions AS (
      SELECT city, s,
             count(*) AS n_events,
             min(tss) AS first_ts,
             max(tss) AS last_ts
      FROM sid GROUP BY city, s
    )
    SELECT city,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(epoch(last_ts) - epoch(first_ts)) AS BIGINT)
             AS max_session_sec
    FROM sessions
    GROUP BY city
    ORDER BY city
"""
