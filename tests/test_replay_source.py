"""Replayable Kinesis-shaped stream source (sources/replay_source.py).

What the socket source can't do and this must: REPLAY. Offsets are
per-shard sequence numbers over an immutable file-backed log, so
re-planning any (start, end] range — which is exactly what Spark does on
restart from a checkpoint whose last batch never committed — redelivers
the same records. Reference parity: the reference's transport is Kinesis
(/root/reference/README.md:147-154); these tests pin the semantics that
make such a transport production-usable: at-least-once redelivery,
exactly-once end-to-end behind a checkpointed sink, bounded catch-up."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.sources.replay_source import (
    ReplayLog,
    ReplayLogStreamReader,
    register_replay_source,
)


def _mk_log(tmp_path, n=100, shards=3):
    root = str(tmp_path / "log")
    os.makedirs(root)
    log = ReplayLog(root, n_shards=shards)
    log.put_many(
        [(i, json.dumps({"k": i, "v": i * 2})) for i in range(n)]
    )
    return log


def _drain(spark, root, ckpt, sink, **opts):
    reader = spark.readStream.format("replaylog")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(root)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return spark.read.parquet(sink)
    except Exception:
        return spark.range(0).select(F.col("id"))


def test_batch_read_and_sharding(spark, tmp_path):
    log = _mk_log(tmp_path, n=100, shards=3)
    register_replay_source(spark)
    df = spark.read.format("replaylog").load(log.root)
    assert df.count() == 100
    assert df.select("shard").distinct().count() == 3
    # per-shard seqs are dense from 1 (Kinesis sequence-number shape)
    for s, hi in log.frontier().items():
        seqs = sorted(
            r["seq"] for r in df.filter(F.col("shard") == s).collect()
        )
        assert seqs == list(range(1, hi + 1))


def test_stream_drains_then_continues_exactly_once(spark, tmp_path):
    log = _mk_log(tmp_path, n=100)
    register_replay_source(spark)
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "out")
    out = _drain(spark, log.root, ckpt, sink, startingPosition="earliest")
    assert out.count() == 100
    log.put_many([(i, json.dumps({"k": i})) for i in range(100, 130)])
    out = _drain(spark, log.root, ckpt, sink, startingPosition="earliest")
    # cumulative parquet sink: second run appended ONLY the fresh records
    assert out.count() == 130
    assert out.select("shard", "seq").distinct().count() == 130


def test_replanning_same_range_redelivers_identically(spark, tmp_path):
    """The at-least-once core: partitions(start, end) is a pure function
    of the log, so the same un-committed range replays bit-for-bit —
    the redelivery Spark relies on when a batch dies before commit."""
    log = _mk_log(tmp_path, n=60)
    start = {s: 0 for s in log.shards}
    end = log.frontier()

    def deliver():
        r = ReplayLogStreamReader({"path": log.root})
        recs = []
        for p in r.partitions(dict(start), dict(end)):
            recs.extend(r.read(p))
        return sorted(recs)

    first, second = deliver(), deliver()
    assert first == second and len(first) == 60


def test_forced_midstream_restart_no_loss_no_dup(spark, tmp_path):
    """Kill a CONTINUOUS query mid-backlog (cap forces multiple batches;
    stop after the first sink rows appear), restart from the same
    checkpoint, drain — every record delivered exactly once end-to-end."""
    log = _mk_log(tmp_path, n=90, shards=3)
    register_replay_source(spark)
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "out")
    q = (
        spark.readStream.format("replaylog")
        .option("startingPosition", "earliest")
        .option("maxSeqsPerTrigger", 5)  # 30/shard -> many micro-batches
        .load(log.root)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.time() + 60
    partial = 0
    while time.time() < deadline:
        try:
            partial = spark.read.parquet(sink).count()
        except Exception:
            partial = 0
        if partial >= 15:
            break
        time.sleep(0.2)
    q.stop()  # forced mid-stream death with backlog remaining
    assert 0 < partial < 90, partial
    # Python-source availableNow falls back to SINGLE-batch execution,
    # and a restart with the killed run's batch still pending re-runs
    # exactly that pending batch (its offsets were fixed at plan time)
    # and stops — so recovery is a sequence of restarts, each one batch.
    # Drain to stability: every extra run is just another forced
    # restart, which is the property under test.
    n = 0
    for _ in range(12):
        out = _drain(
            spark, log.root, ckpt, sink,
            startingPosition="earliest", maxSeqsPerTrigger=1000,
        )
        prev, n = n, out.count()
        if n == 90:
            break
        assert n >= prev  # monotone: restarts never lose sink rows
    rows = out.select("shard", "seq").collect()
    assert len(rows) == 90  # no loss, eventually drained
    assert len({(r["shard"], r["seq"]) for r in rows}) == 90  # no dups


def test_capped_catchup_is_bounded_per_batch(spark, tmp_path):
    """maxSeqsPerTrigger bounds every planned batch range — a consumer
    waking up behind a 100-record backlog never plans one giant batch."""
    log = _mk_log(tmp_path, n=100, shards=2)
    r = ReplayLogStreamReader(
        {"path": log.root, "maxSeqsPerTrigger": "10"}
    )
    start = r.initialOffset()
    seen = 0
    for _ in range(30):
        end = r.latestOffset()
        for p in r.partitions(dict(start), dict(end)):
            assert p.hi - p.lo <= 10
            seen += sum(1 for _rec in r.read(p))
        r.commit(end)
        start = end
        if seen == 100:
            break
    assert seen == 100


def test_new_shard_appears_midstream(spark, tmp_path):
    """Resharding: a shard dir created after the stream started is picked
    up at the next latestOffset and read from sequence 0."""
    log = _mk_log(tmp_path, n=40, shards=2)
    r = ReplayLogStreamReader({"path": log.root})
    start = r.initialOffset()
    end = r.latestOffset()
    n0 = sum(
        sum(1 for _x in r.read(p))
        for p in r.partitions(dict(start), dict(end))
    )
    assert n0 == 40
    os.makedirs(os.path.join(log.root, "shard=99"))
    ReplayLog(log.root).put_batch(
        "shard=99", [json.dumps({"k": i}) for i in range(7)]
    )
    start2 = end
    end2 = r.latestOffset()
    n1 = sum(
        sum(1 for _x in r.read(p))
        for p in r.partitions(dict(start2), dict(end2))
    )
    assert n1 == 7


def test_starting_position_latest_skips_history(spark, tmp_path):
    log = _mk_log(tmp_path, n=50)
    r = ReplayLogStreamReader(
        {"path": log.root, "startingPosition": "latest"}
    )
    start = r.initialOffset()
    assert start == log.frontier()
    log.put_many([(1, "fresh")])
    end = r.latestOffset()
    recs = [
        rec
        for p in r.partitions(dict(start), dict(end))
        for rec in r.read(p)
    ]
    assert [x[2] for x in recs] == ["fresh"]


def _hash_shard(log, key):
    """The open shard that owns crc32(key) under range routing."""
    import zlib

    from rxlan_aws_lakehouse_spark.sources.replay_source import _shard_meta

    h = zlib.crc32(str(key).encode())
    for s in log.open_shards():
        lo, hi = _shard_meta(os.path.join(log.root, s))["range"]
        if lo <= h < hi:
            return s
    raise AssertionError("no owner")


def test_split_shard_routing_and_closed_refuses_appends(tmp_path):
    log = _mk_log(tmp_path, n=40, shards=2)
    parent = log.shards[0]
    keys_of_parent = [
        k for k in range(200) if _hash_shard(log, k) == parent
    ]
    c1, c2 = log.split_shard(parent)
    assert sorted(log.open_shards()) == sorted(
        [s for s in log.shards if s != parent]
    )
    # the parent refuses further appends at its close sequence
    import pytest as _pytest

    with _pytest.raises(ValueError, match="closed at seq"):
        log.put_batch(parent, ["x"])
    # every key the parent owned now routes to exactly one CHILD
    for k in keys_of_parent[:50]:
        assert _hash_shard(log, k) in (c1, c2)
    # and a post-split put lands in children, never the parent
    from rxlan_aws_lakehouse_spark.sources.replay_source import (
        _shard_frontier,
        _shard_meta,
    )

    close_at = _shard_meta(os.path.join(log.root, parent))["closed_at"]
    log.put_many(
        [(k, json.dumps({"k": k})) for k in keys_of_parent[:20]]
    )
    assert _shard_frontier(os.path.join(log.root, parent)) == close_at


def test_split_midstream_checkpoint_restart_no_loss_no_dup(
    spark, tmp_path
):
    """r9 verdict task 4: a split lands MID-STREAM with the parent only
    partially drained (capped run), then the stream restarts from its
    checkpoint. The child must stay HELD until the parent is consumed
    through its close sequence — parent records land in strictly
    earlier batches than any child record — and across all runs every
    record is delivered exactly once."""
    register_replay_source(spark)
    log = _mk_log(tmp_path, n=120, shards=2)
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "sink")

    # run 1: capped — stops with a per-shard backlog outstanding
    got = _drain(spark, log.root, ckpt, sink, maxSeqsPerTrigger=30)
    n1 = got.count()
    assert 0 < n1 < 120

    parent = log.shards[0]
    c1, c2 = log.split_shard(parent)
    # post-split tranche: keys hash into children (and shard=01)
    log.put_many(
        [(k, json.dumps({"k": k, "v": 0})) for k in range(120, 200)]
    )

    # run 2 (same checkpoint): ONE batch (availableNow fallback). The
    # parent still has undrained records, so both children must be held
    # at offset 0 in this batch.
    got = _drain(spark, log.root, ckpt, sink)
    delivered_shards = {
        r["shard"] for r in got.select("shard").distinct().collect()
    }
    assert c1 not in delivered_shards and c2 not in delivered_shards
    # ...but the parent is now fully drained to its close sequence
    from rxlan_aws_lakehouse_spark.sources.replay_source import (
        _shard_meta,
    )

    close_at = _shard_meta(os.path.join(log.root, parent))["closed_at"]
    assert (
        got.filter(F.col("shard") == parent)
        .agg(F.max("seq"))
        .collect()[0][0]
        == close_at
    )

    # run 3: parents drained -> children released
    got = _drain(spark, log.root, ckpt, sink)
    per_shard = {
        r["shard"]: r["n"]
        for r in got.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert c1 in per_shard or c2 in per_shard
    # exactly once overall: every (shard, seq) distinct, total = 200
    assert got.count() == 200
    assert got.select("shard", "seq").distinct().count() == 200
    # and the payload key set is exactly 0..199
    keys = sorted(
        json.loads(r["data"])["k"] for r in got.collect()
    )
    assert keys == list(range(200))


def test_merge_shards_held_until_both_parents_drain(spark, tmp_path):
    register_replay_source(spark)
    root = str(tmp_path / "log")
    os.makedirs(root)
    log = ReplayLog(root, n_shards=2)
    log.put_many([(i, json.dumps({"k": i})) for i in range(60)])
    a, b = log.shards
    merged = log.merge_shards(a, b)
    log.put_many([(i, json.dumps({"k": i})) for i in range(60, 90)])
    from rxlan_aws_lakehouse_spark.sources.replay_source import (
        _shard_frontier,
    )

    # all post-merge records went to the merged child
    assert _shard_frontier(os.path.join(root, merged)) == 30
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    # capped run: neither parent fully drains -> child held
    got = _drain(spark, log.root, ckpt, sink, maxSeqsPerTrigger=10)
    assert merged not in {
        r["shard"] for r in got.select("shard").distinct().collect()
    }
    # uncapped runs: parents drain, then the child releases
    got = _drain(spark, log.root, ckpt, sink)
    got = _drain(spark, log.root, ckpt, sink)
    assert got.count() == 90
    assert got.select("shard", "seq").distinct().count() == 90
    assert (
        got.filter(F.col("shard") == merged).count() == 30
    )


def test_merge_requires_adjacent_ranges(tmp_path):
    import pytest as _pytest

    root = str(tmp_path / "log")
    os.makedirs(root)
    log = ReplayLog(root, n_shards=3)
    s = log.shards
    with _pytest.raises(ValueError, match="not .*adjacent"):
        log.merge_shards(s[0], s[2])
    # splitting a child of a split keeps lineage one level deep but
    # range bookkeeping exact
    c1, c2 = log.split_shard(s[1])
    g1, g2 = log.split_shard(c1)
    from rxlan_aws_lakehouse_spark.sources.replay_source import (
        _shard_meta,
    )

    m = _shard_meta(os.path.join(root, g1))
    assert m["parents"] == {c1: 0}
    lo, hi = _shard_meta(os.path.join(root, s[1]))["range"]
    glo, ghi = m["range"]
    assert lo <= glo < ghi <= hi


def test_reshard_log_through_native_txn_sink(spark, tmp_path):
    """Composition: a resharding replay log feeding the NATIVE
    writeStream.format('txn') sink — split mid-stream, exactly-once
    into the transactional table across the reshard boundary."""
    from rxlan_aws_lakehouse_spark.sources.txn_source import (
        register_txn_source,
    )
    from rxlan_aws_lakehouse_spark.txn import TxnTable

    register_txn_source(spark)
    register_replay_source(spark)
    root = str(tmp_path / "log")
    os.makedirs(root)
    log = ReplayLog(root, n_shards=2)
    log.put_many([(i, json.dumps({"k": i})) for i in range(80)])
    troot, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")

    def drain(**opts):
        reader = spark.readStream.format("replaylog").option(
            "startingPosition", "earliest"
        )
        for k, v in opts.items():
            reader = reader.option(k, str(v))
        q = (
            reader.load(root)
            .writeStream.format("txn")
            .option("path", troot)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain(maxSeqsPerTrigger=25)  # backlog outstanding
    log.split_shard(log.shards[0])
    log.put_many([(i, json.dumps({"k": i})) for i in range(80, 120)])
    for _ in range(3):
        drain()
    t = TxnTable(troot)
    got = t.read(spark)
    assert got.count() == 120
    assert got.select("shard", "seq").distinct().count() == 120
    keys = sorted(json.loads(r["data"])["k"] for r in got.collect())
    assert keys == list(range(120))
    # every micro-batch committed exactly once (epochs strictly grow)
    epochs = [
        m["extra"]["streaming_epoch_id"]
        for m in t.history()
        if "streaming_epoch_id" in m.get("extra", {})
    ]
    assert epochs == sorted(set(epochs), reverse=True) or epochs == sorted(
        set(epochs)
    )
