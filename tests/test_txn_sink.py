"""Exactly-once streaming ingestion into TxnTable via foreachBatch."""

from __future__ import annotations

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.streaming.txn_sink import (
    last_epoch,
    txn_append_sink,
)
from rxlan_aws_lakehouse_spark.txn import TxnTable
from tests.test_streaming import _envelope, _write_landing


def _batch(spark, lo, n, tag):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag"),
        (F.col("id") % 3).cast("string").alias("dt"),
    )


def test_epoch_replay_is_dropped(spark, tmp_path):
    """A re-delivered foreachBatch epoch (crash between table commit and
    checkpoint advance) must not append twice; later epochs still land."""
    t = TxnTable(str(tmp_path / "t"))
    sink = txn_append_sink(t, partition_by=["dt"])
    sink(_batch(spark, 0, 10, "e0"), 0)
    sink(_batch(spark, 10, 5, "e1"), 1)
    assert t.read(spark).count() == 15
    assert last_epoch(t) == 1
    # crash-replay of epoch 1: dropped
    sink(_batch(spark, 10, 5, "e1"), 1)
    assert t.read(spark).count() == 15
    # an interleaved maintenance commit must not reset the guard
    t.compact(spark)
    sink(_batch(spark, 10, 5, "e1-again"), 1)
    assert t.read(spark).count() == 15
    # next epoch lands normally
    sink(_batch(spark, 15, 3, "e2"), 2)
    assert t.read(spark).count() == 18
    assert last_epoch(t) == 2


def test_streaming_cdc_into_txn_table_end_to_end(spark, tmp_path):
    """Real Structured Streaming run: CDC envelopes -> decode -> foreachBatch
    -> TxnTable. Restarting the query over the same landing dir (checkpoint
    replay) leaves the table unchanged; new data appends atomically."""
    from rxlan_aws_lakehouse_spark.streaming.cdc import (
        DDB_EVENT_SCHEMA,
        cdc_transform,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    t = TxnTable(str(tmp_path / "gold"))

    def run():
        raw = spark.readStream.schema(DDB_EVENT_SCHEMA).json(landing)
        decoded = cdc_transform(raw).select("city", "temp_c", "dt")
        q = (
            decoded.writeStream.foreachBatch(
                txn_append_sink(t, partition_by=["dt"])
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_landing(
        landing,
        [
            _envelope("INSERT", "Austin", "2024-03-01T10:00:00Z", event_id="a"),
            _envelope("INSERT", "Chicago", "2024-03-01T11:00:00Z", event_id="b"),
        ],
    )
    run()
    assert t.read(spark).count() == 2
    v_after_first = t.current_version()
    # restart with no new files: checkpoint says nothing to do
    run()
    assert t.current_version() == v_after_first
    assert t.read(spark).count() == 2
    # new envelope: lands exactly once, table stays partitioned
    _write_landing(
        landing,
        [_envelope("INSERT", "Denver", "2024-03-01T12:00:00Z", event_id="c")],
        name="batch1.json",
    )
    run()
    got = t.read(spark)
    assert got.count() == 3
    assert {r["city"] for r in got.collect()} == {"Austin", "Chicago", "Denver"}
    assert t._meta(t.current_version())["partition_by"] == ["dt"]


def test_epoch_survives_vacuum_of_recording_commit(spark, tmp_path):
    """ADVICE r4: vacuuming the snapshot that first recorded an epoch (with
    later non-streaming commits on top) must not resurrect the epoch — the
    fold-forward keeps the watermark on the live head, so a crash-replayed
    epoch is still dropped."""
    t = TxnTable(str(tmp_path / "t"))
    sink = txn_append_sink(t)
    sink(_batch(spark, 0, 4, "s"), 0)
    sink(_batch(spark, 10, 4, "s"), 1)
    # non-streaming commits advance the table past the epoch commits
    t.append(_batch(spark, 20, 2, "b"))
    t.append(_batch(spark, 30, 2, "b"))
    t.compact(spark)
    removed = t.vacuum(keep=2)
    assert removed  # the epoch-recording snapshots are gone
    assert last_epoch(t) == 1
    before = t.read(spark).count()
    sink(_batch(spark, 10, 4, "s"), 1)  # crash-replay of epoch 1
    assert t.read(spark).count() == before  # dropped, not re-appended
    sink(_batch(spark, 40, 3, "s"), 2)  # a genuinely new epoch still lands
    assert t.read(spark).count() == before + 3
    assert last_epoch(t) == 2


def _cdc_batch(spark, rows):
    return spark.createDataFrame(
        rows, "k long, tag string, op string, seq int"
    )


def test_cdc_apply_sink_merges_each_epoch_once(spark, tmp_path):
    """Streaming MERGE: each micro-batch applies I/U/D atomically; a
    crash-replayed epoch is dropped (no double-update, no resurrect)."""
    from rxlan_aws_lakehouse_spark.streaming.txn_sink import txn_cdc_apply_sink

    t = TxnTable(str(tmp_path / "t"))
    t.commit(
        spark.range(10).select(
            F.col("id").alias("k"), F.lit("base").alias("tag")
        )
    )
    sink = txn_cdc_apply_sink(t, keys=["k"], seq_col="seq")
    # epoch 0: update k=1, delete k=2, insert k=100
    sink(
        _cdc_batch(
            spark,
            [(1, "upd", "U", 1), (2, None, "D", 1), (100, "ins", "I", 1)],
        ),
        0,
    )
    got = t.read(spark)
    assert got.count() == 10  # 10 - 1 del + 1 ins
    assert got.filter(F.col("k") == 1).first()["tag"] == "upd"
    assert got.filter(F.col("k") == 2).count() == 0
    # crash-replay of epoch 0: table unchanged (delete not re-applied to a
    # re-inserted key, update not double-applied)
    sink(
        _cdc_batch(
            spark,
            [(1, "upd", "U", 1), (2, None, "D", 1), (100, "ins", "I", 1)],
        ),
        0,
    )
    assert t.read(spark).count() == 10
    assert last_epoch(t) == 0
    # empty epoch: no commit, later epoch still applies
    n_versions = len(t.history())
    sink(_cdc_batch(spark, []), 1)
    assert len(t.history()) == n_versions
    sink(_cdc_batch(spark, [(3, "late", "U", 1)]), 2)
    assert t.read(spark).filter(F.col("k") == 3).first()["tag"] == "late"
    assert last_epoch(t) == 2


def test_last_epoch_ignores_staged_and_orphaned_snapshots(spark, tmp_path):
    """Regression (ADVICE r5, txn_sink.py:110): a WAP snapshot staged with
    commit(publish=False) — or a slot orphaned by a lost pointer race —
    exists on disk with an _meta.json but was never live. An epoch id
    recorded only there was never applied, so the guard must NOT trust it
    (trusting it would silently drop the replayed batch's data)."""
    t = TxnTable(str(tmp_path / "t"))
    sink = txn_append_sink(t)
    sink(_batch(spark, 0, 6, "e0"), 0)
    assert last_epoch(t) == 0
    # stage epoch 1's batch but never publish (audit rejected it)
    t.commit(
        _batch(spark, 6, 4, "e1-staged"),
        operation="append",
        extra_meta={"streaming_epoch_id": 1},
        publish=False,
    )
    assert t.read(spark).count() == 6  # staged batch not live
    # the guard only believes the published lineage
    assert last_epoch(t) == 0
    # so epoch 1's re-delivery (the real one) must land
    sink(_batch(spark, 6, 4, "e1"), 1)
    assert t.read(spark).count() == 10
    assert last_epoch(t) == 1
    assert t.read(spark).filter(F.col("tag") == "e1-staged").count() == 0


def test_merge_sink_creates_then_merges_exactly_once(spark, tmp_path):
    """txn_merge_sink: first non-empty epoch CREATES the target, later
    epochs MERGE (latest row per key); a crash-replayed epoch is dropped
    before it can double-apply."""
    from rxlan_aws_lakehouse_spark.streaming.txn_sink import txn_merge_sink

    t = TxnTable(str(tmp_path / "dst"))
    sink = txn_merge_sink(t, keys=["k"])
    sink(_batch(spark, 0, 10, "base"), 0)  # creates
    assert t.read(spark).count() == 10
    sink(_batch(spark, 5, 10, "rev1"), 1)  # 5 updates + 5 inserts
    snap = t.read(spark)
    assert snap.count() == 15
    assert snap.filter(F.col("tag") == "rev1").count() == 10
    # crash-replay of epoch 1: no change
    sink(_batch(spark, 5, 10, "rev1-replay"), 1)
    assert t.read(spark).filter(F.col("tag") == "rev1-replay").count() == 0
    assert t.read(spark).count() == 15
    # empty epoch burns nothing
    sink(_batch(spark, 0, 10, "x").filter(F.lit(False)), 2)
    assert last_epoch(t) == 1


def test_merge_sink_order_col_dedupes_multi_version_batch(spark, tmp_path):
    """A catch-up batch holding several source versions of the same key is
    deduped to the highest order_col row before the merge."""
    from rxlan_aws_lakehouse_spark.streaming.txn_sink import txn_merge_sink

    t = TxnTable(str(tmp_path / "dst"))
    sink = txn_merge_sink(t, keys=["k"], order_col="rev")
    multi = (
        _batch(spark, 0, 6, "v0").withColumn("rev", F.lit(0))
        .unionByName(
            _batch(spark, 0, 3, "v1").withColumn("rev", F.lit(1))
        )
        .unionByName(
            _batch(spark, 0, 1, "v2").withColumn("rev", F.lit(2))
        )
    )
    sink(multi, 0)
    snap = t.read(spark)
    assert snap.count() == 6
    got = {r["k"]: r["tag"] for r in snap.collect()}
    assert got[0] == "v2" and got[1] == "v1" and got[2] == "v1"
    assert got[3] == "v0" and got[5] == "v0"


def test_replicate_stream_lane_matches_closed_form(spark, tmp_path):
    """End-to-end: readStream.format(\"txn\") + maxVersionsPerTrigger=1 +
    txn_merge_sink converges the target to latest-row-per-key in commit
    order (the registry lane, sf0.001)."""
    from rxlan_aws_lakehouse_spark.queries.txn_live import (
        txn_replicate_stream,
    )

    out = txn_replicate_stream(spark, "/root/testdata/sf0.001").collect()
    by_rev = {r["rev"]: r for r in out}
    assert set(by_rev) == {0, 1, 2}
    # every 100th key is rev 2, every remaining 10th rev 1
    assert by_rev[2]["min_key"] % 100 == 0
    assert by_rev[1]["min_key"] % 10 == 0
    total = sum(r["n_rows"] for r in out)
    assert total == spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).count()
