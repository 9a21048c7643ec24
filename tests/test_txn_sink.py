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
