"""Exactly-once streaming sink into a TxnTable.

The reference's streaming path lands at-least-once (Kinesis retries,
Firehose re-delivery — duplicates are EXPECTED input, detected after the
fact by SQL: /root/reference/init.sql:46-52). Structured Streaming's file
sinks are exactly-once only for their own output format; writing into a
transactional table from ``foreachBatch`` reintroduces the classic failure:
a crash between the table commit and the checkpoint advance makes Spark
re-run the same epoch, appending the batch twice.

This sink closes that window the way Delta's idempotent writes do: the
epoch id commits ATOMICALLY inside the table's snapshot manifest
(``extra_meta``), and a re-delivered epoch whose id is already recorded in
the table lineage is skipped. Commit-and-remember is one atomic pointer
swap, so there is no state in which the data landed but the epoch id did
not — exactly-once end to end, regardless of where the driver dies.

Epoch ids only grow per checkpoint; interleaved non-streaming commits on
the same table are fine: the epoch id is a WATERMARK key that every
``TxnTable.commit`` folds forward from its parent (txn._WATERMARK_KEYS),
so the LIVE snapshot always carries the newest recorded epoch — the guard
reads one manifest per micro-batch instead of walking O(history), and
vacuuming the commit that first recorded the epoch cannot lose it (the
fold-forward keeps a copy in every descendant, including the live head).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..txn import TxnTable

_EPOCH_KEY = "streaming_epoch_id"


def last_epoch(table: TxnTable) -> int | None:
    """Newest streaming epoch recorded in the table's PUBLISHED lineage.

    Commit fold-forward guarantees the live snapshot carries it, so this
    is one manifest read; the parent-link walk remains only for tables
    whose last epoch commit predates the fold-forward behavior. The walk
    follows ``lineage()`` (live pointer -> parents), never ``history()``:
    a staged-but-unpublished WAP snapshot or a slot orphaned by a lost
    pointer race still exists on disk with an ``_meta.json``, and an
    epoch recorded there was never applied to the live table — trusting
    it would wrongly drop the replayed batch.
    """
    for meta in table.lineage():
        e = meta.get("extra", {}).get(_EPOCH_KEY)
        if e is not None:
            return int(e)
    return None


def txn_append_sink(table: TxnTable, partition_by: list[str] | None = None):
    """``foreachBatch`` function appending each micro-batch exactly once.

    Usage::

        q = (stream.writeStream
             .foreachBatch(txn_append_sink(table, partition_by=["dt"]))
             .option("checkpointLocation", ckpt)
             .start())
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        last = last_epoch(table)
        if last is not None and batch_id <= last:
            return  # epoch already committed: crash-replay, drop it
        table.append(
            batch_df,
            partition_by=partition_by,
            extra_meta={_EPOCH_KEY: int(batch_id)},
        )

    return sink


def txn_merge_sink(
    table: TxnTable,
    keys: list[str],
    order_col: str | None = None,
):
    """``foreachBatch`` function MERGE-upserting each micro-batch exactly
    once — the table-to-table replication pattern: stream-tail a source
    table (``readStream.format("txn")``), keep a target table converged
    to "latest row per key" without ever rewriting more than the touched
    files. Delta calls this the foreachBatch-MERGE idiom; it is how a
    100 TB mirror follows a source at delta cost instead of copy cost.

    Exactly-once by the same epoch-in-manifest trick as the append sink:
    the epoch id rides the merge commit's own pointer swap, so a
    crash-replayed epoch is recognized in the target lineage and dropped
    before it can double-apply.

    MERGE needs at most ONE row per key per batch to be deterministic.
    Either bound each micro-batch to one source commit
    (``option("maxVersionsPerTrigger", "1")`` on the txn stream — commit
    order becomes merge order), or pass ``order_col``: the sink then
    keeps only the highest-``order_col`` row per key within the batch
    (ties broken by the remaining columns' string form, deterministic),
    which is the standard in-batch dedupe for multi-version catch-up
    batches.

    The first non-empty batch on a versionless target CREATES the table
    (plain commit, same epoch stamp); every later batch merges.

    Usage::

        q = (spark.readStream.format("txn")
             .option("startingVersion", "earliest")
             .option("maxVersionsPerTrigger", "1")
             .load(src.root)
             .writeStream
             .foreachBatch(txn_merge_sink(dst, keys=["pk"]))
             .option("checkpointLocation", ckpt)
             .start())
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        last = last_epoch(table)
        if last is not None and batch_id <= last:
            return  # crash-replayed epoch: already merged, drop it
        if not batch_df.take(1):
            return  # empty batch: no commit, no epoch burn
        df = batch_df
        if order_col is not None:
            others = [
                c for c in df.columns if c not in keys and c != order_col
            ]
            w = Window.partitionBy(*keys).orderBy(
                F.col(order_col).desc(),
                *[F.col(c).cast("string").desc_nulls_last() for c in others],
            )
            df = (
                df.withColumn("_mrn", F.row_number().over(w))
                .filter(F.col("_mrn") == 1)
                .drop("_mrn")
            )
        meta = {_EPOCH_KEY: int(batch_id)}
        if table.current_version() is None:
            table.commit(df, extra_meta=meta)
        else:
            table.merge_upsert(
                df.sparkSession, df, keys=keys, extra_meta=meta
            )

    return sink


def txn_cdc_apply_sink(
    table: TxnTable,
    keys: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
):
    """``foreachBatch`` function APPLYING each micro-batch as a CDC merge
    (I/U/D with per-key last-writer-wins) exactly once — the streaming
    MERGE pattern: a Debezium/DynamoDB-Streams change feed maintains a
    queryable mirror table, not an append log.

    Exactly-once by the same epoch-in-manifest trick as the append sink:
    ``apply_cdc`` lands the whole batch in ONE atomic commit carrying the
    epoch id, so a crash-replayed epoch is recognized and dropped — a
    replayed DELETE cannot resurrect-then-re-delete, a replayed UPDATE
    cannot double-apply. The merge itself is idempotent per batch only if
    nothing else wrote in between; the epoch guard removes even that
    window.

    Usage::

        q = (changes.writeStream
             .foreachBatch(txn_cdc_apply_sink(table, keys=["pk"],
                                              seq_col="seq"))
             .option("checkpointLocation", ckpt)
             .start())
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        last = last_epoch(table)
        if last is not None and batch_id <= last:
            return  # crash-replayed epoch: already merged, drop it
        if not batch_df.take(1):
            return  # empty batch: no commit, no epoch burn
        table.apply_cdc(
            batch_df.sparkSession,
            batch_df,
            keys=keys,
            op_col=op_col,
            seq_col=seq_col,
            extra_meta={_EPOCH_KEY: int(batch_id)},
        )

    return sink
