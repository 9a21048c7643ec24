"""Row-level change data feed (Delta CDF semantics): exact pre/post
images and deletes per commit, derived inserts for appends, exactly-once
deletes under overlapping deferred predicates, property travel, and the
unavailable-range error."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.txn import (
    ChangeFeedUnavailableError,
    TxnTable,
)


def _rows(df):
    return {
        tuple(r)
        for r in df.select(
            "k", "amount", "_change_type", "_commit_version"
        ).collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)],
        "k INT, amount DOUBLE",
    )
    t.commit(base, cdf=True)
    return t


def test_initial_commit_reads_as_inserts(spark, table):
    v1 = table.current_version()
    chg = table.read_row_changes(spark, since=None)
    assert _rows(chg) == {
        (1, 10.0, "insert", v1),
        (2, 20.0, "insert", v1),
        (3, 30.0, "insert", v1),
        (4, 40.0, "insert", v1),
    }


def test_merge_emits_pre_post_and_insert(spark, table):
    v1 = table.current_version()
    v2 = table.merge_upsert(
        spark,
        spark.createDataFrame(
            [(2, 25.0), (5, 50.0)], "k INT, amount DOUBLE"
        ),
        keys=["k"],
    )
    chg = table.read_row_changes(spark, since=v1)
    assert _rows(chg) == {
        (2, 20.0, "update_preimage", v2),
        (2, 25.0, "update_postimage", v2),
        (5, 50.0, "insert", v2),
    }


def test_insert_only_merge_derives_from_fresh_files(spark, table):
    v1 = table.current_version()
    v2 = table.merge_upsert(
        spark,
        spark.createDataFrame([(9, 90.0)], "k INT, amount DOUBLE"),
        keys=["k"],
    )
    # no payload was written (nothing matched), yet the feed is exact
    assert not __import__("os").path.isdir(table._cdf_dir(v2))
    assert _rows(table.read_row_changes(spark, since=v1)) == {
        (9, 90.0, "insert", v2)
    }


def test_append_derives_inserts_zero_write_amplification(spark, table):
    v1 = table.current_version()
    v2 = table.append(
        spark.createDataFrame([(6, 60.0)], "k INT, amount DOUBLE")
    )
    assert not __import__("os").path.isdir(table._cdf_dir(v2))
    assert _rows(table.read_row_changes(spark, since=v1)) == {
        (6, 60.0, "insert", v2)
    }


def test_delete_where_emits_deletes_only(spark, table):
    v1 = table.current_version()
    v2 = table.delete_where(spark, F.col("amount") >= 30.0)
    chg = table.read_row_changes(spark, since=v1)
    # rewritten-but-kept rows (1, 2 shared files with 3, 4) never appear
    assert _rows(chg) == {
        (3, 30.0, "delete", v2),
        (4, 40.0, "delete", v2),
    }


def test_deferred_delete_exactly_once_under_overlap(spark, table):
    v1 = table.current_version()
    va = table.delete_where_deferred(spark, F.col("k").isin(3, 4))
    # overlapping predicate re-matches k=4's raw row; the feed must not
    vb = table.delete_where_deferred(spark, F.col("amount") >= 20.0)
    chg = table.read_row_changes(spark, since=v1)
    assert _rows(chg) == {
        (3, 30.0, "delete", va),
        (4, 40.0, "delete", va),
        (2, 20.0, "delete", vb),
    }
    # materialization adds no logical change to the feed
    table.materialize_deletes(spark)
    assert _rows(table.read_row_changes(spark, since=v1)) == _rows(chg)


def test_apply_cdc_emits_full_change_set(spark, table):
    v1 = table.current_version()
    v2 = table.apply_cdc(
        spark,
        spark.createDataFrame(
            [(2, 22.0, "U"), (7, 70.0, "I"), (3, None, "D"), (99, None, "D")],
            "k INT, amount DOUBLE, op STRING",
        ),
        keys=["k"],
    )
    assert _rows(table.read_row_changes(spark, since=v1)) == {
        (2, 20.0, "update_preimage", v2),
        (2, 22.0, "update_postimage", v2),
        (7, 70.0, "insert", v2),
        (3, 30.0, "delete", v2),
        # k=99 matched nothing: no event
    }


def test_replay_reconstructs_table(spark, table):
    """Folding the feed (last event per key wins, deletes drop) must
    reproduce the live snapshot — the CDC-consumer contract."""
    table.merge_upsert(
        spark,
        spark.createDataFrame(
            [(1, 11.0), (8, 80.0)], "k INT, amount DOUBLE"
        ),
        keys=["k"],
    )
    table.delete_where(spark, F.col("k") == 2)
    table.append(spark.createDataFrame([(9, 90.0)], "k INT, amount DOUBLE"))
    feed = table.read_row_changes(spark, since=None).filter(
        F.col("_change_type") != "update_preimage"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy(F.col("_commit_version").desc())
    replayed = (
        feed.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_change_type") != "delete"))
        .select("k", "amount")
    )
    live = table.read(spark).select("k", "amount")
    assert {tuple(r) for r in replayed.collect()} == {
        tuple(r) for r in live.collect()
    }


def test_disabled_feed_raises_on_merge_range(spark, tmp_path):
    t = TxnTable(str(tmp_path / "nocdf"))
    v1 = t.commit(
        spark.createDataFrame([(1, 10.0)], "k INT, amount DOUBLE")
    )
    t.merge_upsert(
        spark,
        spark.createDataFrame([(1, 11.0)], "k INT, amount DOUBLE"),
        keys=["k"],
    )
    with pytest.raises(ChangeFeedUnavailableError, match="merge_upsert"):
        t.read_row_changes(spark, since=v1).collect()
    # enabling now covers FUTURE commits; the old range still raises
    t.set_change_feed(spark, True)
    with pytest.raises(ChangeFeedUnavailableError):
        t.read_row_changes(spark, since=v1).collect()
    v3 = t.current_version()
    v4 = t.merge_upsert(
        spark,
        spark.createDataFrame([(1, 12.0)], "k INT, amount DOUBLE"),
        keys=["k"],
    )
    assert _rows(t.read_row_changes(spark, since=v3)) == {
        (1, 11.0, "update_preimage", v4),
        (1, 12.0, "update_postimage", v4),
    }


def test_property_travels_and_schema_evolution(spark, table, tmp_path):
    v1 = table.current_version()
    clone = table.clone_to(spark, str(tmp_path / "clone"))
    assert clone.cdf_enabled()
    # evolved merge: the payload carries the new column; earlier feed
    # rows surface it as NULL through the union
    v2 = table.merge_upsert(
        spark,
        spark.createDataFrame(
            [(2, 25.0, "vip")], "k INT, amount DOUBLE, tier STRING"
        ),
        keys=["k"],
        merge_schema=True,
    )
    chg = table.read_row_changes(spark, since=None)
    assert "tier" in chg.columns
    got = {
        (r["k"], r["_change_type"], r["tier"])
        for r in chg.filter(F.col("k") == 2).collect()
    }
    assert got == {
        (2, "insert", None),
        (2, "update_preimage", None),
        (2, "update_postimage", "vip"),
    }
    assert v1 and v2


@pytest.mark.parametrize("op", ["merge_upsert", "merge_upsert_dv"])
def test_merge_with_delete_keys_emits_delete_images(spark, table, op):
    """round 10: merge_upsert(delete_keys=...) — the WHEN MATCHED THEN
    DELETE primitive — must emit 'delete' preimages for the dropped
    rows alongside the usual pre/post/insert, in ONE commit, on both
    the copy-on-write and deletion-vector paths."""
    v1 = table.current_version()
    updates = spark.createDataFrame(
        [(2, 200.0), (5, 50.0)], "k INT, amount DOUBLE"
    )
    dels = spark.createDataFrame([(3,), (4,)], "k INT")
    v2 = getattr(table, op)(
        spark, updates, keys=["k"], delete_keys=dels
    )
    assert v2 != v1
    chg = table.read_row_changes(spark, since=v1)
    assert _rows(chg) == {
        (2, 20.0, "update_preimage", v2),
        (2, 200.0, "update_postimage", v2),
        (5, 50.0, "insert", v2),
        (3, 30.0, "delete", v2),
        (4, 40.0, "delete", v2),
    }
    got = sorted(tuple(r) for r in table.read(spark).collect())
    assert got == [(1, 10.0), (2, 200.0), (5, 50.0)]
    # one atomic commit did updates + inserts + deletes
    assert [m["operation"] for m in table.history()][-1] == op


def test_merge_delete_key_overlap_refused(spark, table):
    updates = spark.createDataFrame([(2, 1.0)], "k INT, amount DOUBLE")
    dels = spark.createDataFrame([(2,)], "k INT")
    with pytest.raises(ValueError, match="both updates and delete_keys"):
        table.merge_upsert(spark, updates, keys=["k"], delete_keys=dels)
    with pytest.raises(ValueError, match="both updates and delete_keys"):
        table.merge_upsert_dv(
            spark, updates, keys=["k"], delete_keys=dels
        )


def test_feed_resolves_renames_via_physical_identity(spark, table):
    """A metadata-only RENAME between commits: payloads written under
    the OLD logical name surface under the range-end name (physical-
    identity remap, Delta CDF's read-under-latest-schema contract);
    the evolution commits themselves contribute zero rows; a column
    DROPPED by the end version leaves the feed."""
    v1 = table.current_version()
    table.delete_where(spark, F.col("k") == 3)  # payload: (k, amount)
    table.rename_column(spark, "amount", "amt")  # metadata-only
    table.delete_where(spark, F.col("k") == 4)  # payload: (k, amt)
    df = table.read_row_changes(spark, since=v1)
    assert sorted(df.columns) == [
        "_change_type", "_commit_version", "amt", "k"
    ]
    got = {
        (r["k"], r["amt"], r["_change_type"]) for r in df.collect()
    }
    assert got == {(3, 30.0, "delete"), (4, 40.0, "delete")}
    # drop the renamed column: it disappears from the whole feed
    table.add_columns(spark, "tag STRING")
    table.drop_column(spark, "amt")
    df2 = table.read_row_changes(spark, since=v1)
    assert sorted(df2.columns) == [
        "_change_type", "_commit_version", "k", "tag"
    ]
    assert {r["k"] for r in df2.collect()} == {3, 4}


def test_streaming_cdf_across_rename(spark, table, tmp_path):
    """format("txn") readChangeFeed keeps binding correctly when the
    table is renamed mid-history: data-file partitions bind through
    the frozen physical names, payload partitions through the payload
    version's own logical spelling."""
    from rxlan_aws_lakehouse_spark.sources.txn_source import (
        register_txn_source,
    )

    register_txn_source(spark)
    table.delete_where(spark, F.col("k") == 2)
    table.rename_column(spark, "amount", "amt")
    table.append(
        spark.createDataFrame([(9, 90.0)], "k INT, amt DOUBLE")
    )
    # plan AFTER the rename: pinned schema uses the new logical name;
    # startingVersion=earliest replays pre-rename payloads too
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("txn")
        .option("readChangeFeed", "true")
        .option("startingVersion", "earliest")
        .load(table.root)
        .writeStream.format("memory")
        .queryName("cdf_rename_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", out)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("cdf_rename_stream").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], set()).add(
            (r["k"], r["amt"])
        )
    # initial snapshot inserts + the appended row, all under 'amt'
    assert by_type["insert"] >= {(1, 10.0), (3, 30.0), (4, 40.0), (9, 90.0)}
    # the pre-rename delete payload binds its old column to 'amt'
    assert by_type["delete"] == {(2, 20.0)}


def test_batch_read_change_feed_through_format(spark, table):
    """Batch readChangeFeed (Delta table_changes shape): the full
    history as exact changes — before this reader existed the snapshot
    reader silently returned table rows with NULL change columns."""
    from rxlan_aws_lakehouse_spark.sources.txn_source import (
        register_txn_source,
    )

    register_txn_source(spark)
    table.delete_where(spark, F.col("k") == 2)
    table.merge_upsert(
        spark,
        spark.createDataFrame([(1, 99.0)], "k INT, amount DOUBLE"),
        ["k"],
    )
    df = (
        spark.read.format("txn")
        .option("readChangeFeed", "true")
        .load(table.root)
    )
    assert sorted(df.columns) == [
        "_change_type", "_commit_version", "amount", "k"
    ]
    got = {
        (r["k"], r["amount"], r["_change_type"]) for r in df.collect()
    }
    assert (1, 10.0, "insert") in got  # initial snapshot replay
    assert (2, 20.0, "delete") in got
    assert (1, 10.0, "update_preimage") in got
    assert (1, 99.0, "update_postimage") in got
    # range-pinned: only the delete commit
    ranged = (
        spark.read.format("txn")
        .option("readChangeFeed", "true")
        .option("startingVersion", 2)
        .option("endingVersion", 2)
        .load(table.root)
    )
    assert {
        (r["k"], r["_change_type"]) for r in ranged.collect()
    } == {(2, "delete")}
    # batch format agrees with the library API over the same range
    api = {
        (r["k"], r["amount"], r["_change_type"], r["_commit_version"])
        for r in table.read_row_changes(spark, since=None).collect()
    }
    fmt = {
        (r["k"], r["amount"], r["_change_type"], r["_commit_version"])
        for r in df.collect()
    }
    assert api == fmt


def test_batch_change_feed_across_rename(spark, table):
    """Batch readChangeFeed binds pre-rename payloads to the range-end
    logical names via physical identity, like read_row_changes."""
    from rxlan_aws_lakehouse_spark.sources.txn_source import (
        register_txn_source,
    )

    register_txn_source(spark)
    table.delete_where(spark, F.col("k") == 3)  # payload: (k, amount)
    table.rename_column(spark, "amount", "amt")
    table.delete_where(spark, F.col("k") == 4)  # payload: (k, amt)
    df = (
        spark.read.format("txn")
        .option("readChangeFeed", "true")
        .option("startingVersion", 2)
        .load(table.root)
    )
    assert sorted(df.columns) == [
        "_change_type", "_commit_version", "amt", "k"
    ]
    got = {(r["k"], r["amt"], r["_change_type"]) for r in df.collect()}
    assert got == {(3, 30.0, "delete"), (4, 40.0, "delete")}


def test_batch_change_feed_drop_readd_no_resurrection(spark, table):
    """A payload written BEFORE ``DROP COLUMN x`` holds a logical
    column ``x``; after re-adding ``x`` (fresh physical) the
    format("txn") readChangeFeed binding must null-fill it, exactly
    like ``read_row_changes`` — a logical-name fallback would bind the
    dropped column's old bytes to the new column (resurrection).
    Mirrors test_drop_column_metadata_only_and_no_resurrection for the
    CDF surface."""
    from rxlan_aws_lakehouse_spark.sources.txn_source import (
        register_txn_source,
    )

    register_txn_source(spark)
    del_v = table.delete_where(spark, F.col("k") == 2)  # payload (k, amount)
    table.drop_column(spark, "amount")
    table.add_columns(spark, "amount DOUBLE")
    # range END defaults to head (post re-add): the pinned schema's
    # 'amount' is the FRESH physical — the payload's old spelling must
    # not bind to it.  (Pinning endingVersion at the delete commit
    # instead would make 20.0 the CORRECT answer: that range-end schema
    # predates the drop.)
    df = (
        spark.read.format("txn")
        .option("readChangeFeed", "true")
        .option("startingVersion", del_v)
        .load(table.root)
    )
    rows = df.collect()
    assert {(r["k"], r["_change_type"]) for r in rows} == {(2, "delete")}
    # the re-added 'amount' must NOT resurrect the payload's old 20.0
    assert all(r["amount"] is None for r in rows)
    api = table.read_row_changes(spark, since="v00000001").filter(
        F.col("_commit_version") == del_v
    )
    assert {
        (r["k"], r["amount"], r["_change_type"]) for r in api.collect()
    } == {(r["k"], r["amount"], r["_change_type"]) for r in rows}
