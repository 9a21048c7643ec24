"""txn tables as a Spark DataSource: ``spark.read.format("txn")`` and
``spark.readStream.format("txn")`` (sources/txn_source.py).

What must hold:

* batch reads through the format are row-identical to ``TxnTable.read``
  (same snapshot resolution, DV application, schema-evolution NULLs);
* pushed filters prune FILES at plan time (range stats, blooms,
  partition dirs) while Spark still re-applies them row-level;
* time travel rides ``version`` / ``timestamp`` options;
* the streaming reader tails the commit log with Delta-source
  semantics: appends stream through exactly once across restarts,
  non-append commits fail loudly unless ignoreDeletes/ignoreChanges.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In
from pyspark.sql.types import StructType

from rxlan_aws_lakehouse_spark.txn import TxnTable
from rxlan_aws_lakehouse_spark.sources.txn_source import (
    TxnPruningReader,
    TxnSnapshotReader,
    register_txn_source,
)


def _mk_table(spark, root, n=1000, bloom=False):
    tbl = TxnTable(os.path.join(root, "t"))
    df = spark.range(0, n).select(
        F.col("id"),
        (F.col("id") % 10).alias("part"),
        (F.col("id") * 2).alias("val"),
    )
    tbl.commit(
        df,
        partition_by=["part"],
        bloom_cols=["id"] if bloom else None,
    )
    return tbl


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_txn_source(spark)


def _rows(df):
    return sorted(df.collect(), key=lambda r: (r["id"],))


class TestBatchRead:
    def test_matches_library_read(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path))
        via_fmt = spark.read.format("txn").load(tbl.root)
        lib = tbl.read(spark)
        # the format keeps the partition column in its RECORDED schema
        # position; the library's hive-partitioned scan appends it last —
        # same columns and rows, possibly different order
        cols = sorted(via_fmt.columns)
        assert _rows(via_fmt.select(*cols)) == _rows(lib.select(*cols))
        assert {(f.name, f.dataType) for f in via_fmt.schema} == {
            (f.name, f.dataType) for f in lib.schema
        }

    def test_row_filter_correct_under_pruning(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path))
        out = (
            spark.read.format("txn")
            .load(tbl.root)
            .filter((F.col("part") == 3) & (F.col("id") < 100))
        )
        got = sorted(r["id"] for r in out.collect())
        assert got == [i for i in range(100) if i % 10 == 3]

    def test_partition_predicate_prunes_files(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path))
        schema = StructType.fromJson(tbl._meta(tbl.current_version())["schema"])
        rd = TxnPruningReader({"path": tbl.root}, schema)
        total = len(rd.partitions())
        rd2 = TxnPruningReader({"path": tbl.root}, schema)
        kept = rd2.pushFilters([EqualTo(("part",), 3)])
        # every filter is reported unhandled: Spark re-applies row-level
        assert list(kept) == [EqualTo(("part",), 3)]
        pruned = len(rd2.partitions())
        assert 0 < pruned < total

    def test_range_predicate_prunes_files(self, spark, tmp_path):
        tbl = TxnTable(os.path.join(str(tmp_path), "t"))
        df = spark.range(0, 1000).select(
            F.col("id"), (F.col("id") * 3).alias("val")
        )
        # sort_within gives each file a tight, disjoint id range
        tbl.commit(df.repartitionByRange(8, "id"), sort_within=["id"])
        schema = StructType.fromJson(tbl._meta(tbl.current_version())["schema"])
        rd = TxnPruningReader({"path": tbl.root}, schema)
        rd.pushFilters([GreaterThan(("id",), 990)])
        assert len(rd.partitions()) < len(tbl.files())
        out = (
            spark.read.format("txn")
            .option("pushdown", "true")
            .load(tbl.root)
            .filter(F.col("id") > 990)
        )
        assert out.count() == 9

    def test_bloom_point_lookup_prunes(self, spark, tmp_path):
        # ids hash-scattered across files: every file's [min,max] spans the
        # key space, so ONLY the bloom can prune — the unclustered case.
        tbl = TxnTable(os.path.join(str(tmp_path), "t"))
        df = spark.range(0, 4000).select(F.col("id"), (F.col("id") % 7).alias("v"))
        tbl.commit(df.repartition(8, "id"), bloom_cols=["id"])
        schema = StructType.fromJson(tbl._meta(tbl.current_version())["schema"])
        rd = TxnPruningReader({"path": tbl.root}, schema)
        rd.pushFilters([EqualTo(("id",), 1234)])
        assert len(rd.partitions()) < len(tbl.files())
        got = (
            spark.read.format("txn")
            .option("pushdown", "true")
            .load(tbl.root)
            .filter(F.col("id") == 1234)
        ).collect()
        assert got == [Row(id=1234, v=1234 % 7)]

    def test_in_list_pruning_and_result(self, spark, tmp_path):
        tbl = TxnTable(os.path.join(str(tmp_path), "t"))
        df = spark.range(0, 4000).select(F.col("id"), (F.col("id") % 7).alias("v"))
        tbl.commit(df.repartition(8, "id"), bloom_cols=["id"])
        schema = StructType.fromJson(tbl._meta(tbl.current_version())["schema"])
        rd = TxnPruningReader({"path": tbl.root}, schema)
        rd.pushFilters([In(("id",), (5, 17))])
        assert len(rd.partitions()) < len(tbl.files())
        got = sorted(
            r["id"]
            for r in spark.read.format("txn")
            .option("pushdown", "true")
            .load(tbl.root)
            .filter(F.col("id").isin(5, 17))
            .collect()
        )
        assert got == [5, 17]

    def test_deletion_vector_applied(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path))
        tbl.delete_where_deferred(spark, F.col("id") % 100 == 0)
        assert tbl.has_deletion_vectors()
        via_fmt = spark.read.format("txn").load(tbl.root)
        cols = sorted(via_fmt.columns)
        assert _rows(via_fmt.select(*cols)) == _rows(
            tbl.read(spark).select(*cols)
        )
        assert via_fmt.filter(F.col("id") == 500).count() == 0
        assert via_fmt.count() == 990

    def test_time_travel_version_and_timestamp(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path), n=100)
        t_after_v1 = time.time()
        time.sleep(0.05)
        tbl.append(
            spark.range(100, 150).select(
                F.col("id"),
                (F.col("id") % 10).alias("part"),
                (F.col("id") * 2).alias("val"),
            )
        )
        v1 = spark.read.format("txn").option("version", 1).load(tbl.root)
        assert v1.count() == 100
        at = (
            spark.read.format("txn")
            .option("timestamp", t_after_v1)
            .load(tbl.root)
        )
        assert at.count() == 100
        cur = spark.read.format("txn").load(tbl.root)
        assert cur.count() == 150

    def test_schema_evolution_typed_nulls(self, spark, tmp_path):
        tbl = TxnTable(os.path.join(str(tmp_path), "t"))
        tbl.commit(spark.range(0, 10).select(F.col("id")))
        tbl.append(
            spark.range(10, 20).select(
                F.col("id"), F.lit("fresh").alias("tag")
            ),
            merge_schema=True,
        )
        out = spark.read.format("txn").load(tbl.root)
        lib = tbl.read(spark)
        # nullability may differ (the format keeps the recorded schema
        # verbatim; a parquet scan relaxes everything to nullable)
        assert [(f.name, f.dataType) for f in out.schema] == [
            (f.name, f.dataType) for f in lib.schema
        ]
        rows = _rows(out)
        assert [r["tag"] for r in rows[:10]] == [None] * 10
        assert all(r["tag"] == "fresh" for r in rows[10:])

    def test_no_pruning_state_leak_across_queries(self, spark, tmp_path):
        # THE default-pruning gate (round 9): Spark 4.1 caches the last
        # planned read info per load() relation, overwrites it on every
        # pushFilters, and replays it WITHOUT calling Python for scans
        # with no pushable filters — so with pruning on by default, a
        # filterless re-count must not inherit the filtered query's file
        # pruning. The pushdown guard's per-action cache reset is what
        # keeps this green (returned 125/1000 without it).
        tbl = _mk_table(spark, str(tmp_path))
        out = spark.read.format("txn").load(tbl.root)
        assert out.count() == 1000
        assert out.filter(F.col("id") == 500).count() == 1
        assert out.count() == 1000

    def test_missing_version_raises(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path), n=10)
        with pytest.raises(Exception, match="version v00000099 not found"):
            spark.read.format("txn").option("version", 99).load(
                tbl.root
            ).collect()


def _run_available_now(spark, tbl_root, ckpt, out_dir, **opts):
    """One availableNow run into a parquet sink (the memory sink cannot
    recover from a checkpoint, which the restart tests need). Returns
    the CUMULATIVE sink contents — re-runs append only fresh batches."""
    reader = spark.readStream.format("txn")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(tbl_root)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return spark.read.parquet(out_dir)
    except Exception:  # zero batches ever written -> empty result
        return spark.range(0).select(F.col("id"))


class TestStreamRead:
    def test_earliest_replays_everything(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path), n=200)
        out = _run_available_now(
            spark,
            tbl.root,
            str(tmp_path / "ck1"),
            str(tmp_path / "out_ck1"),
            startingVersion="earliest",
        )
        assert out.count() == 200

    def test_incremental_across_restarts_exactly_once(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path), n=100)
        ckpt = str(tmp_path / "ck2")
        out = _run_available_now(
            spark, tbl.root, ckpt, str(tmp_path / "out_ck2"), startingVersion="earliest"
        )
        assert out.count() == 100
        tbl.append(
            spark.range(100, 130).select(
                F.col("id"),
                (F.col("id") % 10).alias("part"),
                (F.col("id") * 2).alias("val"),
            )
        )
        out = _run_available_now(
            spark, tbl.root, ckpt, str(tmp_path / "out_ck2"), startingVersion="earliest"
        )
        # the parquet sink is cumulative; the checkpointed offset means
        # the second run appends ONLY the fresh commit — no replay, no loss
        got = sorted(r["id"] for r in out.collect())
        assert got == list(range(130))

    def test_delete_commit_fails_stream(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path), n=50)
        tbl.delete_where_deferred(spark, F.col("id") < 5)
        with pytest.raises(Exception, match="delete_dv"):
            _run_available_now(
                spark,
                tbl.root,
                str(tmp_path / "ck3"),
                str(tmp_path / "out_ck3"),
                startingVersion="earliest",
            )

    def test_ignore_deletes_skips_delete_commit(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path), n=50)
        tbl.delete_where_deferred(spark, F.col("id") < 5)
        tbl.append(
            spark.range(50, 60).select(
                F.col("id"),
                (F.col("id") % 10).alias("part"),
                (F.col("id") * 2).alias("val"),
            )
        )
        out = _run_available_now(
            spark,
            tbl.root,
            str(tmp_path / "ck4"),
            str(tmp_path / "out_ck4"),
            startingVersion="earliest",
            ignoreDeletes="true",
        )
        # v1 replays in full (the DV belongs to v2, which is suppressed);
        # the append streams through
        assert out.count() == 60

    def test_latest_skips_history(self, spark, tmp_path):
        tbl = _mk_table(spark, str(tmp_path), n=80)
        out = _run_available_now(
            spark,
            tbl.root,
            str(tmp_path / "ck5"),
            str(tmp_path / "out_ck5"),
            startingVersion="latest",
        )
        assert out.count() == 0
        tbl.append(
            spark.range(80, 90).select(
                F.col("id"),
                (F.col("id") % 10).alias("part"),
                (F.col("id") * 2).alias("val"),
            )
        )
        out = _run_available_now(
            spark,
            tbl.root,
            str(tmp_path / "ck5"),
            str(tmp_path / "out_ck5"),
            startingVersion="latest",
        )
        assert out.count() == 10

    def _six_version_table(self, spark, root):
        tbl = TxnTable(os.path.join(root, "t"))
        tbl.commit(spark.range(0, 10).select(F.col("id")))
        for i in range(1, 6):
            tbl.append(spark.range(i * 10, i * 10 + 10).select(F.col("id")))
        return tbl

    def test_max_versions_per_trigger_bounds_first_run(self, spark, tmp_path):
        # a FRESH capped availableNow run advances at most maxVersions
        # versions (latestOffset is called once per run) — the bounded
        # catch-up contract, Delta's maxFilesPerTrigger analogue
        tbl = self._six_version_table(spark, str(tmp_path))
        out = _run_available_now(
            spark,
            tbl.root,
            str(tmp_path / "ck6"),
            str(tmp_path / "out_ck6"),
            startingVersion="earliest",
            maxVersionsPerTrigger="2",
        )
        assert out.count() == 20  # versions 1..2 only

    def test_max_versions_per_trigger_long_lived_drains_bounded(
        self, spark, tmp_path
    ):
        # a LONG-LIVED capped query drains the whole backlog in bounded
        # micro-batches: each offset jump <= cap, union of batches = all
        import glob
        import json as _json

        tbl = self._six_version_table(spark, str(tmp_path))
        ckpt = str(tmp_path / "ck7")
        out_dir = str(tmp_path / "out_ck7")
        q = (
            spark.readStream.format("txn")
            .option("startingVersion", "earliest")
            .option("maxVersionsPerTrigger", "2")
            .load(tbl.root)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 seconds")
            .start()
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out_dir).count() == 60:
                        break
                except Exception:
                    pass
                time.sleep(1)
        finally:
            q.stop()
        assert spark.read.parquet(out_dir).count() == 60
        versions = []
        for p in sorted(glob.glob(os.path.join(ckpt, "offsets", "*"))):
            if os.path.basename(p).isdigit():
                last = open(p).read().strip().splitlines()[-1]
                versions.append(_json.loads(last)["version"])
        assert versions[-1] == 6
        jumps = [b - a for a, b in zip([0] + versions, versions)]
        assert all(j <= 2 for j in jumps), jumps
        assert len(versions) >= 3  # the backlog took multiple batches


class TestStreamChangeFeed:
    """readChangeFeed=true: the streaming source emits row-level changes
    (_change_type/_commit_version), Delta streaming-CDF semantics."""

    def _table(self, spark, root):
        t = TxnTable(os.path.join(root, "t"))
        base = spark.range(0, 10).select(
            F.col("id").alias("k"), F.lit("base").alias("tag")
        )
        t.commit(base)
        t.set_change_feed(spark, True)
        t.merge_upsert(
            spark,
            spark.range(5, 12).select(
                F.col("id").alias("k"), F.lit("rev").alias("tag")
            ),
            keys=["k"],
        )
        t.delete_where(spark, F.col("k") < 2)
        return t

    def _stream(self, spark, t, root, **opts):
        sink = os.path.join(root, "sink")
        reader = (
            spark.readStream.format("txn")
            .option("startingVersion", "earliest")
            .option("readChangeFeed", "true")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load(t.root)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink)

    def test_change_counts_and_reconstruction(self, spark, tmp_path):
        t = self._table(spark, str(tmp_path))
        out = self._stream(spark, t, str(tmp_path))
        by = {
            r["_change_type"]: r["count"]
            for r in out.groupBy("_change_type").count().collect()
        }
        assert by == {
            "insert": 12,  # 10 base + 2 merge inserts
            "update_preimage": 5,
            "update_postimage": 5,
            "delete": 2,
        }
        # replaying the feed reproduces the live table exactly
        from pyspark.sql.window import Window

        w = Window.partitionBy("k").orderBy(
            F.col("_commit_version").desc()
        )
        last = (
            out.filter(F.col("_change_type") != "update_preimage")
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .filter(F.col("_change_type") != "delete")
        )
        got = sorted((r["k"], r["tag"]) for r in last.collect())
        want = sorted(
            (r["k"], r["tag"]) for r in t.read(spark).collect()
        )
        assert got == want

    def test_physical_ops_emit_nothing(self, spark, tmp_path):
        t = self._table(spark, str(tmp_path))
        before = self._stream(spark, t, str(tmp_path)).count()
        t.compact(spark)
        out = self._stream(
            spark, t, str(tmp_path / "again")
        )
        assert out.count() == before  # compact added no change rows

    def test_changeful_commit_without_payload_fails(self, spark, tmp_path):
        t = TxnTable(os.path.join(str(tmp_path), "t2"))
        t.commit(
            spark.range(0, 10).select(
                F.col("id").alias("k"), F.lit("x").alias("tag")
            )
        )
        # feed NOT enabled: a merge records no payload
        t.merge_upsert(
            spark,
            spark.range(0, 3).select(
                F.col("id").alias("k"), F.lit("y").alias("tag")
            ),
            keys=["k"],
        )
        with pytest.raises(Exception, match="no.*row-level change payload"):
            self._stream(spark, t, str(tmp_path))


class TestPushdownGuard:
    """Driver-side guard (sources/pushdown_guard.py) that makes
    default-on pruning safe against Spark 4.1's Python-source
    relation-cache wrong-answer modes. The raw-bug reproductions bypass
    the guarded action surface via direct ``_jdf`` calls — the wrapped
    methods never run there, so they document the underlying Spark
    behavior the guard exists for, independent of install state."""

    def _range_table(self, spark, tmp_path):
        tbl = TxnTable(os.path.join(str(tmp_path), "t"))
        df = spark.range(0, 1000).select(
            F.col("id"), (F.col("id") * 3).alias("val")
        )
        # tight disjoint per-file id ranges -> range stats prune hard
        tbl.commit(df.repartitionByRange(8, "id"), sort_within=["id"])
        return tbl

    def test_raw_spark_bug_filterless_reuse_bypassing_guard(
        self, spark, tmp_path
    ):
        tbl = self._range_table(spark, tmp_path)
        df = spark.read.format("txn").load(tbl.root)
        assert df._jdf.count() == 1000
        assert df.filter(F.col("id") > 990)._jdf.count() == 9
        # the JVM replays the filtered query's pruned read info for the
        # filterless scan without calling Python: the under-read is the
        # Spark 4.1 bug itself (getOrCreateReadInfo caches, pushFilters
        # overwrites). If a future Spark fixes it, this assert flips and
        # the guard can be retired.
        assert df._jdf.count() < 1000

    def test_guarded_filterless_reuse_is_correct(self, spark, tmp_path):
        tbl = self._range_table(spark, tmp_path)
        df = spark.read.format("txn").load(tbl.root)  # pruning DEFAULT
        assert df.count() == 1000
        assert df.filter(F.col("id") > 990).count() == 9
        assert df.count() == 1000  # guard reset defeats the replay
        assert df.filter(F.col("id") < 10).count() == 10
        assert len(df.collect()) == 1000

    def test_guarded_intra_query_aliasing_union_and_join(
        self, spark, tmp_path
    ):
        # one relation, two differently-filtered scans in ONE query: the
        # shared cache slot would serve the last pushed plan to both
        # batches (measured raw: union 9/19, join 0/10); the guard
        # detects the duplicated relation and disables pushdown for just
        # that action
        tbl = self._range_table(spark, tmp_path)
        df = spark.read.format("txn").load(tbl.root)
        u = df.filter(F.col("id") < 10).unionAll(
            df.filter(F.col("id") > 990)
        )
        assert u.count() == 19
        assert len(u.collect()) == 19
        a = df.filter(F.col("id") < 10).select(
            (F.col("id") + 990).alias("k")
        )
        b = df.filter(F.col("id") > 989).select(F.col("id").alias("k"))
        assert a.join(b, "k").count() == 10
        # pushdown conf restored after the guarded action
        assert (
            spark.conf.get("spark.sql.python.filterPushdown.enabled")
            == "true"
        )

    def test_guarded_write_path(self, spark, tmp_path):
        tbl = self._range_table(spark, tmp_path)
        df = spark.read.format("txn").load(tbl.root)
        u = df.filter(F.col("id") < 10).unionAll(
            df.filter(F.col("id") > 990)
        )
        out = str(tmp_path / "out")
        u.write.parquet(out)  # DataFrameWriter surface is guarded too
        assert spark.read.parquet(out).count() == 19

    def test_zero_load_fast_path_skips_walk(
        self, spark, tmp_path, monkeypatch
    ):
        # r17: while no Python-source load has happened in the process,
        # the guard must answer "no relations" WITHOUT the py4j plan
        # walk (the relational lanes' fast path) — and a real load must
        # bump the counter so python-relation frames stay guarded.
        from rxlan_aws_lakehouse_spark.sources import pushdown_guard as pg

        tbl = self._range_table(spark, tmp_path)
        plain = spark.range(5).toDF("id")

        def _boom(_df):  # the walk must not run on the fast path
            raise AssertionError("plan walk ran despite zero loads")

        monkeypatch.setattr(pg, "_PY_LOADS", 0)
        monkeypatch.setattr(pg, "_python_relations", _boom)
        assert pg._cached_relations(plain) == []
        plain.__dict__.pop("_pdg_rels", None)
        monkeypatch.undo()

        # counting: the txn source name is registered; a format("txn")
        # load must increment the counter and the guard must then find
        # the relation on the loaded frame
        assert "txn" in pg._PY_SOURCE_NAMES
        before = pg._PY_LOADS
        df = spark.read.format("txn").load(tbl.root)
        assert pg._PY_LOADS > before
        assert len(pg._cached_relations(df)) == 1
        # a plain parquet-format load must NOT count
        plain_dir = str(tmp_path / "plainpq")
        spark.range(3).write.parquet(plain_dir)
        mid = pg._PY_LOADS
        spark.read.format("parquet").load(plain_dir).count()
        assert pg._PY_LOADS == mid

    def test_default_reader_is_pruning(self, spark, tmp_path):
        from rxlan_aws_lakehouse_spark.sources.txn_source import (
            TxnDataSource,
            TxnPruningReader,
        )

        tbl = self._range_table(spark, tmp_path)
        ds = TxnDataSource({"path": tbl.root})
        rd = ds.reader(ds.schema())
        assert isinstance(rd, TxnPruningReader)
        rd.pushFilters([GreaterThan(("id",), 990)])
        assert len(rd.partitions()) < len(tbl.files())
        # explicit opt-out restores the full-list reader
        ds2 = TxnDataSource({"path": tbl.root, "pushdown": "false"})
        assert not isinstance(ds2.reader(ds2.schema()), TxnPruningReader)


class TestMetadataTables:
    """option("metadata", ...) — table metadata AS DataFrames, served
    manifest-only (Delta DESCRIBE HISTORY / Iceberg metadata tables)."""

    def _tbl(self, spark, tmp_path):
        tbl = TxnTable(os.path.join(str(tmp_path), "t"))
        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 4).cast("string").alias("part")
        )
        tbl.commit(df.repartition("part"), partition_by=["part"])
        tbl.append(
            spark.range(100, 120).select(
                F.col("id"), F.lit("9").alias("part")
            ).repartition("part")
        )
        return tbl

    def test_history(self, spark, tmp_path):
        tbl = self._tbl(spark, tmp_path)
        h = (
            spark.read.format("txn")
            .option("metadata", "history")
            .load(tbl.root)
            .orderBy("version")
            .collect()
        )
        assert [(r["version"], r["operation"], r["n_rows"]) for r in h] == [
            ("v00000001", "overwrite", 100),
            ("v00000002", "append", 120),
        ]
        assert h[1]["n_files_written"] == 1  # one fresh partition dir

    def test_files_and_partitions(self, spark, tmp_path):
        tbl = self._tbl(spark, tmp_path)
        f = (
            spark.read.format("txn")
            .option("metadata", "files")
            .load(tbl.root)
        )
        assert f.agg(F.sum("rows")).first()[0] == 120
        assert f.count() == len(tbl.files())
        assert f.filter(F.col("bytes") <= 0).count() == 0
        p = (
            spark.read.format("txn")
            .option("metadata", "partitions")
            .load(tbl.root)
            .orderBy("partition")
            .collect()
        )
        assert [r["partition"] for r in p] == [
            f"part={i}" for i in (0, 1, 2, 3, 9)
        ]
        assert sum(r["rows"] for r in p) == 120

    def test_version_pinning_and_bad_kind(self, spark, tmp_path):
        tbl = self._tbl(spark, tmp_path)
        f1 = (
            spark.read.format("txn")
            .option("metadata", "files")
            .option("version", 1)
            .load(tbl.root)
        )
        assert f1.agg(F.sum("rows")).first()[0] == 100
        with pytest.raises(Exception, match="metadata must be one of"):
            spark.read.format("txn").option(
                "metadata", "nope"
            ).load(tbl.root).collect()


class TestBatchWriter:
    """df.write.format("txn") — the DSv2 batch writer (executors stage
    Arrow batches, the driver-side commit publishes via commit_staged,
    with no SparkSession)."""

    def test_create_append_overwrite_roundtrip(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 4).cast("string").alias("part")
        )
        df.write.format("txn").option("partitionBy", "part").mode(
            "overwrite"
        ).save(root)
        t = TxnTable(root)
        assert t.read(spark).count() == 100
        assert t._meta(t.current_version())["partition_by"] == ["part"]
        spark.range(100, 130).select(
            F.col("id"), F.lit("9").alias("part")
        ).write.format("txn").mode("append").save(root)
        got = spark.read.format("txn").load(root)
        assert got.count() == 130
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, t.read(spark).select(got.columns).collect())
        )
        # library writers compose with writer-created tables
        t.delete_where(spark, F.col("id") < 10)
        assert t.read(spark).count() == 120
        spark.range(3).select(
            F.col("id"), F.lit("z").alias("part")
        ).write.format("txn").mode("overwrite").save(root)
        assert t.read(spark).count() == 3
        assert [m["operation"] for m in t.history()] == [
            "overwrite", "append", "delete", "overwrite",
        ]

    def test_append_schema_mismatch_refused(self, spark, tmp_path):
        root = str(tmp_path / "t")
        spark.range(10).select(F.col("id")).write.format("txn").mode(
            "append"
        ).save(root)
        with pytest.raises(Exception, match="append schema mismatch"):
            spark.range(5).select(
                F.col("id").cast("int").alias("id")
            ).write.format("txn").mode("append").save(root)
        with pytest.raises(Exception, match="append schema mismatch"):
            spark.range(5).select(
                F.col("id"), F.lit("x").alias("extra")
            ).write.format("txn").mode("append").save(root)

    def test_constrained_table_refused(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = TxnTable(root)
        t.commit(spark.range(10).select(F.col("id")))
        t.add_check_constraint(spark, "pos", "id >= 0")
        with pytest.raises(Exception, match="CHECK constraints"):
            spark.range(5).select(F.col("id")).write.format("txn").mode(
                "append"
            ).save(root)

    def test_failed_write_publishes_nothing(self, spark, tmp_path):
        root = str(tmp_path / "t")
        spark.range(10).select(F.col("id")).write.format("txn").mode(
            "append"
        ).save(root)
        t = TxnTable(root)
        v = t.current_version()

        from pyspark.sql.functions import udf

        @udf("long")
        def boom(x):
            raise RuntimeError("task failure")

        with pytest.raises(Exception):
            spark.range(5).select(boom(F.col("id")).alias("id")).write.format(
                "txn"
            ).mode("append").save(root)
        assert t.current_version() == v  # nothing published
        assert t.read(spark).count() == 10
        # job-level failures can skip the abort hook (observed), so the
        # dead write's staging tree may linger — dot-prefixed, invisible
        # to every reader; the next writer sweeps stages past the age
        # where a live write could own them. Straggler tasks of the
        # CANCELLED job may re-create their task dirs asynchronously
        # (with fresh mtimes) even after a sweep, so the invariant is
        # "no AGED stage survives a new write" — retry until the
        # cancellation settles.
        lo = 10
        for _ in range(4):
            for d in os.listdir(root):
                if d.startswith(".wstage-"):
                    p = os.path.join(root, d)
                    os.utime(p, (os.path.getmtime(p) - 7200,) * 2)
            spark.range(lo, lo + 1).select(F.col("id")).write.format(
                "txn"
            ).mode("append").save(root)
            lo += 1
            if not [
                d for d in os.listdir(root) if d.startswith(".wstage-")
            ]:
                break
            time.sleep(1.0)  # let the cancelled job's stragglers settle
        left = [d for d in os.listdir(root) if d.startswith(".wstage-")]
        assert not left, left
        assert t.read(spark).count() == 10 + (lo - 10)

    def test_writer_table_streams_and_time_travels(self, spark, tmp_path):
        root = str(tmp_path / "t")
        spark.range(50).select(F.col("id")).write.format("txn").mode(
            "append"
        ).save(root)
        spark.range(50, 80).select(F.col("id")).write.format("txn").mode(
            "append"
        ).save(root)
        v1 = spark.read.format("txn").option("version", 1).load(root)
        assert v1.count() == 50
        out = _run_available_now(
            spark,
            root,
            str(tmp_path / "ck"),
            str(tmp_path / "out"),
            startingVersion="earliest",
        )
        assert out.count() == 80


class TestStreamWriter:
    """writeStream.format("txn") — native DSv2 streaming sink with the
    epoch-in-manifest exactly-once guarantee."""

    def _log(self, spark, tmp_path, n=40, shards=2):
        import json

        from rxlan_aws_lakehouse_spark.sources.replay_source import (
            ReplayLog,
            register_replay_source,
        )

        register_replay_source(spark)
        root = str(tmp_path / "log")
        os.makedirs(root)
        log = ReplayLog(root, n_shards=shards)
        log.put_many(
            [(i, json.dumps({"k": i})) for i in range(n)]
        )
        return log

    def _run(self, spark, log_root, troot, ckpt):
        q = (
            spark.readStream.format("replaylog")
            .option("startingPosition", "earliest")
            .load(log_root)
            .writeStream.format("txn")
            .option("path", troot)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_exactly_once_across_runs(self, spark, tmp_path):
        import json

        log = self._log(spark, tmp_path)
        troot, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")
        self._run(spark, log.root, troot, ckpt)
        t = TxnTable(troot)
        assert t.read(spark).count() == 40
        assert (
            t.lineage()[0]["extra"]["streaming_epoch_id"] == 0
        )
        log.put_many([(i, json.dumps({"k": i})) for i in range(40, 55)])
        self._run(spark, log.root, troot, ckpt)
        got = t.read(spark)
        assert got.count() == 55
        assert got.select("shard", "seq").distinct().count() == 55

    def test_replayed_epoch_skipped(self, spark, tmp_path):
        """Blow away the checkpoint so Spark replays batch 0 from
        scratch: the sink detects the already-recorded epoch in the
        manifest and appends nothing — exactly-once survives checkpoint
        loss as long as the TABLE survives."""
        import shutil

        log = self._log(spark, tmp_path)
        troot, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")
        self._run(spark, log.root, troot, ckpt)
        t = TxnTable(troot)
        v = t.current_version()
        shutil.rmtree(ckpt)
        self._run(spark, log.root, troot, ckpt)  # batch 0 replayed
        assert t.current_version() == v  # no new commit
        assert t.read(spark).count() == 40

    def test_complete_mode_refused(self, spark, tmp_path):
        log = self._log(spark, tmp_path, n=10)
        with pytest.raises(Exception, match="append output mode"):
            q = (
                spark.readStream.format("replaylog")
                .option("startingPosition", "earliest")
                .load(log.root)
                .groupBy("shard")
                .count()
                .writeStream.format("txn")
                .option("path", str(tmp_path / "t"))
                .option("checkpointLocation", str(tmp_path / "ck"))
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)


def test_stream_sink_then_maintain_lifecycle(spark, tmp_path):
    """Operational lifecycle: a capped stream drips many tiny appends
    into a txn table (one commit per micro-batch), then maintain() folds
    the small files away — the read is unchanged, the file count drops,
    and streaming can RESUME onto the compacted table (compact commits
    contribute nothing to the reader's offsets; epochs keep advancing)."""
    import json

    from rxlan_aws_lakehouse_spark.sources.replay_source import (
        ReplayLog,
        register_replay_source,
    )

    register_replay_source(spark)
    root = str(tmp_path / "log")
    os.makedirs(root)
    log = ReplayLog(root, n_shards=2)
    log.put_many([(i, json.dumps({"k": i})) for i in range(60)])
    troot, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("replaylog")
            .option("startingPosition", "earliest")
            .option("maxSeqsPerTrigger", 10)
            .load(root)
            .writeStream.format("txn")
            .option("path", troot)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # capped availableNow advances one batch per run: several runs =
    # several commits = lots of tiny files
    for _ in range(4):
        drain()
    t = TxnTable(troot)
    n_before = t.read(spark).count()
    files_before = len(t.files())
    assert n_before > 0 and files_before >= 4
    out = t.maintain(
        spark, target_file_bytes=64 * 1024 * 1024, min_files=4
    )
    assert out["compacted"] is True
    assert t.read(spark).count() == n_before
    assert len(t.files()) < files_before
    # stream resumes cleanly onto the compacted table
    log.put_many([(i, json.dumps({"k": i})) for i in range(60, 70)])
    for _ in range(3):
        drain()
    got = t.read(spark)
    total = got.count()
    assert got.select("shard", "seq").distinct().count() == total
    assert [m["operation"] for m in t.history()].count("compact") == 1


def test_batch_writer_merge_schema_evolution(spark, tmp_path):
    """option('mergeSchema','true'): an append with a NEW column evolves
    the table additively through the format — carried files read the
    column as typed NULLs, the recorded schema grows, earlier snapshots
    keep their own schema; without the option the same write refuses."""
    root = str(tmp_path / "t")
    spark.range(10).select(F.col("id")).write.format("txn").mode(
        "append"
    ).save(root)
    with pytest.raises(Exception, match="append schema mismatch"):
        spark.range(10, 12).select(
            F.col("id"), F.lit("x").alias("tag")
        ).write.format("txn").mode("append").save(root)
    spark.range(10, 12).select(
        F.col("id"), F.lit("x").alias("tag")
    ).write.format("txn").option("mergeSchema", "true").mode(
        "append"
    ).save(root)
    t = TxnTable(root)
    got = t.read(spark).orderBy("id")
    assert got.columns == ["id", "tag"]
    rows = got.collect()
    assert [r["tag"] for r in rows[:10]] == [None] * 10
    assert [r["tag"] for r in rows[10:]] == ["x", "x"]
    # the format reader honors the evolved recorded schema too
    assert spark.read.format("txn").load(root).count() == 12
    assert "tag" not in (
        spark.read.format("txn").option("version", 1).load(root).columns
    )
    # dropping a table column is still refused even under mergeSchema
    with pytest.raises(Exception, match="append schema mismatch"):
        spark.range(3).select(F.col("id").alias("tag")).write.format(
            "txn"
        ).option("mergeSchema", "true").mode("append").save(root)


def test_stream_writer_merge_schema_evolution(spark, tmp_path):
    """writeStream.format('txn').option('mergeSchema','true') with a NEW
    column must evolve the table additively at COMMIT time too, not just
    pass plan-time validation (regression: commit_staged was called
    without merge_schema, so every micro-batch failed loudly)."""
    import json

    from rxlan_aws_lakehouse_spark.sources.replay_source import (
        ReplayLog,
        register_replay_source,
    )

    register_replay_source(spark)
    lroot = str(tmp_path / "log")
    os.makedirs(lroot)
    log = ReplayLog(lroot, n_shards=2)
    log.put_many([(i, json.dumps({"k": i})) for i in range(20)])
    troot = str(tmp_path / "t")
    # existing table records only (shard, seq); the stream adds `data`
    spark.createDataFrame(
        [("pre", 0)], "shard string, seq long"
    ).write.format("txn").mode("append").save(troot)

    def run(opts, ck):
        w = (
            spark.readStream.format("replaylog")
            .option("startingPosition", "earliest")
            .load(lroot)
            .writeStream.format("txn")
            .option("path", troot)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
        )
        for k, v in opts.items():
            w = w.option(k, v)
        q = w.start()
        q.awaitTermination(120)
        return q

    with pytest.raises(Exception, match="schema mismatch"):
        run({}, "ck-refused")
    # fresh checkpoint: a batch that failed at sink-plan time leaves its
    # offsets uncommitted, and Spark's AvailableNow fallback for Python
    # stream sources does NOT re-execute it on restart (the documented
    # "may not guarantee processing new data if there is an uncommitted
    # batch" limitation) — the retry is a new query, not a recovery
    run({"mergeSchema": "true"}, "ck")
    t = TxnTable(troot)
    got = t.read(spark)
    assert got.count() == 21
    assert set(got.columns) == {"shard", "seq", "data"}
    assert (
        got.filter(F.col("shard") == "pre").collect()[0]["data"] is None
    )


def test_merge_task_dirs_loud_on_vanished_stage(tmp_path):
    """A commit message reporting rows whose staged dir vanished (e.g. a
    concurrent writer's orphan sweep reclaimed a slow job's stage) must
    fail the commit loudly, never publish an empty append."""
    from rxlan_aws_lakehouse_spark.sources.txn_source import (
        _TxnWriteResult,
        _merge_task_dirs,
    )

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    gone = os.path.join(stage, "task-dead")
    with pytest.raises(RuntimeError, match="vanished before commit"):
        _merge_task_dirs(
            stage, [_TxnWriteResult(task_dir=gone, n_rows=5)], "_m"
        )
    # an honestly-empty task (n_rows=0, dir missing) is fine
    _merge_task_dirs(
        stage, [_TxnWriteResult(task_dir=gone, n_rows=0)], "_m2"
    )


def test_overwrite_with_empty_dataframe_truncates(spark, tmp_path):
    """mode('overwrite') of an empty DataFrame publishes an EMPTY
    snapshot (Spark native writer semantics), both onto an existing
    table and as a fresh table."""
    root = str(tmp_path / "t")
    spark.range(10).write.format("txn").mode("append").save(root)
    t = TxnTable(root)
    assert t.read(spark).count() == 10
    spark.range(10).filter(F.col("id") < 0).write.format("txn").mode(
        "overwrite"
    ).save(root)
    got = t.read(spark)
    assert got.count() == 0
    assert got.columns == ["id"]
    # time travel still reaches the pre-truncate snapshot
    assert (
        spark.read.format("txn").option("version", 1).load(root).count()
        == 10
    )
    # fresh table from an empty frame: schema recorded, zero rows
    root2 = str(tmp_path / "t2")
    spark.createDataFrame([], "a int, b string").write.format(
        "txn"
    ).mode("overwrite").save(root2)
    got2 = spark.read.format("txn").load(root2)
    assert got2.count() == 0 and got2.columns == ["a", "b"]


def test_guard_filtered_plan_never_outlives_wrapped_action(
    spark, tmp_path
):
    """ADVICE r9 (medium): the guard must reset relation caches AFTER
    every wrapped action too, so a path outside the wrapped surface
    (here a raw ``_jdf.count()``) running next can never replay the
    preceding wrapped filtered action's pruned read list."""
    tbl = TxnTable(os.path.join(str(tmp_path), "t"))
    df0 = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 3).alias("val")
    )
    tbl.commit(df0.repartitionByRange(8, "id"), sort_within=["id"])
    df = spark.read.format("txn").load(tbl.root)
    assert df.filter(F.col("id") > 990).count() == 9  # wrapped+filtered
    # unguarded bypass immediately after: full result, not 9
    assert df._jdf.count() == 1000


def test_guard_wraps_v2_merge_and_stream_writer_surfaces():
    """writeTo(...)/mergeInto(...).merge()/writeStream.start() are part
    of the guarded action surface (ADVICE r9)."""
    from pyspark.sql.merge import MergeIntoWriter
    from pyspark.sql.readwriter import DataFrameWriterV2
    from pyspark.sql.streaming.readwriter import DataStreamWriter

    for cls, names in (
        (
            DataFrameWriterV2,
            ("append", "overwrite", "overwritePartitions", "create"),
        ),
        (MergeIntoWriter, ("merge",)),
        (DataStreamWriter, ("start", "toTable")),
    ):
        for n in names:
            assert getattr(
                getattr(cls, n), "__pushdown_guard__", False
            ), f"{cls.__name__}.{n} not guarded"


def test_raw_availablenow_fallback_skips_batch_failed_at_sink_plan(
    spark, tmp_path
):
    """Pins a SPARK recovery limitation (not ours): Python stream
    sources can't implement Trigger.AvailableNow, so Spark falls back
    to single-batch execution with an explicit warning that an
    UNCOMMITTED batch is not re-guaranteed. Measured here: a batch that
    fails at sink plan time leaves its offsets in the log; restarting
    the same checkpoint plans the next batch FROM those offsets instead
    of re-executing, silently skipping the range. Operational rule
    (documented in txn_source.py): after a plan-time sink failure,
    retry under a FRESH checkpoint. If a future Spark re-executes the
    batch, this assert flips and the rule can be retired."""
    import json

    from rxlan_aws_lakehouse_spark.sources.replay_source import (
        ReplayLog,
        register_replay_source,
    )

    register_replay_source(spark)
    lroot = str(tmp_path / "log")
    os.makedirs(lroot)
    log = ReplayLog(lroot, n_shards=2)
    log.put_many([(i, json.dumps({"k": i})) for i in range(20)])
    troot = str(tmp_path / "t")
    spark.createDataFrame(
        [("pre", 0)], "shard string, seq long"
    ).write.format("txn").mode("append").save(troot)

    def run(opts):
        w = (
            spark.readStream.format("replaylog")
            .option("startingPosition", "earliest")
            .load(lroot)
            .writeStream.format("txn")
            .option("path", troot)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
        )
        for k, v in opts.items():
            w = w.option(k, v)
        q = w.start()
        q.awaitTermination(120)

    with pytest.raises(Exception, match="schema mismatch"):
        run({})  # batch 0 fails at sink plan; offsets 0 already logged
    run({"mergeSchema": "true"})  # SAME checkpoint: batch is skipped
    assert TxnTable(troot).read(spark).count() == 1  # rows 0-19 LOST


def test_guard_overhead_bounded_and_cached(spark, tmp_path):
    """The guard's per-action cost on NON-txn frames is one analyzed-plan
    leaf walk, cached per DataFrame object (pushdown_guard.py documents
    the measured numbers: ~0.4 ms/leaf first call, ~0 after). Regression
    bound: the walk must stay well under 50 ms on a 1-leaf plan and the
    cached path under 5 ms — generous enough for CI noise, tight enough
    to catch an accidental O(plan) py4j blowup."""
    import time as _time

    from rxlan_aws_lakehouse_spark.sources.pushdown_guard import (
        _cached_relations,
    )

    p = str(tmp_path / "plain")
    spark.range(1000).write.parquet(p)
    df = spark.read.parquet(p)
    df.count()  # analyze + warm the action path
    df.__dict__.pop("_pdg_rels", None)
    t0 = _time.perf_counter()
    rels = _cached_relations(df)
    first = _time.perf_counter() - t0
    assert rels == []  # no python relations in a parquet scan
    assert "_pdg_rels" in df.__dict__  # negative result cached
    t0 = _time.perf_counter()
    for _ in range(10):
        _cached_relations(df)
    cached = (_time.perf_counter() - t0) / 10
    assert first < 0.050, f"first walk {first * 1000:.1f} ms"
    assert cached < 0.005, f"cached walk {cached * 1000:.2f} ms"
    # and the guarded action is still correct
    assert df.count() == 1000


def test_stream_static_join_with_txn_static_side(spark, tmp_path):
    """A txn batch relation as the STATIC side of a stream-static join:
    the guard now wraps DataStreamWriter.start, so the stream's initial
    plan sees a clean relation cache even right after a wrapped filtered
    action on the same frame (ADVICE r9 medium). Every streamed record
    must find its dimension row."""
    import json

    from rxlan_aws_lakehouse_spark.sources.replay_source import (
        ReplayLog,
        register_replay_source,
    )

    register_replay_source(spark)
    dim_root = str(tmp_path / "dim")
    dim_tbl = TxnTable(dim_root)
    dim_tbl.commit(
        spark.range(0, 100).select(
            F.col("id").alias("k"),
            F.concat(F.lit("name-"), F.col("id")).alias("name"),
        ).repartitionByRange(4, "k"),
        sort_within=["k"],
    )
    dim = spark.read.format("txn").load(dim_root)
    # poison attempt: a wrapped filtered action right before start()
    assert dim.filter(F.col("k") > 90).count() == 9

    lroot = str(tmp_path / "log")
    os.makedirs(lroot)
    log = ReplayLog(lroot, n_shards=2)
    log.put_many(
        [(i, json.dumps({"k": i % 100})) for i in range(500)]
    )
    sink = str(tmp_path / "sink")
    q = (
        spark.readStream.format("replaylog")
        .option("startingPosition", "earliest")
        .load(lroot)
        .select(
            F.from_json("data", "k long").alias("r")
        )
        .select("r.k")
        .join(dim, "k", "left")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == 500
    # a stale filtered dim cache would leave most names NULL
    assert got.filter(F.col("name").isNull()).count() == 0
