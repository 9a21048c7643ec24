"""Z-order clustering tests: Morton code correctness + the locality payoff
(a 2D box query touches fewer files than under single-column sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.ops.zorder import interleave_bits, zorder_write


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "a int, b int"
    )
    out = [
        r["z"]
        for r in df.select(
            interleave_bits([F.col("a"), F.col("b")], bits=4).alias("z")
        ).collect()
    ]
    # bit i of a -> position 2i; bit i of b -> position 2i+1
    # (3,5): a=0b011 -> 1,4 ; b=0b101 -> 2,32 -> z = 1+4+2+32 = 39
    assert out == [0, 1, 2, 3, 39]


def _prunable_files(spark, path, col, lo, hi):
    """Files a min/max-stats pruner must read for `col BETWEEN lo AND hi`:
    those whose per-file range overlaps the predicate range."""
    stats = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
    )
    total = stats.count()
    overlapping = stats.filter((F.col("mx") >= lo) & (F.col("mn") <= hi)).count()
    return overlapping, total


def test_zorder_improves_secondary_column_skipping(spark, tmp_path):
    """Under a single-column x sort, a predicate on y prunes NOTHING (every
    file spans the full y range); under z-order each file covers a 2D tile,
    so a y-band predicate skips most files."""
    n = 20000
    # independent dimensions (multiplicative-hash columns of the same id are
    # linearly related mod the modulus — that correlation would let even an
    # x-sort prune on y)
    data = spark.range(n).select(
        F.col("id"),
        F.floor(F.rand(seed=1) * 1000).cast("double").alias("x"),
        F.floor(F.rand(seed=2) * 1000).cast("double").alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(data, zpath, ["x", "y"], n_files=32)
    (
        data.repartitionByRange(32, F.col("x"))
        .sortWithinPartitions("x")
        .write.parquet(lpath)
    )

    z_read, z_total = _prunable_files(spark, zpath, "y", 400, 450)
    l_read, l_total = _prunable_files(spark, lpath, "y", 400, 450)
    assert l_read == l_total  # x-sort: y stats useless, every file read
    assert z_read < z_total / 2, f"z-order reads {z_read}/{z_total}"
    # and the x column still skips too (z-order serves both dimensions)
    zx_read, _ = _prunable_files(spark, zpath, "x", 400, 450)
    assert zx_read < z_total / 2


def test_zorder_preserves_data(spark, tmp_path):
    data = spark.range(1000).select(
        F.col("id"), (F.col("id") % 31).cast("double").alias("x"),
        (F.col("id") % 17).cast("double").alias("y"),
    )
    path = str(tmp_path / "z")
    zorder_write(data, path, ["x", "y"])
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("id")).head()[0] == sum(range(1000))
    assert sorted(back.columns) == ["id", "x", "y"]


def test_approx_zorder_skips_without_global_window(spark, tmp_path):
    """The approx path must deliver the same 2D skipping WITHOUT the
    exact path's single-reducer global rank window: plan contains no
    Window at all, and a y-band predicate still prunes most files."""
    n = 20000
    data = spark.range(n).select(
        F.col("id"),
        F.floor(F.rand(seed=1) * 1000).cast("double").alias("x"),
        F.floor(F.rand(seed=2) * 1000).cast("double").alias("y"),
    )
    from rxlan_aws_lakehouse_spark.ops.zorder import quantile_normalize

    norm = quantile_normalize(data, "y")
    plan = data.select(norm.alias("b"))._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    zpath = str(tmp_path / "zapprox")
    zorder_write(data, zpath, ["x", "y"], n_files=32, approx=True)
    z_read, z_total = _prunable_files(spark, zpath, "y", 400, 450)
    assert z_read < z_total / 2, f"approx z-order reads {z_read}/{z_total}"
    zx_read, _ = _prunable_files(spark, zpath, "x", 400, 450)
    assert zx_read < z_total / 2
    # layout-only: data round-trips exactly
    assert spark.read.parquet(zpath).count() == n


def test_txn_zorder_by_uses_approx_path_no_global_window(spark, tmp_path, monkeypatch):
    """Regression (r10 verdict, "what's wrong" #1): ``TxnTable.zorder_by``
    — the path ``OPTIMIZE t ZORDER BY (...)`` routes through — must
    normalize via the sampled-quantile map, NEVER the exact
    percent_rank window (a single-reducer global sort at 100 TB). We
    intercept the frame the rewrite would commit and assert its
    physical plan carries no Window operator."""
    from rxlan_aws_lakehouse_spark.txn import TxnTable

    root = str(tmp_path / "t")
    t = TxnTable(root)
    df = spark.range(5000).select(
        F.col("id"),
        F.floor(F.rand(seed=3) * 100).cast("double").alias("x"),
        F.floor(F.rand(seed=4) * 100).cast("double").alias("y"),
    )
    t.commit(df)

    captured = {}
    real_commit = TxnTable.commit

    def spy(self, frame, **kw):
        captured["plan"] = (
            frame._jdf.queryExecution().executedPlan().toString()
        )
        return real_commit(self, frame, **kw)

    monkeypatch.setattr(TxnTable, "commit", spy)
    t.zorder_by(spark, ["x", "y"], n_files=4)
    assert "plan" in captured
    assert "Window" not in captured["plan"], captured["plan"]
    assert "percent_rank" not in captured["plan"]
    # the rewrite itself landed and preserved the rows
    assert t.read(spark).count() == 5000


def test_router_optimize_zorder_no_global_window(spark, tmp_path, monkeypatch):
    """Same guarantee one layer up: the SQL router's ``OPTIMIZE ...
    ZORDER BY`` statement plans no global Window sort."""
    from rxlan_aws_lakehouse_spark.sql_dml import TxnSqlRouter
    from rxlan_aws_lakehouse_spark.txn import TxnTable

    root = str(tmp_path / "t")
    t = TxnTable(root)
    df = spark.range(3000).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 89).cast("double").alias("y"),
    )
    t.commit(df)
    router = TxnSqlRouter(spark)
    router.register("zt", t)

    captured = {}
    real_commit = TxnTable.commit

    def spy(self, frame, **kw):
        captured["plan"] = (
            frame._jdf.queryExecution().executedPlan().toString()
        )
        return real_commit(self, frame, **kw)

    monkeypatch.setattr(TxnTable, "commit", spy)
    router.sql("OPTIMIZE zt ZORDER BY (x, y)")
    assert "plan" in captured
    assert "Window" not in captured["plan"], captured["plan"]
