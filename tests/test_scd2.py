"""SCD2 interval maintenance: ordering, closing, no-change suppression."""

from __future__ import annotations

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.ops.scd2 import OPEN_END, scd2_apply


def _ts(s):
    return f"{s} 00:00:00"


def test_scd2_closes_intervals_and_suppresses_no_change(spark):
    current = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01"), OPEN_END),
            (2, "B", _ts("2024-01-01"), OPEN_END),
            # key 3 already has history: closed row + open row
            (3, "X", _ts("2023-01-01"), _ts("2023-06-01")),
            (3, "Y", _ts("2023-06-01"), OPEN_END),
        ],
        "c long, seg string, valid_from string, valid_to string",
    ).select(
        "c", "seg",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    updates = spark.createDataFrame(
        [
            (1, "A", _ts("2024-02-01")),   # no-change: suppressed
            (1, "C", _ts("2024-03-01")),   # real change
            (2, "D", _ts("2024-02-01")),   # two updates, one batch
            (2, "E", _ts("2024-04-01")),
            (3, "Y", _ts("2024-05-01")),   # no-change vs open row
        ],
        "c long, seg string, ts string",
    ).select("c", "seg", F.col("ts").cast("timestamp").alias("ts"))
    hist = scd2_apply(current, updates, keys=["c"], attr_cols=["seg"])
    rows = {
        (r["c"], r["seg"]): (
            str(r["valid_from"])[:10], str(r["valid_to"])[:10]
        )
        for r in hist.collect()
    }
    assert rows[(1, "A")] == ("2024-01-01", "2024-03-01")  # closed by C
    assert rows[(1, "C")] == ("2024-03-01", "9999-12-31")
    assert rows[(2, "B")] == ("2024-01-01", "2024-02-01")
    assert rows[(2, "D")] == ("2024-02-01", "2024-04-01")
    assert rows[(2, "E")] == ("2024-04-01", "9999-12-31")
    assert rows[(3, "X")] == ("2023-01-01", "2023-06-01")  # closed passthrough
    assert rows[(3, "Y")] == ("2023-06-01", "9999-12-31")  # suppressed update
    assert len(rows) == 7
    # idempotence: re-applying the same batch adds nothing
    again = scd2_apply(hist, updates, keys=["c"], attr_cols=["seg"])
    assert again.count() == hist.count()


def test_scd2_wave_merge_is_file_granular(spark, tmp_path):
    """Composing scd2_apply with TxnTable.merge_upsert on the exceptAll
    delta must carry untouched files by reference — a wave touching a few
    keys cannot rewrite the whole dimension."""
    import os

    from rxlan_aws_lakehouse_spark.txn import TxnTable

    t = TxnTable(str(tmp_path / "dim"))
    base = spark.range(400).select(
        F.col("id").alias("k"),
        F.lit("A").alias("seg"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
    )
    t.commit(base.repartitionByRange(8, "k"), sort_within=["k"])
    v1 = t.current_version()

    def inodes(v):
        d = os.path.join(t.root, "_versions", v)
        return {
            os.path.relpath(os.path.join(r, n), d): os.stat(
                os.path.join(r, n)
            ).st_ino
            for r, _dd, ns in os.walk(d)
            for n in ns
            if n.endswith(".parquet")
        }
    old = inodes(v1)
    # wave touches keys 0..9 only (first range partition)
    u = spark.range(10).select(
        F.col("id").alias("k"),
        F.lit("B").alias("seg"),
        F.lit("2024-02-01 00:00:00").cast("timestamp").alias("ts"),
    )
    current = t.read(spark)
    hist = scd2_apply(current, u, keys=["k"], attr_cols=["seg"])
    delta = hist.exceptAll(current)
    assert delta.count() == 20  # 10 closed rewrites + 10 new versions
    v2 = t.merge_upsert(
        spark, delta, keys=["k", "valid_from"], validate_keys=False
    )
    new = inodes(v2)
    carried = {p for p in new if p in old and new[p] == old[p]}
    # at least 7 of the 8 range files carried untouched
    assert len(carried) >= 7, f"only {len(carried)} carried"
    got = t.read(spark)
    # 400 base rows, 10 closed IN PLACE (same (k, valid_from) merge key),
    # 10 new open versions inserted
    assert got.count() == 410
    assert got.filter(F.col("seg") == "B").count() == 10
    # open intervals: every key has exactly one OPEN row
    opens = got.filter(
        F.col("valid_to") == F.lit(OPEN_END).cast("timestamp")
    )
    assert opens.count() == 400
