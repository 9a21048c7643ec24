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
