"""Unit tests for the as-of join (union + window pattern)."""

from __future__ import annotations

import datetime as dt

from rxlan_aws_lakehouse_spark.ops.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T00:10:00"), 1),
            ("k1", _ts("2024-01-01T00:30:00"), 2),
            ("k2", _ts("2024-01-01T00:05:00"), 3),
        ],
        "key string, lts timestamp, lval int",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T00:00:00"), "r0"),
            ("k1", _ts("2024-01-01T00:10:00"), "r1"),  # tie with left row 1
            ("k1", _ts("2024-01-01T00:20:00"), "r2"),
            ("k2", _ts("2024-01-01T00:06:00"), "r3"),  # after left -> no match
        ],
        "key string, rts timestamp, rpay string",
    )
    out = {
        r["lval"]: r["rpay_right"]
        for r in asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts").collect()
    }
    assert out[1] == "r1"  # inclusive: right.ts <= left.ts, tie matches
    assert out[2] == "r2"  # most recent prior
    assert out[3] is None  # nothing at-or-before -> left-outer NULL


def test_asof_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01T01:00:00"), i) for i in range(10)],
        "key string, lts timestamp, lval int",
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01T00:00:00"), "x")],
        "key string, rts timestamp, rpay string",
    )
    out = asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts")
    assert out.count() == 10
    assert all(r["rpay_right"] == "x" for r in out.collect())
