"""Unit tests for embedding similarity operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.ops import similarity as sim


def test_dot_norm_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]), ([1.0, 2.0, 2.0], [1.0, 2.0, 2.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        sim.dot(F.col("a"), F.col("b")).alias("d"),
        sim.l2_norm(F.col("a")).alias("n"),
        sim.cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()
    assert rows[0]["d"] == 0.0 and rows[0]["c"] == 0.0
    assert math.isclose(rows[1]["n"], 3.0)
    assert math.isclose(rows[1]["c"], 1.0)


def test_cosine_topk_excludes_self_and_ranks(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    prepped = sim.prepare(vecs)
    out = sim.cosine_topk(prepped, prepped.filter(F.col("vec_id") == 1), k=2)
    rows = out.orderBy(F.desc("sim")).collect()
    assert [r["neighbor_id"] for r in rows] == [2, 3]
    assert all(r["query_id"] == 1 for r in rows)


def test_sign_bucket_groups_similar_vectors(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 1.0, 1.0, 1.0]),
            (2, [2.0, 3.0, 4.0, 5.0]),
            (3, [-1.0, 1.0, 1.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    b = {r["vec_id"]: r["bucket"] for r in sim.prepare(vecs).collect()}
    assert b[1] == b[2] == "1111"
    assert b[3] == "0111"
