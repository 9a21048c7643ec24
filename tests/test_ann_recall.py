"""ANN recall floors: the inverted-list cap must not sink recall on a
structured corpus, and capped recall can never exceed uncapped.

The corpus is fully deterministic (sin-derived vectors, no RNG): adjacent
ids give correlated vectors, the regime real embeddings live in (true
neighbors agree on most sign bits). Random vectors are the LSH worst case
and are measured separately in tools/ann_recall.py / SCALING.md — floors
there would assert noise, floors here assert the design works where it is
designed to work.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.ops import similarity as sim

N, DIM, K, N_QUERIES = 20_000, 64, 3, 50


@pytest.fixture(scope="module")
def corpus(spark):
    vec = F.array(
        *[F.sin(F.col("id") * (i + 1) * 0.7 + i) for i in range(DIM)]
    )
    emb = spark.range(N).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    prepared = sim.prepare(emb).persist()
    mt = sim.prepare_multitable(emb).persist()
    qids = list(range(0, N, N // N_QUERIES))[:N_QUERIES]
    queries = prepared.filter(F.col("vec_id").isin(qids))
    exact = sim.cosine_topk(prepared, queries, k=K).persist()
    exact.count()
    yield prepared, mt, qids, exact
    for df in (prepared, mt, exact):
        df.unpersist()


def _recall(exact, ann) -> float:
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            ann.select(
                F.col("vec_id").alias("query_id"), "neighbor_id"
            ).distinct(),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .count()
    )
    return hits / (N_QUERIES * K)


def test_multitable_capped_recall_floor(spark, corpus):
    prepared, mt, qids, exact = corpus
    r = _recall(
        exact, sim.ann_topk_multitable(mt, k=K, query_ids=qids)
    )  # default ANN_MAX_LIST cap
    assert r >= 0.9, f"capped multitable recall@{K} = {r:.3f}"


def test_multitable_uncapped_recall_and_cap_monotonicity(spark, corpus):
    prepared, mt, qids, exact = corpus
    r_uncapped = _recall(
        exact, sim.ann_topk_multitable(mt, k=K, max_list=None, query_ids=qids)
    )
    r_capped = _recall(
        exact, sim.ann_topk_multitable(mt, k=K, query_ids=qids)
    )
    assert r_uncapped >= 0.98, f"uncapped recall@{K} = {r_uncapped:.3f}"
    # the cap only DROPS candidate pairs: it can never add recall
    assert r_capped <= r_uncapped + 1e-9


def test_legacy_bucketed_recall_floor(spark, corpus):
    prepared, mt, qids, exact = corpus
    r = _recall(exact, sim.ann_topk_bucketed(prepared, k=K, query_ids=qids))
    assert r >= 0.9, f"legacy 16-bucket recall@{K} = {r:.3f}"


def test_rotated_recall_floor_and_engine_exact_buckets(spark, corpus):
    """Rotated (Rademacher) hyperplanes at 8 bits: on the structured
    corpus the finer lists stay under the cap and recall holds the same
    floor as the axis-aligned index — while on the near-random worst
    case (tools/ann_recall.py, SCALING.md r6) the extra bits are what
    lift capped recall 0.170 -> 0.308+ at LOWER cost. Also pins that the
    fixed-point quantization makes bucket keys pure functions of the
    data (stable across independent prepares)."""
    prepared, mt, qids, exact = corpus
    emb = prepared.select(
        "vec_id", F.col("vec").alias("embedding")
    )
    rot = sim.prepare_multitable_rotated(emb, bits=8).persist()
    try:
        r = _recall(
            exact, sim.ann_topk_multitable(rot, k=K, query_ids=qids)
        )
        assert r >= 0.9, f"rotated 8-bit capped recall@{K} = {r:.3f}"
        again = sim.prepare_multitable_rotated(emb, bits=8)
        assert (
            rot.select("vec_id", "bucket_0")
            .exceptAll(again.select("vec_id", "bucket_0"))
            .count()
            == 0
        )
    finally:
        rot.unpersist()
