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


def test_legacy_bucketed_uncapped_recall_floor(spark, corpus):
    """The 16-bucket index's recall property holds on the UNCAPPED scan
    (max_list=None, an explicit opt-in): neighbors share sign buckets on
    the structured corpus. The default is capped — bounded cost replaces
    the Σ|bucket|² blow-up, recall degrading with corpus/16 over the cap
    BY DESIGN; the rotated multi-table index is the path that keeps both
    (floors asserted at 20k in the tests above/below)."""
    prepared, mt, qids, exact = corpus
    r = _recall(
        exact,
        sim.ann_topk_bucketed(
            prepared, k=K, query_ids=qids, max_list=None
        ),
    )
    assert r >= 0.9, f"legacy 16-bucket uncapped recall@{K} = {r:.3f}"


def test_legacy_bucketed_cap_bounds_candidates_at_scale(spark, corpus):
    """At 20k vectors (lists ~1250 >> cap) the capped legacy plan's
    candidate volume is bounded by n_queries * max_list — the quadratic
    Σ|bucket|² blow-up is gone. Recall there is NOT asserted: losing it
    is the documented price of bounding a 16-list index, and the reason
    emb_neardup/emb_ann_* ride the multi-table indexes."""
    prepared, mt, qids, exact = corpus
    # Assert on the CANDIDATE stage, not the k-bounded output (which any
    # top-k satisfies, cap or no cap — ADVICE r7): the capped join's pair
    # volume is <= n_queries * max_list, while at 20k vectors the
    # uncapped 16-list index produces strictly more pairs.
    capped = sim.bucketed_candidate_pairs(prepared, query_ids=qids).count()
    assert capped <= N_QUERIES * sim.ANN_MAX_LIST, capped
    uncapped = sim.bucketed_candidate_pairs(
        prepared, query_ids=qids, max_list=None
    ).count()
    assert uncapped > capped, (uncapped, capped)
    # and the ranked output built on those candidates is still a top-k
    ann = sim.ann_topk_bucketed(prepared, k=K, query_ids=qids)
    assert ann.count() <= N_QUERIES * K


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


def test_auto_bits_sizing_rule():
    """bits = ceil(log2(n / (cap/2))) clamped to [6, 16] — the SCALING.md
    r6 rule, now code instead of a docstring convention."""
    assert sim.auto_bits(0) == 6
    assert sim.auto_bits(2_000) == 6       # under the floor's reach
    assert sim.auto_bits(20_000) == 8      # one decade up: finer buckets
    assert sim.auto_bits(200_000) == 11
    assert sim.auto_bits(2_000_000) == 14
    assert sim.auto_bits(10**9) == 16      # cap: plane cost stays bounded
    # monotone non-decreasing in n
    vals = [sim.auto_bits(n) for n in (10, 10**3, 10**5, 10**7, 10**9)]
    assert vals == sorted(vals)


def test_autosized_rotated_recall_floor_two_decades(spark, corpus):
    """Auto-sizing end-to-end (r6 verdict #3): prepare the rotated index
    with NO bits argument at two corpus decades (2k and 20k vectors).
    The bit budget derives from the corpus count — a 10x-bigger corpus
    gets finer buckets automatically — and the recall floor holds at
    both scales."""
    prepared, mt, qids, exact = corpus
    # decade 2: the module fixture's 20k corpus (auto -> 8 bits)
    emb20k = prepared.select("vec_id", F.col("vec").alias("embedding"))
    rot20k = sim.prepare_multitable_rotated(emb20k).persist()
    try:
        assert "bucket_0" in rot20k.columns
        # auto-sized key width: 8 bucket chars at 20k (vs the 6-bit floor)
        assert len(rot20k.select("bucket_0").first()["bucket_0"]) == 8
        r = _recall(
            exact, sim.ann_topk_multitable(rot20k, k=K, query_ids=qids)
        )
        assert r >= 0.9, f"auto-sized rotated recall@{K} at 20k = {r:.3f}"
    finally:
        rot20k.unpersist()
    # decade 1: 2k vectors (auto -> the 6-bit floor)
    n1 = 2_000
    emb2k = emb20k.filter(F.col("vec_id") < n1)
    rot2k = sim.prepare_multitable_rotated(emb2k).persist()
    try:
        assert len(rot2k.select("bucket_0").first()["bucket_0"]) == 6
        qids1 = list(range(0, n1, n1 // N_QUERIES))[:N_QUERIES]
        p1 = sim.prepare(emb2k)
        exact1 = sim.cosine_topk(
            p1, p1.filter(F.col("vec_id").isin(qids1)), k=K
        )
        r1 = _recall(
            exact1, sim.ann_topk_multitable(rot2k, k=K, query_ids=qids1)
        )
        assert r1 >= 0.9, f"auto-sized rotated recall@{K} at 2k = {r1:.3f}"
    finally:
        rot2k.unpersist()
