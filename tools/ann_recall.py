"""ANN recall probe: what the inverted-list cap actually costs.

Round 4 bounded the multi-table LSH kNN-graph join with a per-list
candidate cap (``ops.similarity.ANN_MAX_LIST``): overflowing lists keep a
deterministic ``max_list``-row sample of their candidate side, which kills
the quadratic join but DROPS candidate pairs. This probe measures the
recall cost of that trade: for a deterministic sample of query vectors it
computes exact cosine top-k ground truth (``cosine_topk``), then runs the
ANN paths at several cap settings and reports

    recall@k  =  mean over sampled queries of |ann_topk ∩ exact_topk| / k

alongside wall time — the recall/cost trade the cap tunes. The legacy
single-table index (``ann_topk_bucketed``, 16 buckets, no cap) is measured
too as the uncapped reference point.

Usage: python tools/ann_recall.py [corpus_dir] [k] [n_queries]
       corpus_dir: dir holding embeddings.parquet
                   (default /root/repo/.scratch/docs10; falls back to
                    /root/testdata/sf0.1 when absent)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.catalog import load
from rxlan_aws_lakehouse_spark.ops import similarity as sim
from rxlan_aws_lakehouse_spark.session import get_spark


def sample_query_ids(emb, n: int) -> list[int]:
    """Deterministic pseudo-random sample: first n vec_ids in md5 order."""
    rows = (
        emb.select("vec_id")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(n)
        .collect()
    )
    return [r["vec_id"] for r in rows]


def recall_at_k(ann_df, exact_df, k: int) -> float:
    """Mean |ann ∩ exact| / k per query (queries = exact's key set)."""
    hit = exact_df.select("query_id", "neighbor_id").join(
        ann_df.select(
            F.col("vec_id").alias("query_id"), "neighbor_id"
        ).distinct(),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    per_q = (
        exact_df.select("query_id")
        .distinct()
        .join(
            hit.groupBy("query_id").agg(F.count("*").alias("h")),
            "query_id",
            "left",
        )
        .select(F.coalesce(F.col("h"), F.lit(0)).alias("h"))
        .agg(F.avg(F.col("h") / F.lit(float(k))))
        .first()[0]
    )
    return float(per_q)


def main() -> None:
    default_dir = "/root/repo/.scratch/docs10"
    if not os.path.exists(os.path.join(default_dir, "embeddings.parquet")):
        default_dir = "/root/testdata/sf0.1"
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else default_dir
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    spark = get_spark("ann-recall")
    emb = load(spark, corpus_dir, "embeddings")
    n_vecs = emb.count()
    print(f"corpus: {corpus_dir} ({n_vecs} vectors), k={k}, sample={n_queries}")

    qids = sample_query_ids(emb, n_queries)
    prepared = sim.prepare(emb).persist()
    queries = prepared.filter(F.col("vec_id").isin(qids))

    t0 = time.perf_counter()
    exact = sim.cosine_topk(prepared, queries, k=k).persist()
    exact.count()
    t_exact = time.perf_counter() - t0
    print(f"exact ground truth: {t_exact:.2f}s")

    mt = sim.prepare_multitable(emb).persist()
    mt.count()

    # Recall via the query-restricted graph slice (cheap: the candidate
    # lists stay whole, so recall is identical to the full graph's for the
    # sampled queries). Full-graph wall time measured separately, capped
    # settings only — the uncapped full graph is the quadratic the cap
    # exists to avoid, so it only runs on small corpora.
    print("| path | cap | recall@k | full-graph wall |")
    print("|---|---|---|---|")
    caps: list[int | None] = [64, 128, 256, 512, None]
    for cap in caps:
        # recall is measured on the query-restricted slice (cheap, exact
        # for the sampled queries); the full-graph wall only runs where it
        # is bounded: capped at the default, or any setting on a small
        # corpus. The uncapped full graph is the quadratic the cap avoids.
        r = recall_at_k(
            sim.ann_topk_multitable(mt, k=k, max_list=cap, query_ids=qids),
            exact,
            k,
        )
        if n_vecs <= 50_000 or cap == sim.ANN_MAX_LIST:
            t0 = time.perf_counter()
            sim.ann_topk_multitable(mt, k=k, max_list=cap).count()
            wall_s = f"{time.perf_counter() - t0:.2f}s"
        else:
            wall_s = "—"
        cap_s = "uncapped" if cap is None else str(cap)
        print(f"| multitable | {cap_s} | {r:.3f} | {wall_s} |", flush=True)

    mt.unpersist()

    # Rotated (Rademacher) hyperplanes: bits are no longer bounded by the
    # vector dimensionality, so the bit budget can grow with log(corpus)
    # to keep lists UNDER the cap — the knob axis-aligned planes lack.
    # All configs run at the default cap; the win to look for is the
    # bits-scaled config recovering most of the uncapped recall the
    # axis-aligned index forfeits to cap drops.
    for n_tables, bits in ((8, 6), (8, 8), (8, 10), (16, 8)):
        rot = sim.prepare_multitable_rotated(
            emb, bits=bits, n_tables=n_tables
        ).persist()
        rot.count()
        r = recall_at_k(
            sim.ann_topk_multitable(
                rot, k=k, n_tables=n_tables, query_ids=qids
            ),
            exact,
            k,
        )
        t0 = time.perf_counter()
        sim.ann_topk_multitable(rot, k=k, n_tables=n_tables).count()
        wall_s = f"{time.perf_counter() - t0:.2f}s"
        print(
            f"| rotated {n_tables}t x {bits}b | {sim.ANN_MAX_LIST} "
            f"| {r:.3f} | {wall_s} |",
            flush=True,
        )
        rot.unpersist()

    r = recall_at_k(
        sim.ann_topk_bucketed(prepared, k=k, query_ids=qids), exact, k
    )
    if n_vecs <= 50_000:
        t0 = time.perf_counter()
        sim.ann_topk_bucketed(prepared, k=k).count()
        wall_s = f"{time.perf_counter() - t0:.2f}s"
    else:
        wall_s = "skipped (uncapped 16-bucket graph is quadratic here)"
    print(f"| legacy 16-bucket | uncapped | {r:.3f} | {wall_s} |", flush=True)


if __name__ == "__main__":
    main()
