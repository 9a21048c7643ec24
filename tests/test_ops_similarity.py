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


def test_pandas_path_matches_jvm_path(spark):
    """The numpy mapInPandas scorer and the JVM expression scorer must
    return identical top-k (same ranks, same rounded sims)."""
    from rxlan_aws_lakehouse_spark.catalog import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = sim.prepare(e)
    queries = corpus.filter(F.col("vec_id") < 3)
    jvm = {(r["query_id"], r["neighbor_id"], r["sim"]) for r in sim.cosine_topk(corpus, queries, k=5).collect()}
    py = {(r["query_id"], r["neighbor_id"], r["sim"]) for r in sim.cosine_topk_pandas(corpus, queries, k=5).collect()}
    assert jvm == py


def test_ivf_exact_within_probed_list(spark):
    """IVF is exact within the probed inverted list: for each query, its
    results must equal brute force restricted to the probe label's vectors.
    (Cross-list recall depends on how clustered the corpus is — the fixture
    labels are unclustered, so that is not a testable invariant here.)"""
    from rxlan_aws_lakehouse_spark.catalog import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    v = e.select("vec_id", "label", sim.as_double_array(F.col("embedding")).alias("vec"))
    v = v.withColumn("norm", sim.l2_norm(F.col("vec")))
    queries = v.filter(F.col("vec_id") < 10)
    ivf_rows = sim.ivf_topk(v, queries, k=5).collect()
    assert len({r["query_id"] for r in ivf_rows}) == 10
    by_query = {}
    for r in ivf_rows:
        by_query.setdefault(r["query_id"], []).append(r)
    label_of = {r["vec_id"]: r["label"] for r in v.select("vec_id", "label").collect()}
    for qid, rows in by_query.items():
        probe = rows[0]["probe_label"]
        # every neighbor comes from the probed list
        assert all(label_of[r["neighbor_id"]] == probe for r in rows)
        # and matches brute force over that list alone
        restricted = v.filter(F.col("label") == probe).select("vec_id", "vec", "norm")
        q = queries.filter(F.col("vec_id") == qid).select("vec_id", "vec", "norm")
        brute = {
            (r["neighbor_id"], r["sim"])
            for r in sim.cosine_topk(restricted, q, k=5).collect()
        }
        assert {(r["neighbor_id"], r["sim"]) for r in rows} == brute


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


def test_multitable_recall_beats_legacy_at_scale_buckets(spark):
    """The scale index (8 tables x 6 bits, 64 buckets each — 512 inverted
    lists total) must not lose recall vs the legacy 16-bucket single table,
    measured against exact brute-force top-3 at sf0.1."""
    sf = "/root/testdata/sf0.1"
    from rxlan_aws_lakehouse_spark.catalog import load

    e = load(spark, sf, "embeddings")
    prepared = sim.prepare(e)
    queries = prepared.filter(F.col("vec_id") < 50)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(prepared, queries, k=3).collect()
    }

    def recall(df):
        got = {(r["vec_id"], r["neighbor_id"]) for r in df.filter(F.col("vec_id") < 50).collect()}
        return len(got & truth) / len(truth)

    legacy = recall(sim.ann_topk_bucketed(prepared, k=3))
    multi = recall(sim.ann_topk_multitable(sim.prepare_multitable(e), k=3))
    assert multi >= legacy, (multi, legacy)
    assert multi > 0.3, multi  # floor on synthetic near-random vectors

    # inverted-list cardinality actually scales: 2^6 keys per table x 8
    # tables, realized well past the legacy index's 16 total
    mt = sim.prepare_multitable(e)
    total = 0
    for t in range(sim.LSH_MULTITABLE_TABLES):
        n = mt.select(f"bucket_{t}").distinct().count()
        assert n > 32, (t, n)
        total += n
    assert total >= 256, total


def test_ivf_probe_join_not_force_broadcast(spark):
    """The probe-side join must NOT force-broadcast the assignment table:
    |assign| = |queries| x n_probe is unbounded (a corpus-sized query set
    would OOM a forced build side). Only the |labels|-row centroid table
    may carry an explicit hint; the assign side is left to AQE."""
    from rxlan_aws_lakehouse_spark.catalog import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    v = e.select("vec_id", "label", sim.as_double_array(F.col("embedding")).alias("vec"))
    v = v.withColumn("norm", sim.l2_norm(F.col("vec")))
    # corpus-sized query batch: every vector queries the index
    out = sim.ivf_topk(v, v, k=3, n_probe=2)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    # exactly the centroid hint survives analysis; no hint wraps the
    # assignment subtree (row_number window over the centroid cross join)
    hints = [ln for ln in analyzed.splitlines() if "ResolvedHint" in ln]
    assert len(hints) == 1, hints
    # and it still computes: full self-query run returns k rows per query
    n_q = v.count()
    got = out.groupBy("query_id").count().collect()
    assert len(got) == n_q
    assert all(r["count"] <= 3 for r in got)


def test_ivf_probe2_superset_recall(spark):
    """n_probe=2 candidates strictly contain the n_probe=1 list scan, so
    top-5 recall vs brute force can only improve."""
    sf = "/root/testdata/sf0.1"
    from rxlan_aws_lakehouse_spark.catalog import load

    e = load(spark, sf, "embeddings")
    v = e.select("vec_id", "label", sim.as_double_array(F.col("embedding")).alias("vec"))
    v = v.withColumn("norm", sim.l2_norm(F.col("vec")))
    queries = v.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(v, queries, k=5).collect()
    }

    def recall(n_probe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.ivf_topk(v, queries, k=5, n_probe=n_probe).collect()
        }
        return len(got & truth) / len(truth)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1, (r1, r2)


def test_topk_agg_equals_rank_window_on_adversarial_ties(spark):
    """The partial-aggregation top-k must match the rank-window formulation
    row for row — including rounded-sim ties resolved by neighbor id, and
    regardless of how rows are partitioned (the stage-1 spark_partition_id
    salt must never leak into results)."""
    import random

    from pyspark.sql.window import Window as W

    rng = random.Random(7)
    rows = []
    for q in range(5):
        for n in range(200):
            # heavy tie mass: sims drawn from a tiny discrete set
            rows.append((q, n, rng.choice([0.1, 0.5, 0.5000004, 0.9])))
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, sim double"
    )

    def window_version(df, k):
        w = W.partitionBy("query_id").orderBy(
            F.round(F.col("sim"), 6).desc(), F.col("neighbor_id").asc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
        )

    for parts in (1, 7, 32):
        got = sorted(
            map(tuple, sim.topk_per_query_agg(scored.repartition(parts), k=10).collect())
        )
        want = sorted(map(tuple, window_version(scored, 10).collect()))
        assert got == want, f"mismatch at repartition({parts})"


def test_rotated_bucket_arrow_matches_hof(spark):
    """The Arrow matmul bucket path and the HOF integer-fold path are the
    SAME function: all-integer fixed-point arithmetic, so the two must
    agree bit-for-bit on every bucket key (and with the DuckDB oracle,
    which mirrors the HOF form)."""
    from rxlan_aws_lakehouse_spark.ops import similarity as sim

    vec = F.array(
        *[F.sin(F.col("id") * (i + 3) * 1.3 - i) for i in range(64)]
    )
    emb = spark.range(500).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    cols = ["vec_id"] + [f"bucket_{t}" for t in range(8)]
    a = sim.prepare_multitable_rotated(emb, bits=8, arrow=True).select(cols)
    h = sim.prepare_multitable_rotated(emb, bits=8, arrow=False).select(cols)
    assert a.exceptAll(h).count() == 0
    assert h.exceptAll(a).count() == 0
