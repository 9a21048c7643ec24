"""Unit tests for dedup operators on tiny in-memory frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.ops import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles(spark):
    df = _docs(spark, [(1, "a b c d")]).select(
        dd.tokens(F.col("text")).alias("toks")
    )
    out = df.select(dd.word_shingles_from(F.col("toks")).alias("s")).head()
    assert out["s"] == ["a b c", "b c d"]


def test_shingles_short_doc_empty(spark):
    df = _docs(spark, [(1, "a b")]).select(dd.tokens(F.col("text")).alias("toks"))
    out = df.select(dd.word_shingles_from(F.col("toks")).alias("s")).head()
    assert out["s"] == []


def test_minhash_identical_docs_identical_sigs(spark):
    df = _docs(
        spark,
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"), (3, "wholly different text body here")],
    )
    staged = df.select(
        "doc_id", dd.tokens(F.col("text")).alias("toks")
    ).select("doc_id", dd.shingle_hashes_from(F.col("toks")).alias("sh"))
    sig = dd.minhash_signature_from(F.col("sh"))
    rows = {
        r["doc_id"]: [r[f"m{i}"] for i in range(dd.MINHASH_K)]
        for r in staged.select(
            "doc_id", *[s.alias(f"m{i}") for i, s in enumerate(sig)]
        ).collect()
    }
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    # empty docs get the sentinel everywhere
    empty = (
        _docs(spark, [(9, "")])
        .select(dd.tokens(F.col("text")).alias("toks"))
        .select(dd.shingle_hashes_from(F.col("toks")).alias("sh"))
        .select(*[s.alias(f"m{i}") for i, s in enumerate(dd.minhash_signature_from(F.col("sh")))])
        .head()
    )
    assert all(v == dd.MINHASH_P for v in empty)


def test_bucket_pairs(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "ids array<long>")
    out = df.select(F.explode(dd.bucket_pairs(F.col("ids"))).alias("p")).select(
        "p.a", "p.b"
    )
    assert sorted((r["a"], r["b"]) for r in out.collect()) == [(1, 2), (1, 3), (2, 3)]
    single = spark.createDataFrame([([7],)], "ids array<long>").select(
        F.size(dd.bucket_pairs(F.col("ids"))).alias("n")
    )
    assert single.head()["n"] == 0


def test_jaccard(spark):
    df = spark.createDataFrame(
        [([1, 2, 3], [2, 3, 4]), ([1], [2]), ([], [])],
        "a array<long>, b array<long>",
    )
    vals = [r["j"] for r in df.select(dd.jaccard(F.col("a"), F.col("b")).alias("j")).collect()]
    assert vals[0] == 0.5  # |{2,3}| / |{1,2,3,4}|
    assert vals[1] == 0.0
    assert vals[2] == 0.0  # empty union -> 0 by convention


def test_lsh_empty_docs_generate_no_pairs(spark):
    """10k zero-shingle docs (the sentinel-signature hot class) must produce
    ZERO candidate pairs once excluded from banding — previously they all
    collided into one mega-bucket exploding ~50M pairs in a single task."""
    rows = [(i, "") for i in range(10_000)] + [
        (100_001, "the quick brown fox jumps over the lazy dog"),
        (100_002, "the quick brown fox jumps over the lazy dog"),
    ]
    staged = (
        _docs(spark, rows)
        .select("doc_id", dd.tokens(F.col("text")).alias("toks"))
        .select("doc_id", dd.shingle_hashes_from(F.col("toks")).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    sig = dd.minhash_signature_from(F.col("sh"))
    keys = dd.band_keys(sig)
    withb = staged.select("doc_id", *[k.alias(f"b{i}") for i, k in enumerate(keys)])
    pairs = dd.capped_bucket_pairs(dd.band_explode(withb, ["doc_id"])).collect()
    # only the one real duplicate pair survives; the 10k empties contribute nothing
    assert sorted((r["a"], r["b"]) for r in pairs) == [(100_001, 100_002)]


def test_lsh_bucket_cap_bounds_fanout(spark):
    """A hot bucket above LSH_MAX_BUCKET generates no pairs, and the drop is
    observable (n_buckets_dropped / max_bucket_size) on the same job."""
    from pyspark.sql import Observation

    hot = [(i, "common boilerplate header text block") for i in range(200)]
    cool = [(1001, "rare unique document body one two"),
            (1002, "rare unique document body one two")]
    staged = (
        _docs(spark, hot + cool)
        .select("doc_id", dd.tokens(F.col("text")).alias("toks"))
        .select("doc_id", dd.shingle_hashes_from(F.col("toks")).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    sig = dd.minhash_signature_from(F.col("sh"))
    keys = dd.band_keys(sig)
    withb = staged.select("doc_id", *[k.alias(f"b{i}") for i, k in enumerate(keys)])
    obs = Observation("lsh_cap")
    pairs = dd.capped_bucket_pairs(
        dd.band_explode(withb, ["doc_id"]), observation=obs
    ).collect()
    # the 200-doc hot class (one bucket per band, all > cap) is dropped;
    # the cool pair survives in its own small buckets
    assert sorted(set((r["a"], r["b"]) for r in pairs)) == [(1001, 1002)]
    assert obs.get["n_buckets_dropped"] >= 1
    assert obs.get["max_bucket_size"] == 200
    # upper bound on per-bucket fan-out honoured: no surviving bucket could
    # have produced more than C(LSH_MAX_BUCKET, 2) pairs
    assert len(pairs) <= dd.LSH_MAX_BUCKET * (dd.LSH_MAX_BUCKET - 1) // 2


def test_simhash_hamming(spark):
    df = _docs(
        spark,
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "x y z w")],
    )
    staged = df.select("doc_id", dd.token_hashes(F.col("text")).alias("th"))
    out = {
        r["doc_id"]: r["sh"]
        for r in staged.select("doc_id", dd.simhash32_from(F.col("th")).alias("sh")).collect()
    }
    assert out[1] == out[2]
    assert 0 <= out[1] < 2**32
    ham = spark.createDataFrame([(out[1], out[3])], "a long, b long").select(
        dd.hamming32(F.col("a"), F.col("b")).alias("h")
    )
    assert ham.head()["h"] > 0


def test_winnowing_guarantee_and_density(spark):
    """The winnowing contract (MOSS): two documents sharing a word run of
    at least w + k - 1 = 6 words MUST share at least one fingerprint; the
    selection density on long docs sits near the expected 2/(w+1)."""
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"unrelated preamble one two {shared} tail xx yy"),
            (2, f"{shared} totally different continuation here now"),
            (3, "no overlap with anything else at all whatsoever"),
            (4, "tiny doc"),  # shorter than one k-gram: zero fingerprints
        ],
        "doc_id long, text string",
    )
    staged = docs.select(
        "doc_id", dd.tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id", dd.ordered_shingle_hashes_from(F.col("toks")).alias("hs")
    ).select("doc_id", dd.winnow_from_hashes(F.col("hs")).alias("fp"))
    fps = {r["doc_id"]: set(r["fp"]) for r in staged.collect()}
    assert fps[1] & fps[2], "shared 6-word run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    assert fps[4] == set()
    # density on a long synthetic doc ~ 2/(w+1) = 0.4 (loose band)
    long_doc = spark.range(1).select(
        F.lit(0).alias("doc_id"),
        F.concat_ws(
            " ", *[F.md5(F.lit(str(i)))[0:7] for i in range(400)]
        ).alias("text"),
    )
    row = long_doc.select(
        dd.tokens(F.col("text")).alias("toks")
    ).select(
        dd.ordered_shingle_hashes_from(F.col("toks")).alias("hs")
    ).select(
        F.size("hs").alias("n"), F.size(dd.winnow_from_hashes(F.col("hs"))).alias("k")
    ).first()
    density = row["k"] / row["n"]
    assert 0.25 <= density <= 0.55, density
