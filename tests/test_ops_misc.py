"""Unit tests: top-k per group, text metrics, multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.ops import multimodal as mm
from rxlan_aws_lakehouse_spark.ops import text as tx
from rxlan_aws_lakehouse_spark.ops.topk import topk_per_group


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i) for i in range(5)] + [("g2", i) for i in range(3)],
        "g string, v int",
    )
    out = topk_per_group(df, ["g"], [F.desc("v")], k=2)
    got = sorted((r["g"], r["v"]) for r in out.collect())
    assert got == [("g1", 3), ("g1", 4), ("g2", 1), ("g2", 2)]


def test_text_quality_and_lang(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and the dog"), (2, "el perro y la casa de que y")],
        "doc_id long, text string",
    )
    m = tx.quality_metrics(F.col("text"))
    r = df.select("doc_id", m["n_tokens"].alias("n"), m["uniq_ratio"].alias("u")).collect()
    by_id = {x["doc_id"]: x for x in r}
    assert by_id[1]["n"] == 9
    assert 0 < by_id[1]["u"] < 1
    langs = {
        x["doc_id"]: x["lang"]
        for x in df.select("doc_id", tx.predict_lang(F.col("text")).alias("lang")).collect()
    }
    assert langs[1] == "en"
    assert langs[2] == "es"


def test_multimodal_features_schema_and_determinism(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "")], "doc_id long, text string")
    bin_df = mm.to_binary_payload(df, "doc_id", "text")
    assert dict(bin_df.dtypes)["payload"] == "binary"
    out = mm.extract_features(bin_df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 5
    assert len(rows[1]["feature"]) == mm.FEATURE_DIM
    assert rows[1]["feature"][0] == 5.0  # length moment
    assert rows[2]["feature"] == [0.0] * mm.FEATURE_DIM
    # deterministic across runs
    again = {r["doc_id"]: r["feature"] for r in mm.extract_features(bin_df).collect()}
    assert again[1] == rows[1]["feature"]


def test_pii_scrub_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or visit https://example.com/x now"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    counts = tx.pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("email"),
            counts["url"].alias("url"),
            counts["phone"].alias("phone"),
            tx.scrub_pii(F.col("text")).alias("scrubbed"),
        ).collect()
    }
    assert out[1]["email"] == 1 and out[1]["url"] == 1
    assert "<EMAIL>" in out[1]["scrubbed"] and "<URL>" in out[1]["scrubbed"]
    assert "bob@example.com" not in out[1]["scrubbed"]
    assert out[2]["phone"] == 1 and "<PHONE>" in out[2]["scrubbed"]
    assert out[3]["scrubbed"] == "nothing sensitive here"


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c")], "doc_id long, text string"
    )
    fp = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", tx.rolling_fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]


def test_pii_redact_leaves_no_matches(spark, sf_dir):
    """After scrub_pii, no PII pattern matches the redacted corpus text
    (placeholders contain no '@', '://', or 8+ digit runs)."""
    from rxlan_aws_lakehouse_spark.queries.llm import text_pii_redact
    from rxlan_aws_lakehouse_spark.catalog import load

    d = load(spark, sf_dir, "documents")
    scrubbed = d.select(tx.scrub_pii(F.col("text")).alias("s"))
    leftover = scrubbed.select(
        *[
            F.sum(F.size(F.regexp_extract_all("s", F.lit(p), 0))).alias(k)
            for k, p in tx.PII_PATTERNS.items()
        ]
    ).first()
    assert all(leftover[k] == 0 for k in tx.PII_PATTERNS)
    # redacted_len/md5 rows exist for every document
    out = text_pii_redact(spark, sf_dir)
    assert out.count() == d.count()


def test_unigram_logprob_bounds(spark, sf_dir):
    """Unigram log2-probs are strictly negative and above log2(1/total);
    every scored doc has >= 1 token."""
    from rxlan_aws_lakehouse_spark.queries.llm import text_unigram_logprob

    rows = text_unigram_logprob(spark, sf_dir).collect()
    assert rows and all(r["n_tokens"] >= 1 for r in rows)
    assert all(r["avg_logprob"] < 0 for r in rows)


def test_quantize_profile_reconstruction(spark, sf_dir):
    """int8 codes stay in [-127, 127] and reconstruct each element to
    within half a quantization step."""
    from rxlan_aws_lakehouse_spark.catalog import load
    from rxlan_aws_lakehouse_spark.queries.llm import emb_quantize_profile

    prof = emb_quantize_profile(spark, sf_dir)
    bad = prof.filter((F.col("q_min") < -127) | (F.col("q_max") > 127))
    assert bad.count() == 0

    e = load(spark, sf_dir, "embeddings")
    maxabs = F.array_max(F.transform("embedding", lambda v: F.abs(v)))
    staged = e.select(
        "embedding", F.when(maxabs > 0, maxabs).otherwise(F.lit(1.0)).alias("scale")
    )
    q = F.transform(
        "embedding", lambda v: F.round(v * 127.0 / F.col("scale")).cast("long")
    )
    recon_err = F.array_max(
        F.zip_with(
            "embedding",
            q,
            lambda v, code: F.abs(v - code * F.col("scale") / 127.0),
        )
    )
    worst = staged.select(
        (recon_err - F.col("scale") / 254.0 * 1.0001).alias("excess")
    ).agg(F.max("excess")).first()[0]
    assert worst <= 1e-9
