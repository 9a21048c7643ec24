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
