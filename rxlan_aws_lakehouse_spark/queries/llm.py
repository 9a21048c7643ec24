"""LLM training-data pipeline queries (north-star extensions, SURVEY.md §7 M5).

Dedup, similarity search, text analysis, and multimodal plumbing over the
driver's `documents` and `embeddings` tables. Each oracle-matched query shares
its hash/LSH constants with the Spark operator modules so the two sides cannot
drift; genuinely non-SQL ops (Arrow-batched feature extraction) are rows-only.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load, local_df
from ..ops import dedup as dd
from ..ops import multimodal as mm
from ..ops import similarity as sim
from ..ops import text as tx
from ..scratch import mkscratch as _mkscratch


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup profile: distinct text digests vs rows, dup-group count.

    Hash-groupBy on md5 digests — the shuffle carries 32-byte digests, never
    document bodies.
    """
    d = load(spark, sf_dir, "documents").select(F.md5("text").alias("h"))
    per_group = d.groupBy("h").agg(F.count("*").alias("c"))
    return per_group.agg(
        F.sum("c").alias("n_docs"),
        F.count("*").alias("n_distinct"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0)).alias("n_removable"),
    )


def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keep-list: lowest doc_id per identical text."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .select("keep_doc_id", "n_copies")
    )


def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-fingerprint dedup (case/whitespace-insensitive md5) +
    order-sensitive rolling hash per document."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.normalized_fingerprint(F.col("text")).alias("norm_fp"),
        tx.rolling_fingerprint(F.col("text")).alias("rolling_fp"),
    )


def dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (first 4 of k=16) — deterministic ints, oracle-checked.

    Two-stage select: md5-shingling lands in its own projection so the 4
    signature expressions share one computation of it (Catalyst keeps a
    multi-referenced expensive projection un-collapsed).
    """
    d = load(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", dd.tokens(F.col("text")).alias("toks")
    ).select("doc_id", dd.shingle_hashes_from(F.col("toks")).alias("sh"))
    sig = dd.minhash_signature_from(F.col("sh"), k=4)
    return staged.select(
        "doc_id", *[s.alias(f"mh{i}") for i, s in enumerate(sig)]
    )


def _minhash_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared LSH pipeline: (a, b, jaccard) candidate pairs, exact-verified.

    Scale path: shingle-hash once per doc -> k=16 signature (arithmetic over
    the staged array) -> explode (band_idx, band_key) -> groupBy bucket ->
    generate pairs inside each bucket -> distinct -> exact-Jaccard verify.
    The bucket shuffle carries (band_key, doc_id) only — fixed-width rows,
    no document bodies, no self-join that would re-execute the signature
    plan on both sides. Zero-shingle docs are excluded from banding (their
    sentinel-P signature would collide in every band — exact dedup already
    owns trivially-empty docs) and buckets above ``dd.LSH_MAX_BUCKET``
    generate no pairs, so per-task pair fan-out is hard-bounded.
    """
    d = load(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", dd.tokens(F.col("text")).alias("toks")
    ).select("doc_id", dd.shingle_hashes_from(F.col("toks")).alias("sh"))
    # Three consumers (bucket path + both verify-join sides) read the
    # shingle table; persisting it runs the md5 pass once (~2x faster at
    # sf0.1). At cluster scale this is the materialized signature table an
    # LSH index build would write anyway. The count() MATERIALIZES the
    # cache before the consumers launch: without it the three branches
    # start concurrently against a cold cache and each recomputes the md5
    # pass (measured at docs10: three overlapping ~39s stages -> one).
    staged = staged.filter(F.size("sh") > 0).persist()
    staged.count()
    sig = dd.minhash_signature_from(F.col("sh"))
    keys = dd.band_keys(sig)
    withb = staged.select(
        "doc_id", "sh", *[k.alias(f"b{i}") for i, k in enumerate(keys)]
    )
    cand = dd.capped_bucket_pairs(dd.band_explode(withb, ["doc_id"]))
    sh = withb.select("doc_id", "sh")
    return (
        cand.join(sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha")), "a")
        .join(sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb")), "b")
        .select(
            "a",
            "b",
            F.round(dd.jaccard(F.col("sha"), F.col("shb")), 4).alias("jaccard"),
        )
    )


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs, verified with exact Jaccard — see
    ``_minhash_verified_pairs`` for the full scale story."""
    return _minhash_verified_pairs(spark, sf_dir).agg(
        F.count("*").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("jaccard") >= 0.5, 1).otherwise(0)).alias("n_dup_50"),
        F.round(F.coalesce(F.max("jaccard"), F.lit(0.0)), 4).alias("max_jaccard"),
    )


WINNOW_MAX_POSTING = 64  # df-cut: fingerprints in more docs are boilerplate


def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus markup removal (``ops/text.py strip_markup``): each doc
    is wrapped in deterministic synthetic HTML — container div, script
    element with CONTENT to drop on every 3rd doc, comment on every 5th,
    escaped entities in the tail — then stripped back to clean text.
    Both the synthesis and the strip are mirrored in the oracle, so a
    regex divergence (greedy match, missed entity, fused words) breaks
    the md5 hash. Pure regexp projections: codegen'd, linear, the
    trafilatura step's engine-side core."""
    d = load(spark, sf_dir, "documents")
    marked = F.concat(
        F.lit('<div id="d'),
        F.col("doc_id").cast("string"),
        F.lit('"><p>'),
        F.col("text"),
        F.lit("</p>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit('<script type="text/javascript">var x = 1 < 2;</script>'),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("<!-- crawler boilerplate -->")
        ).otherwise(F.lit("")),
        F.lit(" &amp; tail &lt;end&gt;</div>"),
    )
    staged = d.select("doc_id", marked.alias("marked"))
    return (
        staged.select(
            "doc_id",
            tx.tag_count(F.col("marked")).alias("n_tags"),
            tx.strip_markup(F.col("marked")).alias("clean"),
        )
        .select(
            "doc_id",
            "n_tags",
            F.length("clean").alias("clean_len"),
            F.md5("clean").alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


def _winnowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged winnowing fingerprints per doc: tokens -> positional k-gram
    hashes -> window minima (``ops/dedup.py winnow_from_hashes``). Three
    narrow projections so each HOF pass runs once per row."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", dd.tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            dd.ordered_shingle_hashes_from(F.col("toks")).alias("hs"),
        )
        .select(
            "doc_id",
            F.size("hs").alias("n_kgrams"),
            dd.winnow_from_hashes(F.col("hs")).alias("fp"),
        )
    )


def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint profile (MOSS selection): how
    many k-grams, how many selected fingerprints, and the selection
    density — expected ~2/(w+1) on long docs, exactly the knob that makes
    substring-level dedup affordable at corpus scale (the downstream
    join carries only the selected minima, not every k-gram)."""
    return (
        _winnowed(spark, sf_dir)
        .select(
            "doc_id",
            "n_kgrams",
            F.size("fp").alias("n_fingerprints"),
            F.round(
                F.when(
                    F.col("n_kgrams") > 0,
                    F.size("fp") / F.col("n_kgrams"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("density"),
        )
        .orderBy("doc_id")
    )


def winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate candidates via shared winnowing
    fingerprints: explode (fingerprint, doc_id), group by fingerprint,
    pair within each group (sorted + local pair fan-out, the LSH bucket
    pattern — no self-join), then count shared fingerprints per pair.
    Pairs sharing >= 3 minima contain common word runs of >= w + k - 1
    words — catches quotes and boilerplate that whole-document Jaccard
    dilutes away. The shuffle carries (fingerprint, doc_id) only.

    Fingerprints whose posting list exceeds ``WINNOW_MAX_POSTING`` docs
    are DROPPED before pairing — the document-frequency cut every
    fingerprint index at scale applies (a minimum shared by thousands of
    docs is corpus boilerplate, not a duplication signal, and its pair
    fan-out is quadratic: measured 420s at 50k docs uncapped vs linear
    capped, SCALING.md r6). Mirrored exactly in the oracle.

    ``explode_outer`` + post-generate null filter, NOT plain ``explode``:
    the optimizer's InferFiltersFromGenerate rule turns a plain explode
    into a ``size(fp) > 0`` predicate pushed below the staged
    projections, INLINING the whole winnow chain into a per-row filter
    where every ``element_at`` re-runs the tokenizer — measured 60x
    (406s -> 6.9s at 5k docs, SCALING.md r6). The outer variant infers
    no filter, so the staging survives."""
    fp = (
        _winnowed(spark, sf_dir)
        .select("doc_id", F.explode_outer("fp").alias("f"))
        .filter(F.col("f").isNotNull())
    )
    grouped = fp.groupBy("f").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    pairs = grouped.filter(
        (F.size("ids") > 1) & (F.size("ids") <= WINNOW_MAX_POSTING)
    ).select(
        F.explode(dd.bucket_pairs(F.col("ids"))).alias("p")
    )
    return (
        pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= 3)
        .orderBy("a", "b")
    )


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-CONTAINMENT detection: a doc whose shingle set is
    mostly inside another's (quotes, excerpts, boilerplate-wrapped copies)
    — the curation case symmetric Jaccard misses, because a short doc
    fully contained in a long one has low Jaccard but containment ~1.

    Same capped-LSH candidate generation as ``dedup_minhash_pairs``
    (shingle once, band join, bucket cap — no all-pairs), then per
    candidate pair the DIRECTED overlap ratios |A∩B|/|A| and |A∩B|/|B|
    (shingle sets are distinct by construction). Reported as corpus-level
    counts at the 0.8 threshold plus the worst offender.
    """
    d = load(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", dd.tokens(F.col("text")).alias("toks")
    ).select("doc_id", dd.shingle_hashes_from(F.col("toks")).alias("sh"))
    staged = staged.filter(F.size("sh") > 0).persist()
    staged.count()  # materialize before the 3 consumers fork
    sig = dd.minhash_signature_from(F.col("sh"))
    keys = dd.band_keys(sig)
    withb = staged.select(
        "doc_id", "sh", *[k.alias(f"b{i}") for i, k in enumerate(keys)]
    )
    cand = dd.capped_bucket_pairs(dd.band_explode(withb, ["doc_id"]))
    sh = withb.select("doc_id", "sh")
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb"))).cast(
        "double"
    )
    scored = (
        cand.join(
            sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha")),
            "a",
        )
        .join(
            sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb")),
            "b",
        )
        .select(
            (inter / F.size("sha")).alias("c_ab"),
            (inter / F.size("shb")).alias("c_ba"),
        )
        .select(
            F.greatest("c_ab", "c_ba").alias("cmax"),
            F.least("c_ab", "c_ba").alias("cmin"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_candidate_pairs"),
        F.sum(F.when(F.col("cmax") >= 0.8, 1).otherwise(0)).alias(
            "n_contained_80"
        ),
        F.sum(F.when(F.col("cmin") >= 0.8, 1).otherwise(0)).alias(
            "n_bidirectional_80"
        ),
        F.round(F.coalesce(F.max("cmax"), F.lit(0.0)), 4).alias(
            "max_containment"
        ),
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document — deterministic ints, oracle-checked.

    Token md5 hashes staged in their own projection; the 32 bit-votes are
    arithmetic over the staged array (computed once, not 32x).
    """
    d = load(spark, sf_dir, "documents")
    staged = d.select("doc_id", dd.token_hashes(F.col("text")).alias("th"))
    return staged.select("doc_id", dd.simhash32_from(F.col("th")).alias("simhash"))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over same-source pairs, aggregated per source.

    Blocking on `source` bounds the pair count (the all-pairs comparison the
    reference could never do is restricted to blocks, the standard dedup
    blocking strategy).
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", dd.tokens(F.col("text")).alias("toks")
    ).select("doc_id", "source", dd.shingle_hashes_from(F.col("toks")).alias("sh"))
    a = d.select(
        F.col("source"), F.col("doc_id").alias("a"), F.col("sh").alias("sha")
    )
    b = d.select(
        F.col("source").alias("source_b"), F.col("doc_id").alias("b"), F.col("sh").alias("shb")
    )
    pairs = a.join(
        b, (F.col("source") == F.col("source_b")) & (F.col("a") < F.col("b"))
    ).select("source", "a", "b", dd.jaccard(F.col("sha"), F.col("shb")).alias("j"))
    return (
        pairs.groupBy("source")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.when(F.col("j") >= 0.2, 1).otherwise(0)).alias("n_sim_20"),
            F.round(F.max("j"), 4).alias("max_jaccard"),
            F.round(F.avg("j"), 4).alias("avg_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting aggregated per language tag."""
    d = load(spark, sf_dir, "documents")
    n_tok = tx.token_count(F.col("text"))
    return (
        d.select("lang", n_tok.alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        )
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics (diversity, length, token stats)."""
    d = load(spark, sf_dir, "documents")
    m = tx.quality_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_tokens"].alias("n_tokens"),
        m["n_uniq_tokens"].alias("n_uniq_tokens"),
        m["uniq_ratio"].alias("uniq_ratio"),
        m["avg_token_len"].alias("avg_token_len"),
        m["quality_score"].alias("quality_score"),
    )


def quality_top_quartile_per_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-SOURCE quality thresholding — the curation rule that a global
    cutoff gets wrong (a global threshold empties low-scoring sources
    entirely and keeps every doc from high-scoring ones; mixture quotas
    need survivors from each). percent_rank within source over the
    deterministic (score, doc_id) order keeps each source's top quartile;
    the output profiles what survived. One window shuffle on source."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    m = tx.quality_metrics(F.col("text"))
    scored = d.select(
        "doc_id", "source", m["quality_score"].alias("score")
    )
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    ranked = scored.withColumn("pr", F.percent_rank().over(w))
    kept = ranked.filter(F.col("pr") >= 0.75)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("score"), 4).alias("avg_kept_score"),
            F.round(F.min("score"), 4).alias("threshold_score"),
        )
        .orderBy("source")
    )


BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenization counts: letter runs / digit runs / punctuation
    split separately (the GPT-2-style pre-tokenizer shape), per source.

    The regex is engine-portable (no lookarounds) so DuckDB tokenizes
    identically; counting stays JVM-side — size(regexp_extract_all) per row,
    no explode, no Python.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)
    word = F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$")))
    num = F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$")))
    staged = d.select(
        "source",
        F.size(toks).alias("n_bpe"),
        word.alias("n_word"),
        num.alias("n_num"),
    )
    return staged.groupBy("source").agg(
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.sum("n_word").alias("total_word_tokens"),
        F.sum("n_num").alias("total_num_tokens"),
        F.round(F.avg("n_bpe"), 4).alias("avg_bpe_tokens"),
    )


def quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-curation funnel: exact-dedup -> quality gate ->
    language gate, reporting survivors per (lang, source).

    The three stages compose into ONE plan: a single shuffle for the dedup
    groupBy; the quality/lang gates are scan-side filters. This is the shape
    of a real pretraining-data funnel at 100 TB — no intermediate
    materializations between stages.
    """
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    # Quality score in exact integer ten-thousandths: double summation order
    # differs between engines (and between Spark partial-agg schedules), so
    # aggregating raw doubles is not hash-stable — integers are. floor(x+0.5)
    # instead of round() because round-half modes also differ across engines.
    toks = tx.tokens(F.col("text"))
    n_tok = F.size(toks)
    uniq_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    q_raw = 0.5 * uniq_ratio + 0.5 * F.least(F.lit(1.0), n_tok.cast("double") / 50.0)
    qi = F.floor(q_raw * 10000 + F.lit(0.5)).cast("long")
    gated = (
        deduped.withColumn("qi", qi)
        .filter(F.col("qi") >= 5000)
        .filter(F.col("lang").isin("en", "es", "fr", "de"))
    )
    return gated.groupBy("lang", "source").agg(
        F.count("*").alias("n_kept"),
        F.sum("qi").alias("sum_q_x10k"),
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition profiling — the n-gram-repetition quality filter used in
    pretraining curation (docs dominated by one token or repeated 3-grams
    get filtered).

    Token mode via explode + two-level aggregate (the shuffle carries
    (doc_id, token, count) partials); shingle uniqueness via array ops on a
    staged token column — all exact integers, ratios derived at the end.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(dd.tokens(F.col("text"))).alias("t"))
    tok_stats = (
        toks.groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_tok_count"), F.sum("c").alias("n_tokens"))
    )
    sh = (
        d.select("doc_id", dd.tokens(F.col("text")).alias("toks"))
        .select("doc_id", dd.word_shingles_from(F.col("toks")).alias("sh"))
        .select(
            "doc_id",
            F.size("sh").alias("n_shingles"),
            F.size(F.array_distinct("sh")).alias("n_uniq_shingles"),
        )
    )
    return (
        tok_stats.join(sh, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "max_tok_count",
            F.round(F.col("max_tok_count") / F.col("n_tokens"), 4).alias("top_tok_ratio"),
            "n_shingles",
            "n_uniq_shingles",
            F.when(
                F.col("n_shingles") > 0,
                F.round(1 - F.col("n_uniq_shingles") / F.col("n_shingles"), 4),
            ).otherwise(F.lit(0.0)).alias("shingle_rep_ratio"),
        )
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID vs the labeled `lang` column, confusion counts."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("lang", tx.predict_lang(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus vocabulary
    (tokens seen >= 5 times) — the gibberish/quality gate that needs no
    external model. Two aggregates over one explode. The vocabulary grows
    with the corpus, so the anti join carries no broadcast hint — AQE
    broadcasts it only while it actually fits; all counts exact integers.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(dd.tokens(F.col("text"))).alias("t"))
    vocab = toks.groupBy("t").agg(F.count("*").alias("c")).filter(F.col("c") >= 5).select("t")
    per_doc = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    oov = (
        toks.join(vocab, "t", "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_oov"))
    )
    return (
        per_doc.join(oov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
            F.round(F.coalesce(F.col("n_oov"), F.lit(0)) / F.col("n_tokens"), 4).alias("oov_rate"),
        )
    )


def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by EXACT n-gram collision (the GPT-3 /
    PaLM recipe, distinct from the LSH near-dup `contamination_check`):
    every 5-gram of the held-out eval split (doc_id % 97 == 0) goes into
    a collision set, and each TRAIN document reports how many of its own
    distinct 5-grams hit it. Flagging threshold and n are policy; the
    operator computes the evidence. Scale shape: the eval set is tiny
    relative to the corpus, so its distinct-shingle set broadcasts (AQE)
    under the semi-shaped join; train-side shingles never shuffle as
    strings — both sides hash to longs first. Output: contaminated train
    docs only, with collision counts and the contaminated fraction."""
    n = 5
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", dd.tokens(F.col("text")).alias("ts"), "text"
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    dd.word_shingles_from(F.col("ts"), n),
                    lambda s: dd.md5_long(s) % dd.MINHASH_P,
                )
            )
        ).alias("g"),
    )
    ev = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    train = grams.filter(F.col("doc_id") % 97 != 0)
    per_doc = train.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams")
    )
    hits = (
        train.join(ev, "g", "leftsemi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )
    return (
        hits.join(per_doc, "doc_id")
        .select(
            "doc_id",
            "n_collisions",
            "n_ngrams",
            F.round(
                F.col("n_collisions") / F.col("n_ngrams"), 4
            ).alias("contaminated_frac"),
        )
        .orderBy("doc_id")
    )


def sample_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix sampling weights (the data-mixture step before
    training): measure each source's share of corpus TOKENS, then emit
    the per-source sampling weight that converges the mixture to a
    uniform target across sources — weight = target_share /
    actual_share, i.e. how many epochs of a source one epoch of the
    target mixture consumes. Two aggregates over one explode-free pass
    (token counts come from array sizes, never exploded tokens); at
    100 TB the whole state is |sources| rows."""
    d = load(spark, sf_dir, "documents")
    per_source = d.select(
        "source", F.size(dd.tokens(F.col("text"))).alias("n_tok")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("tokens"),
    )
    w = Window.partitionBy()
    n_sources = F.count(F.lit(1)).over(w)
    share = F.col("tokens") / F.sum("tokens").over(w)
    return per_source.select(
        "source",
        "n_docs",
        "tokens",
        F.round(share, 6).alias("token_share"),
        F.round((1.0 / n_sources) / share, 4).alias("sample_weight"),
    ).orderBy("source")


def text_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model quality score (the KenLM-
    style fluency gate of a training-data pipeline, with no external
    model): add-one-smoothed bigram probabilities are TRAINED on the full
    corpus — one explode + two hash aggregates, shuffling (w1, w2) pairs,
    never documents — and each document is scored by the mean
    ``P(w2 | w1) = (c(w1,w2) + 1) / (c(w1·) + V)`` over its bigrams.
    Degenerate/templated text scores high, token-salad scores near 1/V.

    Scale shape: counts live in two aggregate tables ∝ vocabulary (not
    corpus) size; the scoring join is a key shuffle AQE converts to
    broadcast while the model fits — at 100 TB you'd cap the bigram
    table to the top-M frequent entries (the standard KenLM prune) and
    the plan is unchanged. Probabilities stay RATIONAL (no log), so the
    DuckDB oracle reproduces the arithmetic exactly up to summation
    order, absorbed by round(·, 4). Output restricted to doc_id < 300
    for a bounded result; training always uses the whole corpus."""
    d = load(spark, sf_dir, "documents")
    dt = d.select("doc_id", dd.tokens(F.col("text")).alias("ts"))
    big = dt.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.expr("slice(ts, 1, greatest(size(ts) - 1, 0))"),
                F.expr("slice(ts, 2, greatest(size(ts) - 1, 0))"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cw = cb.groupBy("w1").agg(F.sum("c").alias("cc"))
    v = (
        d.select(F.explode(dd.tokens(F.col("text"))).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    return (
        big.join(cb, ["w1", "w2"])
        .join(cw, ["w1"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    (F.col("c") + F.lit(1.0))
                    / (F.col("cc") + F.col("v"))
                ),
                4,
            ).alias("lm_score"),
        )
        .filter(F.col("doc_id") < 300)
        .orderBy("doc_id")
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination detection — the canonical pretraining
    hygiene job: find held-out documents (doc_id % 5 == 0 stands in for the
    eval split) that near-duplicate any training document.

    Same LSH structure as dedup_minhash_pairs but as a BIPARTITE band join
    (eval bands x train bands), so the shuffle is bounded by band-bucket
    sizes, never |eval| x |train|. Output: contaminated eval docs with
    match counts and the worst Jaccard. The oracle mirrors the band join
    exactly (LSH recall is part of the operator's contract).
    """
    d = load(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", (F.col("doc_id") % 5 == 0).alias("is_eval"),
        dd.tokens(F.col("text")).alias("toks"),
    ).select(
        "doc_id", "is_eval", dd.shingle_hashes_from(F.col("toks")).alias("sh")
    ).filter(
        F.size("sh") > 0  # sentinel-signature guard, see dedup_minhash_pairs
    ).persist()
    staged.count()  # materialize before the 3 consumers fork (see above)
    sig = dd.minhash_signature_from(F.col("sh"))
    keys = dd.band_keys(sig)
    withb = staged.select(
        "doc_id", "is_eval", "sh", *[k.alias(f"b{i}") for i, k in enumerate(keys)]
    )
    exploded = dd.band_explode(withb, ["doc_id", "is_eval"])
    ev = exploded.filter(F.col("is_eval")).select(F.col("doc_id").alias("e"), "key")
    tr = exploded.filter(~F.col("is_eval")).select(F.col("doc_id").alias("t"), "key")
    cand = ev.join(tr, "key").select("e", "t").distinct()
    sh = withb.select("doc_id", "sh")
    verified = (
        cand.join(sh.select(F.col("doc_id").alias("e"), F.col("sh").alias("esh")), "e")
        .join(sh.select(F.col("doc_id").alias("t"), F.col("sh").alias("tsh")), "t")
        .select("e", "t", dd.jaccard(F.col("esh"), F.col("tsh")).alias("j"))
        .filter(F.col("j") >= 0.5)
    )
    return (
        verified.groupBy(F.col("e").alias("doc_id"))
        .agg(
            F.count("*").alias("n_train_matches"),
            F.round(F.max("j"), 4).alias("max_jaccard"),
        )
    )


def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors vec_id < 5."""
    e = load(spark, sf_dir, "embeddings")
    corpus = sim.prepare(e)
    queries = corpus.filter(F.col("vec_id") < 5)
    return sim.cosine_topk(corpus, queries, k=10)


def emb_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN: top-3 same-bucket neighbors for vec_id < 50."""
    e = load(spark, sf_dir, "embeddings")
    corpus = sim.prepare(e)
    out = sim.ann_topk_bucketed(corpus, k=3)
    return out.filter(F.col("vec_id") < 50).select("vec_id", "neighbor_id", "sim")


def emb_ann_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH ANN (8 tables x 6 bits = 512 inverted lists):
    top-3 any-table-collision neighbors for vec_id < 50. The scale
    replacement for the 16-bucket legacy index — bucket cardinality grows
    with 2^bits so per-bucket candidate lists stay bounded at corpus scale,
    and the extra tables win back the recall finer buckets lose (recall vs
    brute force asserted in tests/test_ops_similarity.py)."""
    e = load(spark, sf_dir, "embeddings")
    corpus = sim.prepare_multitable(e)
    out = sim.ann_topk_multitable(corpus, k=3)
    return out.filter(F.col("vec_id") < 50).select("vec_id", "neighbor_id", "sim")


def emb_ann_rotated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table ANN over ROTATED (Rademacher) hyperplanes: same join
    shape as emb_ann_multitable, but each bucket bit is a dense ±1
    projection of all 64 dims instead of one raw dimension's sign —
    general random-hyperplane LSH. Two properties the axis-aligned index
    lacks at scale: bits are decorrelated from any axis structure of the
    corpus, and the bit budget is unbounded by the vector dimensionality,
    so lists can be kept under the candidate cap by raising bits with
    log(corpus) (the measured worst-case-recall fix, SCALING.md r6).
    Buckets are engine-exact via fixed-point quantization: Spark's fold
    and DuckDB's list_dot_product agree bit-for-bit."""
    e = load(spark, sf_dir, "embeddings")
    # persist-then-count barrier (same reason as the dedup lane,
    # llm.py:104): the 48 dense projections are ~100x the axis bucket's
    # cost, and the 8 per-table self-joins would otherwise re-execute
    # the projection on BOTH sides (16x) — the index build runs once
    corpus = sim.prepare_multitable_rotated(
        e, bits=sim.LSH_MULTITABLE_BITS
    ).persist()  # static bit budget: the DuckDB oracle embeds these planes as literals
    corpus.count()
    out = sim.ann_topk_multitable(corpus, k=3)
    return out.filter(F.col("vec_id") < 50).select("vec_id", "neighbor_id", "sim")


def emb_ivf_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with n_probe=2: each query scans its TWO nearest inverted
    lists — the recall knob turned one notch past emb_ivf_topk's n_probe=1
    at 2x (still tiny) scan cost."""
    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", sim.as_double_array(F.col("embedding")).alias("vec"))
    v = v.withColumn("norm", sim.l2_norm(F.col("vec")))
    queries = v.filter(F.col("vec_id") < 10)
    return sim.ivf_topk(v, queries, k=5, n_probe=2)


def emb_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket histogram — the 'inverted list' size profile of the index."""
    e = load(spark, sf_dir, "embeddings")
    corpus = sim.prepare(e)
    return corpus.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"),
        F.min("vec_id").alias("min_vec_id"),
    )


def emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection over the CAPPED rotated multi-table
    LSH candidate set (cosine thresholds over unordered candidate pairs).

    Round-7 rewrite: the previous plan self-joined the legacy
    4-bit/16-bucket index on ``bucket == nbucket`` with no candidate cap
    — Σ|bucket|² ≈ n²/16 pairs at scale, the exact shape the 100x bar
    forbids (r6 verdict, 'What's wrong' #1). Now it runs the SAME
    capped candidate plan as ``emb_ann_rotated``: rotated Rademacher
    hyperplanes (engine-exact fixed-point buckets), per-table inverted
    lists capped at ``ANN_MAX_LIST`` via deterministic md5 sampling,
    union-of-equi-joins deduped — candidate volume is
    O(n * n_tables * max_list), linear in the corpus. The oracle mirrors
    the capped candidate set verbatim, so the profile is exact over the
    deterministic candidate pairs."""
    e = load(spark, sf_dir, "embeddings")
    # persist-then-count barrier (same reason as emb_ann_rotated): the
    # 48 dense projections must not re-execute per per-table join branch
    corpus = sim.prepare_multitable_rotated(
        e, bits=sim.LSH_MULTITABLE_BITS
    ).persist()  # static bit budget: the DuckDB oracle embeds these planes as literals
    corpus.count()
    pairs = sim.candidate_pairs_multitable(corpus, pair_pred="<")
    return pairs.agg(
        F.count("*").alias("n_cand_pairs"),
        F.sum(F.when(F.col("sim") >= 0.95, 1).otherwise(0)).alias("n_dup_95"),
        F.sum(F.when(F.col("sim") >= 0.8, 1).otherwise(0)).alias("n_sim_80"),
        F.round(F.max("sim"), 4).alias("max_cos"),
    )


def emb_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL ANN index maintenance: the rotated multi-table index is
    MATERIALIZED in a transactional table and refreshed at DELTA cost —
    base vectors (vec_id % 5 != 0) are indexed once, the late-arriving 20%
    are projected separately and APPENDED (one commit hashing only the
    delta), never triggering a rebuild. The bucket key is a pure function
    of (vector, planes), so incremental == rebuild EXACTLY; at 100 TB
    this is the difference between re-projecting a trillion vectors and
    projecting the day's arrivals. Top-3 neighbors answered THROUGH the
    stored incrementally-maintained index must equal the full-corpus
    closed form DuckDB computes from the same plane literals."""
    from ..txn import TxnTable

    e = load(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    delta = e.filter(F.col("vec_id") % 5 == 0)
    work = _mkscratch("emb_idx_")
    try:
        t = TxnTable(f"{work}/index")
        # static bit budget: the DuckDB oracle embeds these planes as literals
        t.commit(
            sim.prepare_multitable_rotated(base, bits=sim.LSH_MULTITABLE_BITS)
        )
        t.append(  # delta-only refresh: projects ONLY the 20% late rows
            sim.prepare_multitable_rotated(delta, bits=sim.LSH_MULTITABLE_BITS)
        )
        # persist-then-count barrier (same reason as emb_ann_rotated): the
        # stored index feeds 8 per-table self-joins; read it once
        stored = t.read(spark).persist()
        stored.count()
        out = sim.ann_topk_multitable(stored, k=3)
        res = out.filter(
            (F.col("vec_id") >= 50) & (F.col("vec_id") < 100)
        ).select("vec_id", "neighbor_id", "sim")
        rows = res.collect()
        stored.unpersist()
        return local_df(spark, rows, res.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def emb_cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-vectorized scoring path (numpy matmul via mapInPandas) —
    same query, same oracle, same tie-breaks as emb_cosine_topk; verifies
    the Python fast path is numerically interchangeable with the JVM one."""
    e = load(spark, sf_dir, "embeddings")
    corpus = sim.prepare(e)
    queries = corpus.filter(F.col("vec_id") < 5)
    return sim.cosine_topk_pandas(corpus, queries, k=10)


def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: nearest-centroid assignment (n_probe=1), then top-5
    within the probed inverted list only — the scale path where brute force
    would scan the whole corpus per query."""
    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", sim.as_double_array(F.col("embedding")).alias("vec"))
    v = v.withColumn("norm", sim.l2_norm(F.col("vec")))
    queries = v.filter(F.col("vec_id") < 10)
    return sim.ivf_topk(v, queries, k=5)


def emb_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity of each vector to its label's centroid — the k-means
    E-step / IVF coarse-quantizer building block.

    Centroids via posexplode -> groupBy(label, pos) avg -> re-assemble: the
    shuffle carries (label, pos, partial sum) — fixed width, mergeable, the
    same pattern that scales to billions of vectors. The centroid table
    (|labels| rows) broadcasts back for the scoring pass.
    """
    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", sim.as_double_array(F.col("embedding")).alias("vec"))
    cent = (
        v.select("label", F.posexplode("vec").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s["m"]).alias("cvec"))
    )
    scored = v.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.round(sim.cosine(F.col("vec"), F.col("cvec")), 4).alias("centroid_sim"),
    )
    return scored


def emb_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embedding corpus (5 Lloyd iterations, deterministic
    seeding) — cluster-size profile. The fixed iteration count and
    deterministic seed make even this iterative algorithm oracle-checkable:
    the DuckDB twin (``_kmeans_oracle_sql``) unrolls the same 5 rounds as
    chained CTEs and hash-matches exactly; pytest additionally verifies CC
    exactness on crafted fixtures (tests/test_iterative.py)."""
    from ..ops.iterative import kmeans

    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", sim.as_double_array(F.col("embedding")).alias("vec"))
    assigned, _ = kmeans(v, k=8, max_iter=5)
    return (
        assigned.groupBy("cluster")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("cluster")
    )


def _dup_components(
    spark: SparkSession, sf_dir: str, with_pairs: bool = False
):
    """Shared stage: MinHash-LSH candidates -> exact-Jaccard verify (>= 0.5)
    -> connected components. Returns (node, comp) for every doc in a dup
    cluster; singletons are absent (their cluster is themselves).
    ``with_pairs=True`` additionally returns the verified (a, b) pair set
    the components were built from (for leakage audits)."""
    from ..ops.iterative import connected_components

    d = load(spark, sf_dir, "documents")
    staged = (
        d.select("doc_id", dd.tokens(F.col("text")).alias("toks"))
        .select("doc_id", dd.shingle_hashes_from(F.col("toks")).alias("sh"))
        .filter(F.size("sh") > 0)  # sentinel-signature guard, see dedup_minhash_pairs
        .persist()
    )
    staged.count()  # materialize before the consumers fork
    sig = dd.minhash_signature_from(F.col("sh"))
    keys = dd.band_keys(sig)
    withb = staged.select("doc_id", "sh", *[k.alias(f"b{i}") for i, k in enumerate(keys)])
    cand = dd.capped_bucket_pairs(dd.band_explode(withb, ["doc_id"]))
    sh = withb.select("doc_id", "sh")
    verified = (
        cand.join(sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha")), "a")
        .join(sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb")), "b")
        .filter(dd.jaccard(F.col("sha"), F.col("shb")) >= 0.5)
        .select("a", "b")
    )
    comps = connected_components(verified, src="a", dst="b")
    if with_pairs:
        return comps, verified
    return comps


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group discovery: MinHash-LSH candidate pairs -> connected
    components -> cluster size histogram. The full near-dup pipeline a
    corpus curation job runs (pairs alone under-count transitive dups).
    The Spark side is iterative label propagation (O(diameter) shuffles);
    the DuckDB oracle recomputes the same components via a recursive-CTE
    transitive closure — the size histogram is label-invariant, so the two
    formulations hash-match exactly."""
    comps = _dup_components(spark, sf_dir)
    return (
        comps.groupBy("comp")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("cluster_size")
    )


def sample_split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER-AWARE train/val/test split: near-dup clusters (MinHash-LSH
    -> exact-Jaccard verify -> connected components) are assigned to a
    split ATOMICALLY — the split key is the cluster id, not the doc id —
    so no near-duplicate pair can straddle train and test. This is the
    contamination control a training-data pipeline actually needs: a
    doc-keyed split puts ~(1 - Σp²) of every dup cluster's pairs across
    split boundaries, silently leaking eval content into training. The
    result reports per-split doc counts plus BOTH leakage counters:
    ``leaked_cluster`` (this split: exactly 0 by construction, verified
    against the real pair set, not assumed) and ``leaked_naive`` (what
    the doc-keyed split would have leaked on the same corpus)."""
    from .sampling import SPLIT_CUTS, _uniform

    comps, pairs = _dup_components(spark, sf_dir, with_pairs=True)
    d = load(spark, sf_dir, "documents").select("doc_id")
    labeled = d.join(
        comps.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).withColumn("cluster", F.coalesce("comp", "doc_id"))

    def split_of(key: F.Column, salt: str) -> F.Column:
        u = _uniform(key, salt)
        return (
            F.when(u < SPLIT_CUTS["train"], F.lit("train"))
            .when(u < SPLIT_CUTS["val"], F.lit("val"))
            .otherwise(F.lit("test"))
        )

    assigned = labeled.select(
        "doc_id",
        split_of(F.col("cluster"), "csplit:").alias("split"),
        split_of(F.col("doc_id"), "split:").alias("naive_split"),
    ).persist()
    assigned.count()
    by_a = assigned.select(
        F.col("doc_id").alias("a"),
        F.col("split").alias("sa"),
        F.col("naive_split").alias("na"),
    )
    by_b = assigned.select(
        F.col("doc_id").alias("b"),
        F.col("split").alias("sb"),
        F.col("naive_split").alias("nb"),
    )
    audit = (
        pairs.join(by_a, "a")
        .join(by_b, "b")
        .agg(
            F.sum(
                F.when(F.col("sa") != F.col("sb"), 1).otherwise(0)
            ).alias("leaked_cluster"),
            F.sum(
                F.when(F.col("na") != F.col("nb"), 1).otherwise(0)
            ).alias("leaked_naive"),
        )
        .collect()[0]
    )
    out = (
        assigned.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("leaked_cluster", F.lit(int(audit["leaked_cluster"])))
        .withColumn("leaked_naive", F.lit(int(audit["leaked_naive"])))
        .orderBy("split")
    )
    rows = out.collect()
    assigned.unpersist()
    return local_df(spark, rows, out.schema)


def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup resolution: within each duplicate CLUSTER
    (transitive, not just pairs) keep the single best document — longest by
    token count, doc_id as the tiebreak — and drop the rest. This is the
    curation policy real corpus builds use (keep the canonical/longest copy
    of a mirrored page), upgraded from ``dedup_neardup_keep``'s pairwise
    keep-smallest-id. Singleton docs are their own cluster and always
    survive. Output: per-source keep/drop accounting plus surviving token
    mass.
    """
    comps = _dup_components(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", tx.token_count(F.col("text")).alias("n_tok")
    )
    labeled = d.join(
        comps.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).withColumn("cluster", F.coalesce("comp", "doc_id"))
    w = Window.partitionBy("cluster").orderBy(
        F.col("n_tok").desc(), F.col("doc_id").asc()
    )
    flagged = labeled.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("int")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("kept")).alias("n_dropped"),
            F.sum(F.col("n_tok") * F.col("kept")).alias("kept_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------

def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata profile per source (bytes, not chars)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length("text")).alias("total_bytes"),
            F.max(F.octet_length("text")).alias("max_bytes"),
        )
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. The stand-in
    decoder computes byte moments, so even the Python side of the
    mapInPandas boundary is oracle-checked byte-exactly (the DuckDB twin
    recomputes mean byte via hex slices of the encoded payload)."""
    d = load(spark, sf_dir, "documents")
    binary = mm.to_binary_payload(d, "doc_id", "text")
    feats = mm.extract_features(binary)
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        F.round(F.element_at("feature", 2), 4).alias("mean_byte"),
    )


def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL codec path: synthesize a spec-conformant 24-bit
    BMP per document (dimensions/pixels derived from doc_id and text
    length), then parse it back with the pure-Python BMP decoder
    (``ops/multimodal.py decode_real`` — header fields, bottom-up
    scanlines, row padding, BGR order) and reduce to per-channel means.
    The oracle recomputes the expected means from the generation rule, so
    any encode/decode defect (padding arithmetic, row flip, channel
    swap) breaks the hash. Both hops are Arrow-batched mapInPandas."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    decoded = mm.decode_features(mm.make_bmp_payloads(d))
    return decoded.select(
        "doc_id",
        "fmt",
        "width",
        "height",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
    )


def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by smoothed TF-IDF (round 8): tf = in-doc
    term count, idf = ln((N+1)/(df+1)) + 1 over the WHOLE corpus, score =
    tf * idf — the classic relevance/keyword-extraction primitive a
    training-data pipeline uses for topic tagging and quality filters.

    Scale shape: one explode -> (doc, term) hash agg (map-side partials
    carry counts, not text), document frequency as a second agg over the
    ALREADY-DISTINCT (doc, term) pairs (no re-scan of bodies), corpus N
    via a single-row broadcast cross join, then one ranking window per
    doc. Ranking orders on round(score, 6) before the term tiebreak so
    cross-engine float noise cannot flip ranks; output keeps doc_id < 100
    while df/N stay corpus-wide."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(dd.tokens(F.col("text"))).alias("t"))
    tf = toks.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("t").agg(F.count("*").alias("df"))
    total = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "t")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("t").asc()
    )
    return (
        scored.filter(F.col("doc_id") < 100)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            F.col("t").alias("term"),
            "tf",
            "df",
            F.round("score", 4).alias("score"),
            "rank",
        )
        .orderBy("doc_id", "rank")
    )


def multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL audio codec path (round 8 — second container
    beside BMP, proving the decode seam isn't image-shaped): synthesize a
    spec-conformant RIFF/WAVE 16-bit PCM file per document (rate /
    channels / frames / signed amplitudes derived from doc_id and text
    length — mono AND stereo interleave), parse it back with the
    pure-Python WAV decoder (``ops/multimodal.py decode_wav`` — chunk
    walk, PCM validation, int16 two's-complement samples) and reduce to
    mean / peak / RMS. The oracle recomputes the expected stats from the
    generation rule, so an interleave, endianness, or sign-extension
    defect breaks the hash. Both hops are Arrow-batched mapInPandas."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    decoded = mm.decode_audio_features(mm.make_wav_payloads(d))
    return decoded.select(
        "doc_id",
        "fmt",
        "sample_rate",
        "n_channels",
        "n_frames",
        F.round("mean_amp", 4).alias("mean_amp"),
        "peak",
        F.round("rms", 4).alias("rms"),
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive frame sampling over binary payloads (``ops/multimodal.py
    sample_frames``): at most 8 fixed-width frames per payload, evenly
    strided, content pinned by md5 of each frame's hex rendering. The
    aggregation profiles sampling coverage per modality."""
    d = load(spark, sf_dir, "documents")
    frames = mm.sample_frames(mm.to_binary_payload(d, "doc_id", "text"))
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("frame_bytes").alias("sampled_bytes"),
            F.md5(F.concat_ws("|", F.sort_array(F.collect_list("frame_md5"))))
            .alias("frames_digest"),
        )
        .orderBy("doc_id")
    )


def multimodal_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the Arrow feature-extraction output.

    Oracle-checkable because the extractor's first feature is the payload
    byte length — octet_length on the SQL side. This pins the whole
    mapInPandas pipeline (binary encode -> Arrow batches -> Python decode ->
    schema'd output) to an exact cross-engine invariant.
    """
    d = load(spark, sf_dir, "documents")
    feats = mm.extract_features(mm.to_binary_payload(d, "doc_id", "text"))
    return feats.groupBy("modality").agg(
        F.count("*").alias("n_payloads"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.sum(F.element_at("feature", 1)), 2).alias("total_len_feature"),
        F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
    )


# Chunking geometry: CHUNK_CHARS-wide windows every CHUNK_STRIDE chars
# (CHUNK_CHARS - CHUNK_STRIDE chars of overlap between neighbors).
CHUNK_CHARS = 200
CHUNK_STRIDE = 150


def dedup_neardup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup: LSH pairs verified at Jaccard >= 0.5,
    then greedy keep-smallest-id — any document that duplicates a
    smaller-id document is dropped. Reported as per-source audit counts.

    The drop set is a DISTINCT over verified pairs' right side — tiny
    relative to the corpus (it is the duplicates themselves), so the
    anti-join broadcasts. Transitive closure is ``dedup_clusters``'s job;
    the greedy rule needs no iteration and is what crawl pipelines run
    when near-dup rates are low.
    """
    drop = (
        _minhash_verified_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.5)
        .select(F.col("b").alias("doc_id"))
        .distinct()
        .withColumn("dup", F.lit(1))
    )
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        d.join(drop, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("dup"), F.lit(0))).alias("n_dropped"),
            (F.count(F.lit(1)) - F.sum(F.coalesce(F.col("dup"), F.lit(0)))).alias(
                "n_kept"
            ),
        )
        .orderBy("source")
    )


def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    # re-pinned round 15: last driver check was r10 (stale window);
    # plan and oracle unchanged — content key bumped so the driver
    # re-verifies this lane (r14 verdict task 4)
    """Overlapping fixed-width chunking — the context-window slicing step
    of a pretraining/RAG pipeline (chars stand in for tokens; the geometry
    and plan shape are identical).

    ``sequence`` + ``posexplode`` generate chunk starts inside the scan
    projection — no shuffle at all until (and unless) a consumer needs
    one; output order is pinned only for the oracle compare. Chunk CONTENT
    is verified via md5, so the comparison never hauls the substrings
    around. Row fan-out is len/stride per doc, linear in corpus bytes.
    """
    d = load(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    exploded = d.select(
        "doc_id", "text", F.posexplode(starts).alias("chunk_idx", "start")
    )
    chunk = F.substring(F.col("text"), F.col("start"), CHUNK_CHARS)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start").cast("int").alias("start"),
        F.length(chunk).cast("int").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


PACK_BUDGET = 512   # token budget per packed training sequence
PACK_BUCKETS = 16   # parallel packing streams (scales with the cluster)


def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — concatenate documents into fixed-token-budget
    training sequences (the step between dedup/filter and the trainer's
    dataloader).

    A single global greedy pack is a serial algorithm; the scalable form
    shards documents into ``PACK_BUCKETS`` deterministic streams
    (md5(doc_id) — reproducible across engines/partitionings, like the
    samplers) and packs WITHIN each stream by token-offset assignment:
    a running token sum orders the stream, and a document starting at
    offset ``cum - n_tok`` joins sequence ``floor(offset / budget)``.
    Documents never split; a doc straddling a boundary stays in its
    starting sequence, so a sequence can overrun the budget by at most one
    document's tokens (reported as ``overflow_tokens`` — the trainer
    truncates or the budget gets headroom). One shuffle on the bucket key;
    each bucket's window is an independent running sum, so parallelism ==
    buckets and buckets scale with the cluster.
    """
    d = load(spark, sf_dir, "documents")
    h = tx.md5_long(F.col("doc_id").cast("string"))
    staged = d.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("n_tok"),
        h.alias("h"),
        (h % PACK_BUCKETS).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = staged.select(
        "bucket",
        "n_tok",
        F.floor(
            (F.sum("n_tok").over(w) - F.col("n_tok"))
            / F.lit(float(PACK_BUDGET))
        ).alias("seq_id"),
    )
    return (
        packed.groupBy("bucket", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("seq_tokens"),
            F.greatest(
                F.lit(0).cast("long"),
                F.sum("n_tok") - F.lit(PACK_BUDGET),
            ).alias("overflow_tokens"),
        )
        .orderBy("bucket", "seq_id")
    )


def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # re-pinned round 15: last driver check was r10 (stale window);
    # plan and oracle unchanged — content key bumped so the driver
    # re-verifies this lane (r14 verdict task 4)
    """Per-source PII exposure audit — the pre-training scrub report:
    how many documents carry emails / URLs / phone-shaped strings, and how
    many matches in total. All regexp_extract_all counts inside the scan
    projection (engine-portable patterns, no lookarounds), one narrow
    groupBy(source) — no explode, no Python, codegen throughout.
    """
    d = load(spark, sf_dir, "documents")
    c = tx.pii_counts(F.col("text"))
    staged = d.select(
        "source",
        *[c[k].alias(f"n_{k}") for k in ("email", "url", "phone")],
    )
    aggs = []
    for k in ("email", "url", "phone"):
        aggs.append(F.sum(f"n_{k}").cast("long").alias(f"total_{k}s"))
        aggs.append(
            F.sum((F.col(f"n_{k}") > 0).cast("long")).alias(f"docs_with_{k}")
        )
    return (
        staged.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), *aggs)
        .orderBy("source")
    )


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # re-pinned round 15: last driver check was r10 (stale window);
    # plan and oracle unchanged — content key bumped so the driver
    # re-verifies this lane (r14 verdict task 4)
    """Typed-placeholder PII redaction, verified by content hash: each
    document's scrubbed text is md5'd so the oracle compare proves the
    REDACTED BYTES match without moving document bodies. Pure
    regexp_replace chain — JVM-side, no UDF; redaction order (email, url,
    phone) is part of the operator contract since classes can nest.
    """
    d = load(spark, sf_dir, "documents")
    c = tx.pii_counts(F.col("text"))
    n_pii = c["email"] + c["url"] + c["phone"]
    scrubbed = tx.scrub_pii(F.col("text"))
    return d.select(
        "doc_id",
        n_pii.cast("long").alias("n_pii"),
        F.length(scrubbed).cast("long").alias("redacted_len"),
        F.md5(scrubbed).alias("redacted_md5"),
    )


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # re-pinned round 15: last driver check was r10 (stale window);
    # plan and oracle unchanged — content key bumped so the driver
    # re-verifies this lane (r14 verdict task 4)
    """Perplexity-proxy quality score without a model: average unigram
    log2-probability per document, scored against the corpus's own
    unigram distribution (the cheap first-pass filter before an LM-based
    quality model).

    One explode feeds BOTH the frequency table and the scoring join —
    token frequencies are a groupBy on the exploded tokens, the corpus
    total rides along as a single-row aggregate cross join (Catalyst
    broadcasts it). The per-token logprob join shuffles on token, which
    is Zipf-skewed — at 100 TB the top tokens want AQE skew-join (on by
    default) rather than salting, since the join is a plain equi-join.
    Docs with zero tokens drop out (no distribution to score against).
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(dd.tokens(F.col("text"))).alias("t"))
    freq = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").alias("tot"))
    return (
        toks.join(freq, "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log2(F.col("c") / F.col("tot"))), 4).alias(
                "avg_logprob"
            ),
        )
    )


def emb_quantize_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the
    4x-compression step before an ANN index ships to serving — profiled
    with integer-exact checksums (sum / L1 / extremes of the quantized
    codes) so the oracle compare is bit-stable, no float tolerance games.

    All array math is built-in HOFs over the staged max-abs scale: one
    projection, no shuffle, no Python. float32 inputs promote to float64
    identically in both engines, and round() is half-away-from-zero in
    both, so the codes are deterministic.
    """
    e = load(spark, sf_dir, "embeddings")
    maxabs = F.array_max(F.transform("embedding", lambda v: F.abs(v)))
    staged = e.select(
        "vec_id",
        "label",
        "embedding",
        F.when(maxabs > 0, maxabs).otherwise(F.lit(1.0)).alias("scale"),
    )
    # stage the code array once — four array stats over an UNstaged HOF
    # would re-run the transform per consumer (HOFs are not CSE'd)
    coded = staged.select(
        "vec_id",
        "label",
        F.size("embedding").alias("n_dims"),
        F.transform(
            "embedding",
            lambda v: F.round(v * 127.0 / F.col("scale")).cast("long"),
        ).alias("qv"),
    )
    return coded.select(
        "vec_id",
        "label",
        "n_dims",
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "q_sum"
        ),
        F.size(F.filter("qv", lambda x: x != 0)).alias("q_nonzero"),
    )


QUERIES = {
    "dedup_exact_stats": dedup_exact_stats,
    "dedup_exact_keep": dedup_exact_keep,
    "dedup_fingerprint": dedup_fingerprint,
    "dedup_minhash_sig": dedup_minhash_sig,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_containment": dedup_containment,
    "dedup_neardup_keep": dedup_neardup_keep,
    "text_chunking": text_chunking,
    "text_pack_sequences": text_pack_sequences,
    "dedup_simhash": dedup_simhash,
    "text_winnowing": text_winnowing,
    "winnowing_overlap": winnowing_overlap,
    "text_html_strip": text_html_strip,
    "quality_top_quartile_per_source": quality_top_quartile_per_source,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "text_tokens": text_tokens,
    "text_quality": text_quality,
    "text_langid": text_langid,
    "text_bpe_tokens": text_bpe_tokens,
    "text_repetition": text_repetition,
    "decontaminate_ngram": decontaminate_ngram,
    "sample_mix_weights": sample_mix_weights,
    "text_ngram_lm_score": text_ngram_lm_score,
    "text_oov_rate": text_oov_rate,
    "text_pii_scan": text_pii_scan,
    "text_pii_redact": text_pii_redact,
    "text_unigram_logprob": text_unigram_logprob,
    "emb_quantize_profile": emb_quantize_profile,
    "contamination_check": contamination_check,
    "quality_filter_pipeline": quality_filter_pipeline,
    "emb_cosine_topk": emb_cosine_topk,
    "emb_ann_lsh": emb_ann_lsh,
    "emb_ann_multitable": emb_ann_multitable,
    "emb_ann_rotated": emb_ann_rotated,
    "emb_ivf_probe2": emb_ivf_probe2,
    "emb_bucket_profile": emb_bucket_profile,
    "emb_neardup": emb_neardup,
    "emb_index_incremental": emb_index_incremental,
    "emb_cosine_topk_pandas": emb_cosine_topk_pandas,
    "emb_ivf_topk": emb_ivf_topk,
    "emb_centroid_dist": emb_centroid_dist,
    "emb_kmeans_profile": emb_kmeans_profile,
    "dedup_clusters": dedup_clusters,
    "dedup_cluster_keep_best": dedup_cluster_keep_best,
    "sample_split_leakage_free": sample_split_leakage_free,
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_decode_real": multimodal_decode_real,
    "multimodal_decode_audio": multimodal_decode_audio,
    "text_tfidf_topterms": text_tfidf_topterms,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_batch_stats": multimodal_batch_stats,
}


def _kmeans_oracle_sql(k: int = 8, iters: int = 5, dim: int = 64) -> str:
    """DuckDB twin of ``ops.iterative.kmeans`` + the profile aggregation.

    The Spark side runs a FIXED ``iters`` Lloyd rounds with deterministic
    seeding (first k vec_ids), so the oracle UNROLLS the same rounds as
    chained CTEs: assignment = row_number over (distance, cluster) — the
    same lowest-index tie-break as the Spark E-step's strict ``<`` scan
    (list_distance is the monotone sqrt of the squared distance Spark
    folds); M-step = per-dimension avg rebuilt with list(... ORDER BY p);
    empty clusters carry the previous centroid via coalesce, mirroring
    ``centroids[i]`` carry-forward. A final E-step against the post-update
    centroids matches the Spark implementation's consistency pass.
    """
    parts = [
        "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec"
        " FROM embeddings)",
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS"
        f" INTEGER) AS cluster, vec AS cvec FROM"
        f" (SELECT * FROM base ORDER BY vec_id LIMIT {k}))",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"a{t} AS (SELECT vec_id, cluster, vec FROM ("
            f"SELECT b.vec_id, c.cluster, b.vec, row_number() OVER ("
            f"PARTITION BY b.vec_id ORDER BY list_distance(b.vec, c.cvec),"
            f" c.cluster) AS rn FROM base b CROSS JOIN c{t-1} c)"
            f" WHERE rn = 1)"
        )
        parts.append(
            f"m{t} AS (SELECT cluster, list(m ORDER BY p) AS cvec FROM ("
            f"SELECT cluster, g.p AS p, avg(vec[g.p]) AS m FROM a{t}"
            f" JOIN generate_series(1, {dim}) g(p) ON true"
            f" GROUP BY cluster, g.p) GROUP BY cluster)"
        )
        parts.append(
            f"c{t} AS (SELECT p.cluster, coalesce(m.cvec, p.cvec) AS cvec"
            f" FROM c{t-1} p LEFT JOIN m{t} m USING (cluster))"
        )
    final = iters + 1
    parts.append(
        f"a{final} AS (SELECT vec_id, cluster FROM ("
        f"SELECT b.vec_id, c.cluster, row_number() OVER ("
        f"PARTITION BY b.vec_id ORDER BY list_distance(b.vec, c.cvec),"
        f" c.cluster) AS rn FROM base b CROSS JOIN c{iters} c)"
        f" WHERE rn = 1)"
    )
    return (
        ",\n            ".join(parts)
        + f"""
            SELECT cluster, count(*) AS n_vectors, min(vec_id) AS min_vec_id
            FROM a{final} GROUP BY cluster ORDER BY cluster
        """
    )


_ROT_PLANES = sim.rademacher_planes()


def _build_oracle() -> dict[str, str]:
    from . import sampling as _sampling_mod
    toks = tx.SQL_TOKENS.format(c="text")
    # exact 5-gram collision set for decontaminate_ngram: same hashing as
    # the Spark side (md5 -> long % MINHASH_P), distinct per document
    _g5_grams = (
        r"list_transform(generate_series(1, greatest(len(regexp_extract_all(text, '\S+')) - 4, 0)), "
        "i -> concat_ws(' ', "
        + ", ".join(
            f"regexp_extract_all(text, '\\S+')[i + {j}]" for j in range(5)
        )
        + "))"
    )
    g5 = (
        "list_distinct(list_transform(" + _g5_grams + ", s -> "
        + dd.SQL_MD5_LONG.format(c="s") + f" % {dd.MINHASH_P}))"
    )
    sh = dd.SQL_SHINGLE_HASHES.format(c="text")
    mh = dd.sql_minhash_exprs("text")
    bands = [
        f"(CAST({mh[2*i]} AS VARCHAR) || '_' || CAST({mh[2*i+1]} AS VARCHAR))"
        for i in range(dd.MINHASH_BANDS)
    ]
    cos = sim.SQL_COSINE
    bucket = sim.sql_sign_bucket("embedding")
    en = tx.sql_lang_score("en", "text")
    es = tx.sql_lang_score("es", "text")
    fr = tx.sql_lang_score("fr", "text")
    de = tx.sql_lang_score("de", "text")

    # Shared LSH pipeline CTE (mirrors _minhash_verified_pairs): ends at
    # `verified(a, b, jaccard)`; consumers append their own final SELECT.
    lsh_verified_cte = f"""
            WITH sigs AS (
              SELECT doc_id, {sh} AS sh,
                     {", ".join(f"{b} AS b{i}" for i, b in enumerate(bands))}
              FROM documents),
            sigsf AS (SELECT * FROM sigs WHERE len(sh) > 0),
            e AS (
              {" UNION ALL ".join(f"SELECT doc_id, '{i}:' || b{i} AS key FROM sigsf" for i in range(dd.MINHASH_BANDS))}),
            bk AS (
              SELECT key FROM e GROUP BY key
              HAVING count(*) > 1 AND count(*) <= {dd.LSH_MAX_BUCKET}),
            cand AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM e l JOIN e r ON l.key = r.key AND l.doc_id < r.doc_id
              JOIN bk ON l.key = bk.key),
            verified AS (
              SELECT a, b,
                     round(CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
                       THEN CAST(len(list_distinct(list_intersect(sa.sh, sb.sh))) AS DOUBLE)
                            / len(list_distinct(list_concat(sa.sh, sb.sh)))
                       ELSE 0.0 END, 4) AS jaccard
              FROM cand
              JOIN sigsf sa ON sa.doc_id = cand.a
              JOIN sigsf sb ON sb.doc_id = cand.b)"""

    return {
        "dedup_exact_stats": """
            WITH g AS (SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY 1)
            SELECT CAST(sum(c) AS BIGINT) AS n_docs, count(*) AS n_distinct,
                   CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
                   CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS n_removable
            FROM g
        """,
        "dedup_exact_keep": """
            SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "dedup_fingerprint": f"""
            SELECT doc_id,
                   {tx.SQL_NORM_FP.format(c="text")} AS norm_fp,
                   {tx.SQL_ROLLING_FP.format(c="text")} AS rolling_fp
            FROM documents
        """,
        "dedup_minhash_sig": f"""
            SELECT doc_id,
                   {mh[0]} AS mh0, {mh[1]} AS mh1, {mh[2]} AS mh2, {mh[3]} AS mh3
            FROM documents
        """,
        "dedup_containment": f"""{lsh_verified_cte},
            contain AS (
              SELECT greatest(
                       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sa.sh),
                       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sb.sh)
                     ) AS cmax,
                     least(
                       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sa.sh),
                       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sb.sh)
                     ) AS cmin
              FROM cand
              JOIN sigsf sa ON sa.doc_id = cand.a
              JOIN sigsf sb ON sb.doc_id = cand.b)
            SELECT count(*) AS n_candidate_pairs,
                   CAST(sum(CASE WHEN cmax >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_contained_80,
                   CAST(sum(CASE WHEN cmin >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_bidirectional_80,
                   round(coalesce(max(cmax), 0.0), 4) AS max_containment
            FROM contain
        """,
        "dedup_minhash_pairs": f"""{lsh_verified_cte}
            SELECT count(*) AS n_candidate_pairs,
                   CAST(sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_50,
                   round(coalesce(max(jaccard), 0.0), 4) AS max_jaccard
            FROM verified
        """,
        "emb_kmeans_profile": _kmeans_oracle_sql(),
        "multimodal_frame_sample": f"""
            -- frames are byte slices; DuckDB lacks blob substring, but
            -- slicing the HEX rendering (2 chars/byte) is equivalent and
            -- both engines hex() uppercase
            WITH b AS (
              SELECT doc_id, hex(encode(text)) AS h,
                     CAST(floor(octet_length(encode(text)) / {mm.FRAME_BYTES})
                          AS BIGINT) AS n_frames
              FROM documents),
            p AS (
              SELECT doc_id, h, n_frames,
                     greatest(1, CAST(ceil(n_frames / {mm.MAX_FRAMES}.0)
                                      AS BIGINT)) AS stride
              FROM b),
            frames AS (
              SELECT doc_id,
                     len(substr(h, CAST(g.i * {2 * mm.FRAME_BYTES} + 1 AS BIGINT),
                                {2 * mm.FRAME_BYTES})) / 2 AS frame_bytes,
                     md5(substr(h, CAST(g.i * {2 * mm.FRAME_BYTES} + 1 AS BIGINT),
                                {2 * mm.FRAME_BYTES})) AS frame_md5
              FROM p JOIN generate_series(0, 9999) AS g(i)
                ON g.i < n_frames AND g.i % stride = 0)
            SELECT doc_id, count(*) AS n_frames,
                   CAST(sum(frame_bytes) AS BIGINT) AS sampled_bytes,
                   md5(string_agg(frame_md5, '|' ORDER BY frame_md5)) AS frames_digest
            FROM frames GROUP BY doc_id ORDER BY doc_id
        """,
        "multimodal_features": """
            -- pins the Arrow mapInPandas fake-decoder byte-exactly: mean
            -- byte of the utf-8 payload via the hex-slice trick (2 hex
            -- chars per byte); the series bound is a constant the fixture
            -- corpus stays well under (same device as text_chunking)
            WITH b AS (
              SELECT doc_id, 'text' AS modality,
                     octet_length(encode(text)) AS n_bytes,
                     hex(encode(text)) AS h
              FROM documents),
            bytes AS (
              SELECT doc_id,
                     CAST(('0x' || substr(h, 2 * g.i - 1, 2)) AS INT) AS byte
              FROM b JOIN generate_series(1, 9999) AS g(i) ON g.i <= n_bytes)
            SELECT b.doc_id, b.modality, CAST(b.n_bytes AS INTEGER) AS n_bytes,
                   round(coalesce(avg(bytes.byte), 0.0), 4) AS mean_byte
            FROM b LEFT JOIN bytes ON b.doc_id = bytes.doc_id
            GROUP BY b.doc_id, b.modality, b.n_bytes
        """,
        # expected output of the REAL BMP encode->decode round trip,
        # recomputed from the generation rule (w = 4 + id%5, h = 3 + id%3,
        # r = (id*7+y)%256, g = (x*13+id)%256, b = len%256): a decoder bug
        # in padding / bottom-up order / BGR swap shifts a channel mean
        "multimodal_decode_real": """
            WITH d AS (
              SELECT doc_id, length(text) AS n,
                     4 + doc_id % 5 AS w, 3 + doc_id % 3 AS h
              FROM documents WHERE doc_id < 60),
            ys AS (
              SELECT doc_id, unnest(generate_series(0, h - 1)) AS y FROM d),
            rs AS (
              SELECT ys.doc_id,
                     avg(CAST((d.doc_id * 7 + y) % 256 AS DOUBLE)) AS mean_r
              FROM ys JOIN d ON ys.doc_id = d.doc_id GROUP BY ys.doc_id),
            xs AS (
              SELECT doc_id, unnest(generate_series(0, w - 1)) AS x FROM d),
            gs AS (
              SELECT xs.doc_id,
                     avg(CAST((x * 13 + d.doc_id) % 256 AS DOUBLE)) AS mean_g
              FROM xs JOIN d ON xs.doc_id = d.doc_id GROUP BY xs.doc_id)
            SELECT d.doc_id, 'bmp' AS fmt,
                   CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
                   round(rs.mean_r, 4) AS mean_r,
                   round(gs.mean_g, 4) AS mean_g,
                   round(CAST(n % 256 AS DOUBLE), 4) AS mean_b
            FROM d JOIN rs ON d.doc_id = rs.doc_id
                   JOIN gs ON d.doc_id = gs.doc_id
        """,
        # smoothed TF-IDF: ranks on round(score, 6) before the term
        # tiebreak, same guard as the Spark side, so 1-ulp ln() noise
        # between engines cannot flip a rank
        "text_tfidf_topterms": f"""
            WITH tf AS (
              SELECT doc_id, t, count(*) AS tf
              FROM (SELECT doc_id, unnest({toks}) AS t FROM documents)
              GROUP BY doc_id, t),
            df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.t, tf.tf, df.df,
                     tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0)
                       AS score
              FROM tf JOIN df USING (t) CROSS JOIN n),
            ranked AS (
              SELECT doc_id, t, tf, df, score,
                     row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY round(score, 6) DESC, t) AS rank
              FROM scored
              WHERE doc_id < 100)
            SELECT doc_id, t AS term,
                   CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df,
                   round(score, 4) AS score,
                   CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 3
            ORDER BY doc_id, rank
        """,
        # expected output of the REAL WAV encode->decode round trip,
        # recomputed from the generation rule (nf = 20 + id%13,
        # nc = 1 + id%2, rate = 8000 + 100*(id%5),
        # amp(t,c) = ((id*31 + t*17 + c*7 + len) % 2003) - 1001): an
        # interleave / endianness / int16-sign bug shifts mean/peak/rms
        "multimodal_decode_audio": """
            WITH d AS (
              SELECT doc_id, length(text) AS n,
                     20 + doc_id % 13 AS nf, 1 + doc_id % 2 AS nc,
                     8000 + 100 * (doc_id % 5) AS sr
              FROM documents WHERE doc_id < 60),
            tc AS (
              SELECT d.doc_id, t.t, c.c, d.n, d.nf, d.nc, d.sr,
                     ((d.doc_id * 31 + t.t * 17 + c.c * 7 + d.n) % 2003)
                       - 1001 AS amp
              FROM d
              JOIN LATERAL (
                SELECT unnest(generate_series(0, d.nf - 1)) AS t) t ON TRUE
              JOIN LATERAL (
                SELECT unnest(generate_series(0, d.nc - 1)) AS c) c ON TRUE)
            SELECT doc_id, 'wav' AS fmt,
                   CAST(sr AS INTEGER) AS sample_rate,
                   CAST(nc AS INTEGER) AS n_channels,
                   CAST(nf AS INTEGER) AS n_frames,
                   round(avg(CAST(amp AS DOUBLE)), 4) AS mean_amp,
                   CAST(max(abs(amp)) AS INTEGER) AS peak,
                   round(sqrt(avg(CAST(amp AS DOUBLE) * amp)), 4) AS rms
            FROM tc
            GROUP BY doc_id, sr, nc, nf
        """,
        # cluster-keyed split: same recursive-CTE components as
        # dedup_clusters, split = md5 uniform keyed on the CLUSTER id
        # (singletons: the doc id); leakage audited against the real
        # verified pair set — 0 for the cluster split by construction,
        # while the doc-keyed naive split leaks on the same corpus
        "sample_split_leakage_free": f"""{lsh_verified_cte.replace("WITH ", "WITH RECURSIVE ", 1)},
            dup AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
            edges AS (SELECT a, b FROM dup UNION SELECT b AS a, a AS b FROM dup),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            labels AS (
              SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a),
            docs AS (
              SELECT doc_id, coalesce(l.comp, doc_id) AS cluster
              FROM documents LEFT JOIN labels l ON doc_id = l.node),
            asg AS (
              SELECT doc_id,
                CASE WHEN {_sampling_mod._SQL_UNIFORM.format(salt="csplit:", key="cluster")} < {_sampling_mod.SPLIT_CUTS["train"]} THEN 'train'
                     WHEN {_sampling_mod._SQL_UNIFORM.format(salt="csplit:", key="cluster")} < {_sampling_mod.SPLIT_CUTS["val"]} THEN 'val'
                     ELSE 'test' END AS split,
                CASE WHEN {_sampling_mod._SQL_UNIFORM.format(salt="split:", key="doc_id")} < {_sampling_mod.SPLIT_CUTS["train"]} THEN 'train'
                     WHEN {_sampling_mod._SQL_UNIFORM.format(salt="split:", key="doc_id")} < {_sampling_mod.SPLIT_CUTS["val"]} THEN 'val'
                     ELSE 'test' END AS naive_split
              FROM docs),
            audit AS (
              SELECT
                CAST(coalesce(sum(CASE WHEN a1.split <> a2.split THEN 1 ELSE 0 END), 0) AS INTEGER) AS leaked_cluster,
                CAST(coalesce(sum(CASE WHEN a1.naive_split <> a2.naive_split THEN 1 ELSE 0 END), 0) AS INTEGER) AS leaked_naive
              FROM dup
              JOIN asg a1 ON dup.a = a1.doc_id
              JOIN asg a2 ON dup.b = a2.doc_id)
            SELECT asg.split, CAST(count(*) AS BIGINT) AS n_docs,
                   audit.leaked_cluster, audit.leaked_naive
            FROM asg CROSS JOIN audit
            GROUP BY asg.split, audit.leaked_cluster, audit.leaked_naive
            ORDER BY asg.split
        """,
        "dedup_clusters": f"""{lsh_verified_cte.replace("WITH ", "WITH RECURSIVE ", 1)},
            dup AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
            edges AS (SELECT a, b FROM dup UNION SELECT b AS a, a AS b FROM dup),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            labels AS (
              SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a),
            sizes AS (SELECT comp, count(*) AS cluster_size FROM labels GROUP BY comp)
            SELECT cluster_size, count(*) AS n_clusters
            FROM sizes GROUP BY cluster_size ORDER BY cluster_size
        """,
        "dedup_cluster_keep_best": f"""{lsh_verified_cte.replace("WITH ", "WITH RECURSIVE ", 1)},
            dup AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
            edges AS (SELECT a, b FROM dup UNION SELECT b AS a, a AS b FROM dup),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            labels AS (
              SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a),
            docs AS (
              SELECT doc_id, source, len({toks}) AS n_tok FROM documents),
            labeled AS (
              SELECT d.doc_id, d.source, d.n_tok,
                     coalesce(l.comp, d.doc_id) AS cluster
              FROM docs d LEFT JOIN labels l ON l.node = d.doc_id),
            flagged AS (
              SELECT source, n_tok,
                     CASE WHEN row_number() OVER (
                       PARTITION BY cluster ORDER BY n_tok DESC, doc_id ASC
                     ) = 1 THEN 1 ELSE 0 END AS kept
              FROM labeled)
            SELECT source, count(*) AS n_docs,
                   CAST(sum(kept) AS BIGINT) AS n_kept,
                   CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped,
                   CAST(sum(n_tok * kept) AS BIGINT) AS kept_tokens
            FROM flagged GROUP BY source ORDER BY source
        """,
        "dedup_neardup_keep": f"""{lsh_verified_cte},
            dropped AS (
              SELECT DISTINCT b AS doc_id FROM verified WHERE jaccard >= 0.5)
            SELECT source, count(*) AS n_docs,
                   CAST(sum(CASE WHEN dropped.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                   CAST(count(*) - sum(CASE WHEN dropped.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
            FROM documents LEFT JOIN dropped USING (doc_id)
            GROUP BY source ORDER BY source
        """,
        "text_chunking": f"""
            -- DuckDB's generate_series cannot read lateral columns; a
            -- constant series joined on "start fits in the doc" is
            -- equivalent (the fixture corpus tops out well under the bound)
            SELECT doc_id,
                   CAST(g.i AS INT) AS chunk_idx,
                   CAST(1 + g.i * {CHUNK_STRIDE} AS INT) AS start,
                   CAST(length(substr(text, CAST(1 + g.i * {CHUNK_STRIDE} AS INT), {CHUNK_CHARS})) AS INT) AS chunk_len,
                   md5(substr(text, CAST(1 + g.i * {CHUNK_STRIDE} AS INT), {CHUNK_CHARS})) AS chunk_md5
            FROM documents
            JOIN generate_series(0, 999) AS g(i)
              ON 1 + g.i * {CHUNK_STRIDE} <= greatest(length(text), 1)
            ORDER BY doc_id, chunk_idx
        """,
        "text_pack_sequences": f"""
            WITH staged AS (
              SELECT doc_id,
                     len({tx.SQL_TOKENS.format(c="text")}) AS n_tok,
                     {tx.SQL_MD5_LONG.format(c="CAST(doc_id AS VARCHAR)")} AS h
              FROM documents),
            packed AS (
              SELECT h % {PACK_BUCKETS} AS bucket, n_tok,
                     CAST(floor(
                       (sum(n_tok) OVER (PARTITION BY h % {PACK_BUCKETS}
                                         ORDER BY h, doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tok)
                       / {PACK_BUDGET}.0) AS BIGINT) AS seq_id
              FROM staged)
            SELECT bucket, seq_id,
                   count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
                   greatest(0, CAST(sum(n_tok) AS BIGINT) - {PACK_BUDGET}) AS overflow_tokens
            FROM packed
            GROUP BY bucket, seq_id
            ORDER BY bucket, seq_id
        """,
        "dedup_simhash": f"""
            SELECT doc_id, {dd.sql_simhash_expr("text")} AS simhash FROM documents
        """,
        "text_html_strip": f"""
            WITH marked AS (
              SELECT doc_id,
                     '<div id="d' || CAST(doc_id AS VARCHAR) || '"><p>'
                     || text || '</p>'
                     || CASE WHEN doc_id % 3 = 0
                        THEN '<script type="text/javascript">var x = 1 < 2;</script>'
                        ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                        THEN '<!-- crawler boilerplate -->' ELSE '' END
                     || ' &amp; tail &lt;end&gt;</div>' AS marked
              FROM documents),
            stripped AS (
              SELECT doc_id,
                     len(regexp_extract_all(marked, '(?s)<[^>]+>')) AS n_tags,
                     {tx.sql_strip_markup('marked')} AS clean
              FROM marked)
            SELECT doc_id, CAST(n_tags AS INTEGER) AS n_tags,
                   CAST(length(clean) AS INTEGER) AS clean_len,
                   md5(clean) AS clean_md5
            FROM stripped ORDER BY doc_id
        """,
        "text_winnowing": f"""
            WITH hs AS (
              SELECT doc_id,
                     {dd.SQL_ORDERED_SHINGLE_HASHES.format(c="text")} AS hs
              FROM documents),
            fp AS (
              SELECT doc_id, len(hs) AS n_kgrams,
                     {dd.sql_winnow_from_hashes("hs")} AS fp
              FROM hs)
            SELECT doc_id, CAST(n_kgrams AS INTEGER) AS n_kgrams,
                   CAST(len(fp) AS INTEGER) AS n_fingerprints,
                   round(CASE WHEN n_kgrams > 0
                         THEN CAST(len(fp) AS DOUBLE) / n_kgrams
                         ELSE 0.0 END, 4) AS density
            FROM fp ORDER BY doc_id
        """,
        "winnowing_overlap": f"""
            WITH hs AS (
              SELECT doc_id,
                     {dd.SQL_ORDERED_SHINGLE_HASHES.format(c="text")} AS hs
              FROM documents),
            fp AS (
              SELECT doc_id, {dd.sql_winnow_from_hashes("hs")} AS fp
              FROM hs),
            ex AS (SELECT doc_id, unnest(fp) AS f FROM fp),
            keep AS (
              SELECT f FROM ex GROUP BY f
              HAVING count(*) BETWEEN 2 AND {WINNOW_MAX_POSTING}),
            exc AS (SELECT ex.doc_id, ex.f FROM ex JOIN keep USING (f))
            SELECT a.doc_id AS a, b.doc_id AS b,
                   count(*) AS shared_fingerprints
            FROM exc a JOIN exc b ON a.f = b.f AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY 1, 2
        """,
        "dedup_ngram_jaccard": f"""
            WITH s AS (SELECT doc_id, source, {sh} AS sh FROM documents),
            pairs AS (
              SELECT a.source,
                     CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
                       THEN CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
                            / len(list_distinct(list_concat(a.sh, b.sh)))
                       ELSE 0.0 END AS j
              FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id)
            SELECT source, count(*) AS n_pairs,
                   CAST(sum(CASE WHEN j >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_sim_20,
                   round(max(j), 4) AS max_jaccard,
                   round(avg(j), 4) AS avg_jaccard
            FROM pairs GROUP BY source
        """,
        "text_tokens": f"""
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(len({toks})) AS BIGINT) AS total_tokens,
                   round(avg(len({toks})), 4) AS avg_tokens
            FROM documents GROUP BY lang
        """,
        "text_quality": f"""
            SELECT doc_id,
                   CAST(len({toks}) AS INTEGER) AS n_tokens,
                   CAST(len(list_distinct({toks})) AS INTEGER) AS n_uniq_tokens,
                   round(CASE WHEN len({toks}) > 0
                     THEN CAST(len(list_distinct({toks})) AS DOUBLE) / len({toks})
                     ELSE 0.0 END, 4) AS uniq_ratio,
                   round(CASE WHEN len({toks}) > 0
                     THEN CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len({toks})
                     ELSE 0.0 END, 4) AS avg_token_len,
                   round(0.5 * (CASE WHEN len({toks}) > 0
                           THEN CAST(len(list_distinct({toks})) AS DOUBLE) / len({toks})
                           ELSE 0.0 END)
                       + 0.5 * least(1.0, CAST(len({toks}) AS DOUBLE) / 50.0), 4) AS quality_score
            FROM documents
        """,
        "quality_top_quartile_per_source": f"""
            WITH scored AS (
              SELECT doc_id, source,
                     round(0.5 * (CASE WHEN len({toks}) > 0
                             THEN CAST(len(list_distinct({toks})) AS DOUBLE) / len({toks})
                             ELSE 0.0 END)
                         + 0.5 * least(1.0, CAST(len({toks}) AS DOUBLE) / 50.0), 4)
                       AS score
              FROM documents),
            ranked AS (
              SELECT source, score,
                     percent_rank() OVER (PARTITION BY source
                                          ORDER BY score, doc_id) AS pr
              FROM scored)
            SELECT source,
                   count(*) AS n_kept,
                   round(avg(score), 4) AS avg_kept_score,
                   round(min(score), 4) AS threshold_score
            FROM ranked WHERE pr >= 0.75
            GROUP BY source ORDER BY source
        """,
        "text_langid": f"""
            WITH scored AS (
              SELECT lang,
                     CASE WHEN {en} >= {es} AND {en} >= {fr} AND {en} >= {de} AND {en} > 0 THEN 'en'
                          WHEN {es} >= {fr} AND {es} >= {de} AND {es} > 0 THEN 'es'
                          WHEN {fr} >= {de} AND {fr} > 0 THEN 'fr'
                          WHEN {de} > 0 THEN 'de'
                          ELSE 'unk' END AS pred_lang
              FROM documents)
            SELECT lang, pred_lang, count(*) AS n FROM scored GROUP BY 1, 2
        """,
        "emb_cosine_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     {cos.format(a="q.qe", b="e.embedding")} AS sim
              FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY round(sim, 6) DESC, neighbor_id) AS rn
              FROM scored)
            SELECT query_id, neighbor_id, round(sim, 4) AS sim FROM ranked WHERE rn <= 10
        """,
        "emb_cosine_topk_pandas": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     {cos.format(a="q.qe", b="e.embedding")} AS sim
              FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY round(sim, 6) DESC, neighbor_id) AS rn
              FROM scored)
            SELECT query_id, neighbor_id, round(sim, 4) AS sim FROM ranked WHERE rn <= 10
        """,
        "emb_ivf_topk": f"""
            WITH un AS (
              SELECT label,
                     unnest(generate_series(1, len(embedding))) AS pos,
                     unnest(CAST(embedding AS DOUBLE[])) AS x
              FROM embeddings
            ), cent AS (
              SELECT label, list(m ORDER BY pos) AS cvec
              FROM (SELECT label, pos, avg(x) AS m FROM un GROUP BY label, pos)
              GROUP BY label
            ), q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
              FROM embeddings WHERE vec_id < 10
            ), assign AS (
              SELECT query_id, qvec, label AS probe_label,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(list_cosine_similarity(qvec, cvec), 6) DESC, label) AS crn
              FROM q CROSS JOIN cent
            ), cand AS (
              SELECT a.query_id, a.probe_label, e.vec_id AS neighbor_id,
                     list_cosine_similarity(a.qvec, CAST(e.embedding AS DOUBLE[])) AS sim
              FROM assign a
              JOIN embeddings e ON e.label = a.probe_label AND e.vec_id <> a.query_id
              WHERE a.crn = 1
            ), ranked AS (
              SELECT query_id, probe_label, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(sim, 6) DESC, neighbor_id) AS rn
              FROM cand)
            SELECT query_id, probe_label, neighbor_id, round(sim, 4) AS sim
            FROM ranked WHERE rn <= 5
        """,
        "emb_ann_lsh": f"""
            WITH p AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
            cap AS (SELECT vec_id, embedding, bucket FROM (
              SELECT vec_id, embedding, bucket,
                     row_number() OVER (PARTITION BY bucket
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS lrn
              FROM p) WHERE lrn <= {sim.ANN_MAX_LIST}),
            pairs AS (
              SELECT a.vec_id, b.vec_id AS neighbor_id,
                     {cos.format(a="a.embedding", b="b.embedding")} AS sim
              FROM p a JOIN cap b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
            ranked AS (
              SELECT vec_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY round(sim, 6) DESC, neighbor_id) AS rn
              FROM pairs)
            SELECT vec_id, neighbor_id, round(sim, 4) AS sim
            FROM ranked WHERE rn <= 3 AND vec_id < 50
        """,
        "emb_ann_multitable": f"""
            WITH p AS (
              SELECT vec_id, embedding,
                     {", ".join(
                         f"{sim.sql_sign_bucket('embedding', bits=sim.LSH_MULTITABLE_BITS, offset=t * sim.LSH_MULTITABLE_BITS)} AS bucket_{t}"
                         for t in range(sim.LSH_MULTITABLE_TABLES)
                     )}
              FROM embeddings),
            {", ".join(
                f"cap_{t} AS (SELECT vec_id, embedding, bucket_{t} FROM ("
                f"SELECT vec_id, embedding, bucket_{t}, "
                f"row_number() OVER (PARTITION BY bucket_{t} "
                f"ORDER BY md5('{t}:' || CAST(vec_id AS VARCHAR)), vec_id) AS lrn "
                f"FROM p) WHERE lrn <= {sim.ANN_MAX_LIST})"
                for t in range(sim.LSH_MULTITABLE_TABLES)
            )},
            pairs AS (
              SELECT DISTINCT vec_id, neighbor_id, sim FROM (
                {" UNION ALL ".join(
                    f"SELECT a.vec_id, b.vec_id AS neighbor_id, "
                    f"{cos.format(a='a.embedding', b='b.embedding')} AS sim "
                    f"FROM p a JOIN cap_{t} b ON a.bucket_{t} = b.bucket_{t} AND a.vec_id <> b.vec_id"
                    for t in range(sim.LSH_MULTITABLE_TABLES)
                )})),
            ranked AS (
              SELECT vec_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY round(sim, 6) DESC, neighbor_id) AS rn
              FROM pairs)
            SELECT vec_id, neighbor_id, round(sim, 4) AS sim
            FROM ranked WHERE rn <= 3 AND vec_id < 50
        """,
        # rotated (Rademacher) hyperplanes: the ±1 coefficient matrices are
        # emitted as literals from the same md5-seeded generator Spark uses,
        # and bucketing runs on the fixed-point quantized vectors — integer
        # arithmetic, so both engines agree bit-for-bit
        "emb_ann_rotated": f"""
            WITH pq AS (
              SELECT vec_id, embedding,
                     {sim.sql_quantize_fixed('embedding')} AS q
              FROM embeddings),
            p AS (
              SELECT vec_id, embedding,
                     {", ".join(
                         f"{sim.sql_rotated_bucket('q', _ROT_PLANES[t])} AS bucket_{t}"
                         for t in range(sim.LSH_MULTITABLE_TABLES)
                     )}
              FROM pq),
            {", ".join(
                f"cap_{t} AS (SELECT vec_id, embedding, bucket_{t} FROM ("
                f"SELECT vec_id, embedding, bucket_{t}, "
                f"row_number() OVER (PARTITION BY bucket_{t} "
                f"ORDER BY md5('{t}:' || CAST(vec_id AS VARCHAR)), vec_id) AS lrn "
                f"FROM p) WHERE lrn <= {sim.ANN_MAX_LIST})"
                for t in range(sim.LSH_MULTITABLE_TABLES)
            )},
            pairs AS (
              SELECT DISTINCT vec_id, neighbor_id, sim FROM (
                {" UNION ALL ".join(
                    f"SELECT a.vec_id, b.vec_id AS neighbor_id, "
                    f"{cos.format(a='a.embedding', b='b.embedding')} AS sim "
                    f"FROM p a JOIN cap_{t} b ON a.bucket_{t} = b.bucket_{t} AND a.vec_id <> b.vec_id"
                    for t in range(sim.LSH_MULTITABLE_TABLES)
                )})),
            ranked AS (
              SELECT vec_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY round(sim, 6) DESC, neighbor_id) AS rn
              FROM pairs)
            SELECT vec_id, neighbor_id, round(sim, 4) AS sim
            FROM ranked WHERE rn <= 3 AND vec_id < 50
        """,
        # incrementally-maintained stored index == full-corpus math: the
        # bucket key is a pure function of (vector, planes), so the
        # oracle recomputes the SAME capped rotated plan from scratch —
        # if the delta-append path dropped, duplicated, or re-bucketed
        # anything, the hash breaks
        "emb_index_incremental": f"""
            WITH pq AS (
              SELECT vec_id, embedding,
                     {sim.sql_quantize_fixed('embedding')} AS q
              FROM embeddings),
            p AS (
              SELECT vec_id, embedding,
                     {", ".join(
                         f"{sim.sql_rotated_bucket('q', _ROT_PLANES[t])} AS bucket_{t}"
                         for t in range(sim.LSH_MULTITABLE_TABLES)
                     )}
              FROM pq),
            {", ".join(
                f"cap_{t} AS (SELECT vec_id, embedding, bucket_{t} FROM ("
                f"SELECT vec_id, embedding, bucket_{t}, "
                f"row_number() OVER (PARTITION BY bucket_{t} "
                f"ORDER BY md5('{t}:' || CAST(vec_id AS VARCHAR)), vec_id) AS lrn "
                f"FROM p) WHERE lrn <= {sim.ANN_MAX_LIST})"
                for t in range(sim.LSH_MULTITABLE_TABLES)
            )},
            pairs AS (
              SELECT DISTINCT vec_id, neighbor_id, sim FROM (
                {" UNION ALL ".join(
                    f"SELECT a.vec_id, b.vec_id AS neighbor_id, "
                    f"{cos.format(a='a.embedding', b='b.embedding')} AS sim "
                    f"FROM p a JOIN cap_{t} b ON a.bucket_{t} = b.bucket_{t} AND a.vec_id <> b.vec_id"
                    for t in range(sim.LSH_MULTITABLE_TABLES)
                )})),
            ranked AS (
              SELECT vec_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY round(sim, 6) DESC, neighbor_id) AS rn
              FROM pairs)
            SELECT vec_id, neighbor_id, round(sim, 4) AS sim
            FROM ranked WHERE rn <= 3 AND vec_id >= 50 AND vec_id < 100
        """,
        "emb_ivf_probe2": f"""
            WITH un AS (
              SELECT label,
                     unnest(generate_series(1, len(embedding))) AS pos,
                     unnest(CAST(embedding AS DOUBLE[])) AS x
              FROM embeddings
            ), cent AS (
              SELECT label, list(m ORDER BY pos) AS cvec
              FROM (SELECT label, pos, avg(x) AS m FROM un GROUP BY label, pos)
              GROUP BY label
            ), q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
              FROM embeddings WHERE vec_id < 10
            ), assign AS (
              SELECT query_id, qvec, label AS probe_label,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(list_cosine_similarity(qvec, cvec), 6) DESC, label) AS crn
              FROM q CROSS JOIN cent
            ), cand AS (
              SELECT a.query_id, a.probe_label, e.vec_id AS neighbor_id,
                     list_cosine_similarity(a.qvec, CAST(e.embedding AS DOUBLE[])) AS sim
              FROM assign a
              JOIN embeddings e ON e.label = a.probe_label AND e.vec_id <> a.query_id
              WHERE a.crn <= 2
            ), ranked AS (
              SELECT query_id, probe_label, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(sim, 6) DESC, neighbor_id) AS rn
              FROM cand)
            SELECT query_id, probe_label, neighbor_id, round(sim, 4) AS sim
            FROM ranked WHERE rn <= 5
        """,
        "emb_bucket_profile": f"""
            SELECT {bucket} AS bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
            FROM embeddings GROUP BY 1
        """,
        # capped rotated-LSH candidate set, mirrored verbatim from the
        # Spark plan: unordered pair (a < b) kept iff the HIGHER id
        # survives the per-table md5 candidate cap in a colliding table
        "emb_neardup": f"""
            WITH pq AS (
              SELECT vec_id, embedding,
                     {sim.sql_quantize_fixed('embedding')} AS q
              FROM embeddings),
            p AS (
              SELECT vec_id, embedding,
                     {", ".join(
                         f"{sim.sql_rotated_bucket('q', _ROT_PLANES[t])} AS bucket_{t}"
                         for t in range(sim.LSH_MULTITABLE_TABLES)
                     )}
              FROM pq),
            {", ".join(
                f"cap_{t} AS (SELECT vec_id, embedding, bucket_{t} FROM ("
                f"SELECT vec_id, embedding, bucket_{t}, "
                f"row_number() OVER (PARTITION BY bucket_{t} "
                f"ORDER BY md5('{t}:' || CAST(vec_id AS VARCHAR)), vec_id) AS lrn "
                f"FROM p) WHERE lrn <= {sim.ANN_MAX_LIST})"
                for t in range(sim.LSH_MULTITABLE_TABLES)
            )},
            pairs AS (
              SELECT DISTINCT vec_id, neighbor_id, sim FROM (
                {" UNION ALL ".join(
                    f"SELECT a.vec_id, b.vec_id AS neighbor_id, "
                    f"{cos.format(a='a.embedding', b='b.embedding')} AS sim "
                    f"FROM p a JOIN cap_{t} b ON a.bucket_{t} = b.bucket_{t} AND a.vec_id < b.vec_id"
                    for t in range(sim.LSH_MULTITABLE_TABLES)
                )}))
            SELECT count(*) AS n_cand_pairs,
                   CAST(sum(CASE WHEN sim >= 0.95 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_95,
                   CAST(sum(CASE WHEN sim >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_sim_80,
                   round(max(sim), 4) AS max_cos
            FROM pairs
        """,
        "multimodal_meta": """
            SELECT source, count(*) AS n_docs,
                   CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
                   CAST(max(octet_length(encode(text))) AS INTEGER) AS max_bytes
            FROM documents GROUP BY source
        """,
        # multimodal_features: mapInPandas boundary -> rows-only check (no oracle)
        "text_bpe_tokens": f"""
            WITH staged AS (
              SELECT source,
                     len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe,
                     len(list_filter(regexp_extract_all(text, '{BPE_RE}'),
                                     t -> regexp_full_match(t, '[A-Za-z]+'))) AS n_word,
                     len(list_filter(regexp_extract_all(text, '{BPE_RE}'),
                                     t -> regexp_full_match(t, '[0-9]+'))) AS n_num
              FROM documents)
            SELECT source,
                   CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
                   CAST(sum(n_word) AS BIGINT) AS total_word_tokens,
                   CAST(sum(n_num) AS BIGINT) AS total_num_tokens,
                   round(avg(n_bpe), 4) AS avg_bpe_tokens
            FROM staged GROUP BY source
        """,
        "text_repetition": f"""
            WITH toks AS (
              SELECT doc_id, unnest({toks}) AS t FROM documents
            ), freq AS (
              SELECT doc_id, t, count(*) AS c FROM toks GROUP BY doc_id, t
            ), tok_stats AS (
              SELECT doc_id, CAST(max(c) AS BIGINT) AS max_tok_count,
                     CAST(sum(c) AS BIGINT) AS n_tokens
              FROM freq GROUP BY doc_id
            ), sh AS (
              SELECT doc_id,
                     CAST(len({dd.SQL_SHINGLES.format(c='text')}) AS INTEGER) AS n_shingles,
                     CAST(len(list_distinct({dd.SQL_SHINGLES.format(c='text')})) AS INTEGER) AS n_uniq_shingles
              FROM documents
            )
            SELECT t.doc_id, n_tokens, max_tok_count,
                   round(CAST(max_tok_count AS DOUBLE) / n_tokens, 4) AS top_tok_ratio,
                   n_shingles, n_uniq_shingles,
                   CASE WHEN n_shingles > 0
                        THEN round(1 - CAST(n_uniq_shingles AS DOUBLE) / n_shingles, 4)
                        ELSE 0.0 END AS shingle_rep_ratio
            FROM tok_stats t JOIN sh USING (doc_id)
        """,
        "decontaminate_ngram": f"""
            WITH grams AS (
              SELECT doc_id, unnest({g5}) AS g FROM documents
            ), ev AS (
              SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
            ), train AS (
              SELECT * FROM grams WHERE doc_id % 97 <> 0
            ), per_doc AS (
              SELECT doc_id, count(*) AS n_ngrams FROM train GROUP BY 1
            ), hits AS (
              SELECT doc_id, count(*) AS n_collisions
              FROM train WHERE g IN (SELECT g FROM ev)
              GROUP BY 1
            )
            SELECT h.doc_id,
                   CAST(h.n_collisions AS BIGINT) AS n_collisions,
                   CAST(p.n_ngrams AS BIGINT) AS n_ngrams,
                   round(CAST(h.n_collisions AS DOUBLE) / p.n_ngrams, 4)
                     AS contaminated_frac
            FROM hits h JOIN per_doc p USING (doc_id)
            ORDER BY h.doc_id
        """,
        "sample_mix_weights": f"""
            WITH per_source AS (
              SELECT source,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(len({toks})) AS BIGINT) AS tokens
              FROM documents GROUP BY source
            ), tot AS (
              SELECT CAST(sum(tokens) AS DOUBLE) AS t,
                     CAST(count(*) AS DOUBLE) AS ns
              FROM per_source
            )
            SELECT source, n_docs, tokens,
                   round(tokens / tot.t, 6) AS token_share,
                   round((1.0 / tot.ns) / (tokens / tot.t), 4)
                     AS sample_weight
            FROM per_source, tot ORDER BY source
        """,
        "text_ngram_lm_score": f"""
            WITH dt AS (SELECT doc_id, {toks} AS ts FROM documents),
            big AS (
              SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
              FROM dt, UNNEST(range(1, length(ts))) AS r(i)
            ),
            cb AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY 1, 2),
            cw AS (SELECT w1, sum(c) AS cc FROM cb GROUP BY 1),
            v AS (
              SELECT count(DISTINCT t) AS v
              FROM (SELECT unnest({toks}) AS t FROM documents)
            ),
            scored AS (
              SELECT b.doc_id,
                     avg((cb.c + 1.0) / (cw.cc + v.v)) AS s,
                     count(*) AS nb
              FROM big b JOIN cb USING (w1, w2) JOIN cw USING (w1), v
              GROUP BY 1)
            SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams,
                   round(s, 4) AS lm_score
            FROM scored WHERE doc_id < 300 ORDER BY doc_id
        """,
        "text_oov_rate": f"""
            WITH toks AS (
              SELECT doc_id, unnest({toks}) AS t FROM documents
            ), vocab AS (
              SELECT t FROM toks GROUP BY t HAVING count(*) >= 5
            ), per_doc AS (
              SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id
            ), oov AS (
              SELECT doc_id, count(*) AS n_oov FROM toks
              WHERE t NOT IN (SELECT t FROM vocab)
              GROUP BY doc_id
            )
            SELECT p.doc_id, p.n_tokens,
                   CAST(coalesce(o.n_oov, 0) AS BIGINT) AS n_oov,
                   round(CAST(coalesce(o.n_oov, 0) AS DOUBLE) / p.n_tokens, 4) AS oov_rate
            FROM per_doc p LEFT JOIN oov o ON p.doc_id = o.doc_id
        """,
        "text_pii_scan": f"""
            SELECT source, count(*) AS n_docs,
                   {", ".join(
                       f"CAST(sum(len(regexp_extract_all(text, '{tx.PII_PATTERNS[k]}'))) AS BIGINT) AS total_{k}s, "
                       f"CAST(sum(CASE WHEN len(regexp_extract_all(text, '{tx.PII_PATTERNS[k]}')) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_{k}"
                       for k in ("email", "url", "phone")
                   )}
            FROM documents GROUP BY source ORDER BY source
        """,
        "text_pii_redact": f"""
            WITH s AS (
              SELECT doc_id,
                     regexp_replace(regexp_replace(regexp_replace(text,
                       '{tx.PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
                       '{tx.PII_PATTERNS["url"]}', '<URL>', 'g'),
                       '{tx.PII_PATTERNS["phone"]}', '<PHONE>', 'g') AS scrubbed,
                     {" + ".join(f"len(regexp_extract_all(text, '{tx.PII_PATTERNS[k]}'))" for k in ("email", "url", "phone"))} AS n_pii
              FROM documents)
            SELECT doc_id, CAST(n_pii AS BIGINT) AS n_pii,
                   CAST(length(scrubbed) AS BIGINT) AS redacted_len,
                   md5(scrubbed) AS redacted_md5
            FROM s
        """,
        "text_unigram_logprob": f"""
            WITH toks AS (
              SELECT doc_id, unnest({toks}) AS t FROM documents
            ), freq AS (
              SELECT t, count(*) AS c FROM toks GROUP BY t
            ), tot AS (
              SELECT CAST(sum(c) AS DOUBLE) AS tot FROM freq
            )
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(log2(CAST(c AS DOUBLE) / tot)), 4) AS avg_logprob
            FROM toks JOIN freq USING (t) CROSS JOIN tot
            GROUP BY doc_id
        """,
        "emb_quantize_profile": """
            WITH s AS (
              SELECT vec_id, label, embedding,
                     CASE WHEN list_max(list_transform(embedding, v -> abs(v))) > 0
                          THEN CAST(list_max(list_transform(embedding, v -> abs(v))) AS DOUBLE)
                          ELSE CAST(1.0 AS DOUBLE) END AS scale
              FROM embeddings),
            q AS (
              SELECT vec_id, label, CAST(len(embedding) AS INT) AS n_dims,
                     list_transform(embedding,
                                    v -> CAST(round(v * 127.0 / scale) AS BIGINT)) AS qv
              FROM s)
            SELECT vec_id, label, n_dims,
                   list_min(qv) AS q_min, list_max(qv) AS q_max,
                   CAST(list_sum(qv) AS BIGINT) AS q_sum,
                   CAST(len(list_filter(qv, x -> x != 0)) AS INT) AS q_nonzero
            FROM q
        """,
        "contamination_check": f"""
            WITH sigs0 AS (
              SELECT doc_id, doc_id % 5 = 0 AS is_eval, {sh} AS sh,
                     {", ".join(f"{b} AS b{i}" for i, b in enumerate(bands))}
              FROM documents),
            sigs AS (SELECT * FROM sigs0 WHERE len(sh) > 0),
            cand AS (
              SELECT DISTINCT l.doc_id AS e, r.doc_id AS t, l.sh AS esh, r.sh AS tsh
              FROM sigs l JOIN sigs r
                ON l.is_eval AND NOT r.is_eval
               AND ({" OR ".join(f"l.b{i} = r.b{i}" for i in range(dd.MINHASH_BANDS))})),
            verified AS (
              SELECT e, t,
                     CASE WHEN len(list_distinct(list_concat(esh, tsh))) > 0
                       THEN CAST(len(list_distinct(list_intersect(esh, tsh))) AS DOUBLE)
                            / len(list_distinct(list_concat(esh, tsh)))
                       ELSE 0.0 END AS j
              FROM cand)
            SELECT e AS doc_id, count(*) AS n_train_matches,
                   round(max(j), 4) AS max_jaccard
            FROM verified WHERE j >= 0.5 GROUP BY e
        """,
        "quality_filter_pipeline": f"""
            WITH deduped AS (
              SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents
            ), gated AS (
              SELECT lang, source,
                     CAST(floor((0.5 * (CASE WHEN len({toks}) > 0
                             THEN CAST(len(list_distinct({toks})) AS DOUBLE) / len({toks})
                             ELSE 0.0 END)
                         + 0.5 * least(1.0, CAST(len({toks}) AS DOUBLE) / 50.0))
                         * 10000 + 0.5) AS BIGINT) AS qi
              FROM deduped
              WHERE rn = 1 AND lang IN ('en', 'es', 'fr', 'de')
            )
            SELECT lang, source, count(*) AS n_kept,
                   CAST(sum(qi) AS BIGINT) AS sum_q_x10k
            FROM gated WHERE qi >= 5000 GROUP BY lang, source
        """,
        "emb_centroid_dist": """
            WITH un AS (
              -- parallel unnests zip positionally in DuckDB
              SELECT label,
                     unnest(generate_series(1, len(embedding))) AS pos,
                     unnest(CAST(embedding AS DOUBLE[])) AS x
              FROM embeddings
            ), cent AS (
              SELECT label, list(m ORDER BY pos) AS cvec
              FROM (SELECT label, pos, avg(x) AS m FROM un GROUP BY label, pos)
              GROUP BY label
            )
            SELECT vec_id, e.label AS label,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), cvec), 4)
                     AS centroid_sim
            FROM embeddings e JOIN cent ON e.label = cent.label
        """,
        "multimodal_batch_stats": """
            SELECT 'text' AS modality, count(*) AS n_payloads,
                   CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
                   round(sum(octet_length(encode(text))), 2) AS total_len_feature,
                   round(avg(octet_length(encode(text))), 4) AS avg_bytes
            FROM documents
        """,
    }


ORACLE = _build_oracle()
