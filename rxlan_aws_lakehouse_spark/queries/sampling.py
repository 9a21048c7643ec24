"""Training-data selection operators: deterministic sampling over the
documents corpus.

A 100 TB pretraining pipeline rarely trains on the raw crawl — it samples:
per-language rates (stratified Bernoulli), per-source caps (quota), and
temperature-flattened mixture weights (the alpha-sampling scheme from
multilingual-LM training). All three are implemented here with a
DETERMINISTIC md5-derived uniform instead of ``rand()``:

* reproducible across runs, engines, partitionings, and cluster sizes —
  the sample is a pure function of the row key, so a re-run of a failed
  stage (or a different executor count) selects the same rows;
* embarrassingly parallel — no coordination, no driver-side state, the
  Bernoulli test is a codegen'd projection on the scan;
* oracle-checkable — DuckDB computes the identical md5 uniform.

``rand(seed)`` in Spark is per-partition-deterministic, NOT row-
deterministic: a repartition reshuffles which rows draw which variates.
Hash-based sampling is the standard fix (same trick as Spark's own
``sampleBy`` caveats and the per-table salted sample in
``ops/similarity.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, local_df
from ..ops.text import md5_long
from ..scratch import mkscratch as _mkscratch

# Per-language Bernoulli keep-rates: keep all low-resource text, downsample
# English — the canonical multilingual rebalancing move.
LANG_RATES = {"en": 0.3, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 0.8}
_DEFAULT_RATE = 1.0

# Per-source document cap for the quota sampler.
QUOTA_PER_SOURCE = 15

# Mixture temperature: q_s ∝ p_s^TAU (TAU < 1 flattens toward uniform).
MIXTURE_TAU = 0.5

# Weighted-sample size (per whole corpus) for the A-ES sampler.
WEIGHTED_K = 100

# Train/val/test cumulative cut points on the unit interval.
SPLIT_CUTS = {"train": 0.9, "val": 0.95}  # remainder -> test

# 6-decimal uniform in [0, 1): plenty of resolution for corpus-scale rates,
# and an exact decimal fraction both engines agree on bit-for-bit.
_U_MOD = 1_000_000


def _uniform(key: F.Column, salt: str) -> F.Column:
    """Deterministic per-row uniform in [0,1) from md5(salt || key)."""
    return (md5_long(F.concat(F.lit(salt), key.cast("string"))) % _U_MOD) / _U_MOD


_SQL_UNIFORM = (
    "(CAST(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT)"
    f" % {_U_MOD}) / {_U_MOD}.0"
)


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli sampling by language at fixed per-stratum rates,
    reported as per-(lang, source) audit counts.

    The keep-test is one hash + compare per row inside the scan projection
    — no shuffle, no state, no second pass. The audit aggregate shuffles
    only (lang, source, flag) triples. At 100 TB the sampled WRITE would
    branch off the same scan; the audit is what the driver can hash-check.
    """
    d = load(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in LANG_RATES.items()],
        F.lit(_DEFAULT_RATE),
    )
    kept = (_uniform(F.col("doc_id"), "strat:") < rate).cast("int")
    return (
        d.select("lang", "source", kept.alias("kept"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
        )
        .orderBy("lang", "source")
    )


def sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling: an md5-ordered deterministic top-K per
    source (K = 15) — the "cap every domain" dedup-adjacent selection step.

    One hash-partitioned window per source; the rank order is a pure
    function of doc_id, so adding executors or re-running picks the same
    documents. At 100 TB source cardinality is ~millions, so the window
    partitions stay small and skew-free; a hot source pays O(|source|)
    within its partition — cap-before-sort via an approximate pre-filter
    would be the next lever if a single source dominated a task.
    """
    d = load(spark, sf_dir, "documents")
    u = _uniform(F.col("doc_id"), "quota:").alias("u")
    w = Window.partitionBy("source").orderBy("u", "doc_id")
    return (
        d.select("doc_id", "source", u)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QUOTA_PER_SOURCE)
        .select("doc_id", "source", F.col("rn").cast("int").alias("rn"))
        .orderBy("source", "rn")
    )


def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture weights per source (alpha-sampling):
    p_s = source's share of corpus chars; q_s ∝ p_s^0.5 normalized; the
    per-document repeat factor is q_s / p_s.

    Two tiny aggregates over one scan: per-source char sums (|sources|
    rows), then a broadcast of the 1-row normalizers. Everything after the
    first groupBy is dimension-sized regardless of corpus bytes.
    """
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )
    norm = per_src.agg(
        F.sum("chars").alias("total_chars"),
        F.sum(F.pow(F.col("chars"), MIXTURE_TAU)).alias("z"),
    )
    p = F.col("chars") / F.col("total_chars")
    q = F.pow(F.col("chars"), MIXTURE_TAU) / F.col("z")
    return (
        per_src.join(F.broadcast(norm))
        .select(
            "source",
            "n_docs",
            F.round(p, 6).alias("p_share"),
            F.round(q, 6).alias("q_share"),
            F.round(q / p, 4).alias("repeat_factor"),
        )
        .orderBy("source")
    )


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    key_i = u_i^(1/w_i); the global top-K keys are a weighted sample of K
    items, here weighted by document length so long documents are
    proportionally more likely to be drawn.

    The classic reservoir algorithm is sequential; the key trick makes it
    embarrassingly parallel — compute keys in the scan projection, then one
    TakeOrdered top-K (partial top-K per partition, K-row final merge: no
    full sort, no shuffle of non-winners). Keys of distinct documents are
    continuous-valued, so cross-engine libm ulp differences cannot reorder
    them; ties are broken by doc_id anyway.
    """
    d = load(spark, sf_dir, "documents")
    u = _uniform(F.col("doc_id"), "wsamp:")
    key = F.pow(u, 1.0 / F.col("n_chars"))
    return (
        d.select("doc_id", "source", "n_chars", F.round(key, 8).alias("k"))
        .orderBy(F.desc("k"), "doc_id")
        .limit(WEIGHTED_K)
    )


def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: the split is a pure
    function of doc_id, so it never leaks across reruns, engines, or
    repartitions — the property that matters for contamination-free eval
    sets. Reported as per-(lang, split) counts.

    One hash + two compares per row in the scan projection; the audit
    aggregate shuffles only (lang, split) pairs.
    """
    d = load(spark, sf_dir, "documents")
    u = _uniform(F.col("doc_id"), "split:")
    split = (
        F.when(u < SPLIT_CUTS["train"], F.lit("train"))
        .when(u < SPLIT_CUTS["val"], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "split")
    )


_STRAT_RATE_SQL = (
    "CASE "
    + " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in LANG_RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)


N_EXPORT_SHARDS = 16


def export_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train-shard EXPORT (the dataloader handoff a
    training pipeline ends with): every document gets a stable shard
    (``md5(doc_id) % N``) and a deterministic global shuffle position
    (md5 with a different salt), the corpus is physically written as
    one sorted parquet file per shard (webdataset-style fixed shards —
    re-running the export, or running it on more executors, produces
    byte-identical shard membership and intra-shard order), and the
    audit aggregate is computed from the EXPORTED artifact, not the
    plan: per-shard doc/char counts plus the first and last documents
    in shuffle order. Hash-shard assignment keeps shards balanced
    without a global sort; the only shuffle is the repartition to
    shards, each sorted locally — the 100 TB plan.
    """
    import glob as _glob
    import shutil as _shutil
    import tempfile as _tempfile

    d = load(spark, sf_dir, "documents")
    shard = (
        md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
        % N_EXPORT_SHARDS
    ).alias("shard")
    ordkey = F.md5(
        F.concat(F.lit("xshuf:"), F.col("doc_id").cast("string"))
    ).alias("ord")
    assigned = d.select("doc_id", "n_chars", shard, ordkey)
    work = _mkscratch("shards_")
    try:
        (
            assigned.repartition(N_EXPORT_SHARDS, F.col("shard"))
            .sortWithinPartitions("shard", "ord")
            .write.partitionBy("shard")
            .parquet(f"{work}/out")
        )
        n_dirs = len(_glob.glob(f"{work}/out/shard=*"))
        back = spark.read.parquet(f"{work}/out")
        out = (
            back.groupBy(F.col("shard").cast("long").alias("shard"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("n_chars"),
                F.min_by("doc_id", "ord").alias("first_doc"),
                F.max_by("doc_id", "ord").alias("last_doc"),
            )
            .withColumn(
                "all_shards_written",
                F.lit(bool(n_dirs == N_EXPORT_SHARDS)),
            )
            .orderBy("shard")
        )
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        _shutil.rmtree(work, ignore_errors=True)

QUERIES = {
    "export_train_shards": export_train_shards,
    "sample_stratified": sample_stratified,
    "sample_quota": sample_quota,
    "sample_mixture_weights": sample_mixture_weights,
    "sample_weighted": sample_weighted,
    "sample_split": sample_split,
}

ORACLE = {
    "export_train_shards": """
        WITH assigned AS (
            SELECT doc_id, n_chars,
                   CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 16 AS shard,
                   md5('xshuf:' || CAST(doc_id AS VARCHAR)) AS ord
            FROM documents
        )
        SELECT shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               arg_min(doc_id, ord) AS first_doc,
               arg_max(doc_id, ord) AS last_doc,
               TRUE AS all_shards_written
        FROM assigned GROUP BY 1 ORDER BY 1
    """,
    "sample_stratified": f"""
        SELECT lang, source, count(*) AS n_total,
               CAST(sum(CASE WHEN {_SQL_UNIFORM.format(salt="strat:", key="doc_id")}
                                  < {_STRAT_RATE_SQL}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "sample_quota": f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY {_SQL_UNIFORM.format(salt="quota:", key="doc_id")},
                                doc_id
                   ) AS rn
            FROM documents
        )
        SELECT doc_id, source, CAST(rn AS INT) AS rn
        FROM ranked WHERE rn <= {QUOTA_PER_SOURCE}
        ORDER BY source, rn
    """,
    "sample_weighted": f"""
        SELECT doc_id, source, n_chars,
               round(pow({_SQL_UNIFORM.format(salt="wsamp:", key="doc_id")},
                         1.0 / n_chars), 8) AS k
        FROM documents
        ORDER BY k DESC, doc_id LIMIT {WEIGHTED_K}
    """,
    "sample_split": f"""
        SELECT lang,
               CASE WHEN {_SQL_UNIFORM.format(salt="split:", key="doc_id")}
                         < {SPLIT_CUTS["train"]} THEN 'train'
                    WHEN {_SQL_UNIFORM.format(salt="split:", key="doc_id")}
                         < {SPLIT_CUTS["val"]} THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n
        FROM documents
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "sample_mixture_weights": f"""
        WITH per_src AS (
            SELECT source, count(*) AS n_docs, sum(n_chars) AS chars
            FROM documents GROUP BY 1
        ),
        norm AS (
            SELECT sum(chars) AS total_chars,
                   sum(pow(chars, {MIXTURE_TAU})) AS z
            FROM per_src
        )
        SELECT source, n_docs,
               round(chars / total_chars, 6) AS p_share,
               round(pow(chars, {MIXTURE_TAU}) / z, 6) AS q_share,
               round((pow(chars, {MIXTURE_TAU}) / z) / (chars / total_chars), 4)
                   AS repeat_factor
        FROM per_src, norm ORDER BY source
    """,
}
