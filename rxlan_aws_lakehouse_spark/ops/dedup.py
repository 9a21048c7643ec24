"""Deduplication operators: exact, fingerprint, n-gram Jaccard, MinHash-LSH,
SimHash.

Design for 100 TB:
  * exact / fingerprint dedup — hash-groupBy on a digest column: one shuffle
    of (digest, id), never of document bodies.
  * MinHash-LSH — per-doc signatures are computed scan-side (column
    expressions, codegen'd, embarrassingly parallel); candidate generation
    explodes signatures into (band_idx, band_key) rows and groupBys — the
    shuffle carries fixed-width band keys. No O(n^2) anywhere; bucket sizes
    bound pair generation.
  * SimHash — 32-bit signature via bit-vote over token hashes; near-dup =
    hamming distance on integers (XOR + bit_count), joinable via bucketed
    prefixes at scale.
  * n-gram Jaccard — exact verification for candidate pairs (array_intersect /
    array_union on shingle sets); used as the verifier behind the LSH stage,
    only ever on candidate pairs, not all pairs.

All hashes derive from md5 (engine-portable); MinHash uses k universal-hash
permutations (a_i * u + b_i) mod P over 60-bit shingle hashes reduced mod P.
The same constants feed the SQL-oracle generators at the bottom.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import HASH_MOD, SQL_MD5_LONG, md5_long

# MinHash parameters (shared with the SQL oracle).
MINHASH_P = HASH_MOD  # 1e9+7; u < P and a < 1e5 keep a*u+b < 2^47, no overflow
MINHASH_K = 16
MINHASH_BANDS = 8  # 2 rows per band
MINHASH_A = [7, 13, 31, 43, 59, 71, 89, 101, 113, 131, 151, 173, 191, 211, 229, 251]
MINHASH_B = [3, 17, 29, 41, 53, 67, 79, 97, 109, 127, 139, 157, 179, 197, 223, 241]
SHINGLE_N = 3  # word 3-grams

SIMHASH_BITS = 32


def tokens(text_col: Column) -> Column:
    """Whitespace tokens as array<string>."""
    return F.regexp_extract_all(text_col, F.lit(r"\S+"), 0)


def word_shingles_from(toks: Column, n: int = SHINGLE_N) -> Column:
    """Word n-gram shingles from a *precomputed* token array column.

    ``toks`` must be a plain column reference, not an inline
    ``regexp_extract_all`` expression: higher-order-function lambdas are
    evaluated interpreted with no subexpression elimination, so an inline
    tokenizer would re-scan the full text on every ``element_at`` access
    (n accesses x ~|tokens| shingles per row — quadratic in document
    length).
    """
    # sequence(1, 0) counts DOWN in Spark ([1, 0]), unlike DuckDB's empty
    # generate_series — guard short docs explicitly or element_at goes out
    # of bounds.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )


def shingle_hashes_from(toks: Column) -> Column:
    """Distinct shingle hashes reduced mod P — the MinHash input set.

    From a staged token column; see ``word_shingles_from`` for why.
    """
    return F.array_distinct(
        F.transform(word_shingles_from(toks), lambda s: md5_long(s) % MINHASH_P)
    )


def word_shingles(text_col: Column, n: int = SHINGLE_N) -> Column:
    """Word n-gram shingles as an array<string> (space-joined).

    Only safe when the result is consumed once from a staged projection;
    hot paths should stage ``tokens`` first and use ``word_shingles_from``.
    """
    return word_shingles_from(tokens(text_col), n)


def shingle_hashes(text_col: Column) -> Column:
    """Distinct shingle hashes mod P. Hot paths: stage ``tokens`` +
    ``shingle_hashes_from`` instead (see ``word_shingles_from``)."""
    return shingle_hashes_from(tokens(text_col))


def minhash_signature_from(hashes: Column, k: int = MINHASH_K) -> list[Column]:
    """k MinHash values from a *precomputed* shingle-hash array column.

    Callers must materialize ``shingle_hashes`` into its own projection first
    (``df.select(..., shingle_hashes(col).alias("sh"))``) and pass
    ``F.col("sh")`` here. Each signature element is then pure arithmetic over
    the array; the expensive md5-shingling runs once per row. Inlining
    ``shingle_hashes(text)`` directly would duplicate the regexp+md5 subtree
    k times — Catalyst does not CSE across those copies (CollapseProject
    keeps a multi-referenced non-cheap projection in its own stage, which is
    exactly what the two-step select relies on).
    """
    sig = []
    for a, b in zip(MINHASH_A[:k], MINHASH_B[:k]):
        perm = F.transform(hashes, lambda u: (F.lit(a) * u + F.lit(b)) % MINHASH_P)
        sig.append(F.coalesce(F.array_min(perm), F.lit(MINHASH_P)).cast("long"))
    return sig


def minhash_signature(text_col: Column) -> list[Column]:
    """k MinHash values; empty docs get sentinel P (matches the SQL oracle).

    Only for single-signature projections; for k>4 or reused plans prefer
    the two-step ``shingle_hashes`` + ``minhash_signature_from`` form.
    """
    return minhash_signature_from(shingle_hashes(text_col))


def band_keys(sig_cols: list[Column], bands: int = MINHASH_BANDS) -> list[Column]:
    """LSH band keys: concat the rows of each band into one string key."""
    rows_per_band = len(sig_cols) // bands
    keys = []
    for b in range(bands):
        parts = sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
        keys.append(F.concat_ws("_", *[p.cast("string") for p in parts]))
    return keys


def token_hashes(text_col: Column) -> Column:
    """md5-derived 60-bit hash per whitespace token (SimHash input)."""
    toks = F.regexp_extract_all(text_col, F.lit(r"\S+"), 0)
    return F.transform(toks, lambda t: md5_long(t))


def simhash32_from(hashes: Column) -> Column:
    """32-bit SimHash from a *precomputed* token-hash array column.

    bit_j = 1 iff sum over tokens of (+1 if bit_j(h(tok)) else -1) > 0.
    Strictly-positive vote matches the SQL oracle's `> 0`. Same staging rule
    as ``minhash_signature_from``: the 32 bit-votes each scan the array, so
    the md5 work must live in its own projection or it is recomputed 32x.
    """
    acc = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda a, u: a + F.when(F.shiftright(u, j).bitwiseAND(1) == 1, 1).otherwise(-1),
        )
        acc = acc + F.when(votes > 0, F.lit(2 ** j).cast("long")).otherwise(0)
    return acc


def simhash32(text_col: Column) -> Column:
    """32-bit SimHash over whitespace tokens (weight 1 per occurrence)."""
    return simhash32_from(token_hashes(text_col))


# Skew guard for LSH banding: buckets larger than this generate no pairs
# (a bucket of b ids explodes b*(b-1)/2 pairs in ONE task — a boilerplate
# band key shared by millions of near-identical docs would OOM that task at
# corpus scale). Dropped buckets are observable via ``capped_bucket_pairs``.
LSH_MAX_BUCKET = 64


def band_explode(withb, id_cols: list[str], n_bands: int = MINHASH_BANDS):
    """(id..., key) rows from band columns ``b0..b{n-1}``.

    The LSH shuffle input: fixed-width (band-tagged key, id) rows, never
    document bodies. ``withb`` must already exclude zero-shingle docs —
    empty docs share the sentinel-P signature in EVERY band, so one stray
    boilerplate class collapses all bands into a single mega-bucket.
    """
    return withb.select(
        *id_cols,
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(str(i)), F.col(f"b{i}"))
                for i in range(n_bands)
            ])
        ).alias("key"),
    )


def capped_bucket_pairs(
    exploded,
    id_col: str = "doc_id",
    max_bucket: int = LSH_MAX_BUCKET,
    observation=None,
):
    """Candidate pairs from exploded (id, key) band rows, skew-capped.

    groupBy(key) -> sorted id list -> drop singleton AND over-cap buckets ->
    explode in-bucket pairs -> distinct. ``observation`` (a
    ``pyspark.sql.Observation``) records ``n_buckets_dropped`` /
    ``max_bucket_size`` on the same job, so the drop count is logged without
    a second action; capping trades recall for a hard per-task bound, which
    is the right trade for near-dup candidate generation (a 64-doc bucket
    already yields 2016 candidate pairs for the verifier).
    """
    buckets = (
        exploded.groupBy("key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if observation is not None:
        buckets = buckets.observe(
            observation,
            F.sum(
                F.when(F.size("ids") > max_bucket, 1).otherwise(0)
            ).alias("n_buckets_dropped"),
            F.max(F.size("ids")).alias("max_bucket_size"),
        )
    return (
        buckets.filter(F.size("ids") <= max_bucket)
        .select(F.explode(bucket_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )


def bucket_pairs(ids: Column) -> Column:
    """All ordered pairs (a<b) from a *sorted* array of ids in one bucket.

    The LSH scale pattern: groupBy(band_key) -> collect_sort ids ->
    explode(bucket_pairs). One shuffle of (band_key, id) instead of a
    two-sided self-join that re-executes the signature plan; bucket size
    bounds the quadratic pair fan-out locally.
    """
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


WINNOW_W = 4  # winnowing window: guarantee t = W + SHINGLE_N - 1 = 6 words


def ordered_shingle_hashes_from(toks: Column) -> Column:
    """POSITIONAL shingle hashes (duplicates kept, document order) — the
    winnowing input. ``shingle_hashes_from`` dedups for set semantics;
    winnowing needs the sequence."""
    return F.transform(
        word_shingles_from(toks), lambda s: md5_long(s) % MINHASH_P
    )


def winnow_fingerprints_from(toks: Column, w: int = WINNOW_W) -> Column:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): slide a window of ``w`` consecutive k-gram hashes
    and keep each window's MINIMUM; the distinct minima are the doc's
    fingerprints.

    The guarantee the MinHash lane cannot give: any shared substring of
    at least w + k - 1 words yields at least one SHARED fingerprint —
    substring-level (quote/boilerplate/excerpt) detection with positional
    locality, at an expected density of 2/(w+1) fingerprints per k-gram.
    Everything runs scan-side (one transform over the staged token
    array); candidate generation downstream is an equi-join on the
    fingerprint value — shuffle carries (fingerprint, doc_id), never
    text. Documents shorter than one window fingerprint as a single
    whole-document window (standard winnowing edge case)."""
    return winnow_from_hashes(ordered_shingle_hashes_from(toks), w)


def winnow_from_hashes(hs: Column, w: int = WINNOW_W) -> Column:
    """Winnowing from a STAGED positional-hash column — the hot-path form
    (``hs`` is referenced several times below; a staged plain column
    reference evaluates once, an inline HOF expression would re-hash the
    document per reference)."""
    n_win = F.size(hs) - (w - 1)
    windows = (
        F.when(
            F.size(hs) >= w,
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda i: F.array_min(F.slice(hs, i, w)),
            ),
        )
        .when(F.size(hs) > 0, F.array(F.array_min(hs)))
        .otherwise(F.expr("array()").cast("array<bigint>"))
    )
    return F.array_distinct(windows)


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two array columns (distinct semantics)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# SQL oracle generators (DuckDB dialect) — same constants/semantics.
# ---------------------------------------------------------------------------

SQL_SHINGLES = (
    r"list_transform(generate_series(1, greatest(len(regexp_extract_all({c}, '\S+')) - "
    + str(SHINGLE_N - 1)
    + r", 0)), i -> concat_ws(' ', "
    + ", ".join(f"regexp_extract_all({{c}}, '\\S+')[i + {j}]" for j in range(SHINGLE_N))
    + "))"
)

SQL_SHINGLE_HASHES = (
    "list_distinct(list_transform(" + SQL_SHINGLES + ", s -> "
    + SQL_MD5_LONG.format(c="s") + f" % {MINHASH_P}))"
)


SQL_ORDERED_SHINGLE_HASHES = (
    "list_transform(" + SQL_SHINGLES + ", s -> "
    + SQL_MD5_LONG.format(c="s") + f" % {MINHASH_P})"
)


def sql_winnow_from_hashes(hs: str, w: int = WINNOW_W) -> str:
    """DuckDB twin of ``winnow_from_hashes`` over a CTE-staged hash-list
    column (stage ``SQL_ORDERED_SHINGLE_HASHES`` first, same reason as
    the Spark side: ``hs`` is referenced per window). 1-based inclusive
    ``list_slice`` mirrors Spark's (start, length) slice exactly."""
    return (
        f"list_distinct(CASE "
        f"WHEN len({hs}) >= {w} THEN "
        f"list_transform(generate_series(1, len({hs}) - {w - 1}), "
        f"i -> list_min(list_slice({hs}, i, i + {w - 1}))) "
        f"WHEN len({hs}) > 0 THEN [list_min({hs})] "
        f"ELSE CAST([] AS BIGINT[]) END)"
    )


def sql_minhash_exprs(c: str, k: int = MINHASH_K) -> list[str]:
    hashes = SQL_SHINGLE_HASHES.format(c=c)
    out = []
    for a, b in zip(MINHASH_A[:k], MINHASH_B[:k]):
        out.append(
            f"coalesce(list_min(list_transform({hashes}, u -> ({a} * u + {b}) % {MINHASH_P})), {MINHASH_P})"
        )
    return out


def sql_simhash_expr(c: str) -> str:
    toks_hashes = (
        r"list_transform(regexp_extract_all({c}, '\S+'), t -> "
        + SQL_MD5_LONG.format(c="t")
        + ")"
    ).format(c=c)
    bits = []
    for j in range(SIMHASH_BITS):
        vote = (
            f"list_sum(list_transform({toks_hashes}, "
            f"u -> CASE WHEN (u >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        bits.append(f"CASE WHEN coalesce({vote}, 0) > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END")
    return "(" + " + ".join(bits) + ")"
