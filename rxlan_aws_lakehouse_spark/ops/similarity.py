"""Embedding similarity search: brute-force cosine top-k and sign-LSH ANN.

Scale design:
  * Brute force is the baseline: broadcast the (small) query set against the
    full vector table — a map-side nested loop with NO shuffle of the corpus;
    per-partition top-k via window. 100 TB posture: the corpus streams through
    executors once per query batch; queries are the broadcast side.
  * Sign-LSH (random-hyperplane family; axis-aligned planes here for
    engine-portable determinism) buckets vectors by the sign pattern of the
    leading dimensions; candidate generation is an equi-join on the bucket
    key — one shuffle on a low-cardinality key instead of an all-pairs join.
    This is the same coarse-quantization structure as IVF: bucket = inverted
    list, probe = same-bucket scan.

Dot products are computed with built-in higher-order array functions
(zip_with + aggregate) in double precision — JVM-side, no Python in the loop.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LSH_SIGN_BITS = 4  # legacy single-table bucket key (kept for the r1 queries)

# Scale configuration: b bits -> 2^b buckets per table; multiple tables with
# disjoint dimension ranges recover the recall finer buckets lose. At 4 sign
# bits the 16 buckets degenerate toward all-pairs-per-bucket on any real
# corpus, so the multi-table path below is the one that survives 100 TB —
# bits scales with log(corpus) and tables with the recall target. 6x8 fills
# 48 of the 64 dims (512 inverted lists); measured on the synthetic sf0.1
# corpus (near-random vectors — the LSH worst case) it still triples the
# legacy index's recall at 32x the bucket count; on real embeddings, where
# true neighbors run cosine >= 0.9, per-dim sign agreement ~0.9 puts
# 8-table recall near 1.
LSH_MULTITABLE_BITS = 6
LSH_MULTITABLE_TABLES = 8
# Inverted-list cap for the kNN-graph path: axis-aligned sign LSH can't grow
# bits past the vector dimensionality, so per-list size grows linearly with
# the corpus and Σ|list|² makes the self-join quadratic (measured 30x for
# 10x corpus at 200k vectors). Capping the CANDIDATE side of each list to a
# per-table-independent deterministic sample bounds the join to
# O(n * max_list) per table; a pair survives if it makes the sample in ANY
# table, so drops decorrelate across the 8 tables.
ANN_MAX_LIST = 256

# Rotated-hyperplane LSH (the worst-case-recall fix, SCALING.md r5/r6):
# axis-aligned planes read one raw dimension per bit, so on a corpus whose
# dimensions are near-independent the bits within a table are maximally
# redundant with the raw data's structure and every list is ~uniform —
# overflow everywhere, and the cap costs most of the achievable recall
# (measured 0.645 -> 0.170 at the default cap). A RADEMACHER rotation
# gives each bit its own dense ±1 combination of ALL dimensions — general
# random-hyperplane LSH, bits decorrelated regardless of the corpus's
# axis alignment. Determinism across engines: vectors are quantized to
# FIXED POINT (floor(x * 1e6), exact in IEEE double for |x| < ~4e9) and
# the projection is an integer dot product with ±1 coefficients — every
# intermediate is an integer far below 2^53, so Spark's fold and DuckDB's
# list_dot_product agree bit-for-bit in ANY accumulation order. The
# coefficients derive from md5(seed:table:bit:dim) parity — pure data, no
# RNG state, emitted verbatim into the oracle SQL.
ROT_SEED = "rot-v1"
FP_SCALE = 1_000_000


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda v: v.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(col: Column, bits: int = LSH_SIGN_BITS, offset: int = 0) -> Column:
    """Bucket key: '1'/'0' per dimension's sign over dims
    [offset+1, offset+bits] (>= 0 -> '1').

    Axis-aligned sign planes are the engine-exact member of the
    random-hyperplane LSH family (no float dot product at the bucket
    boundary, so Spark and any SQL oracle agree bit-for-bit); a learned or
    random rotation of the vectors upstream turns these into general
    hyperplanes without touching this code. ``offset`` gives each table of a
    multi-table index its own disjoint dimension range.
    """
    parts = [
        F.when(F.element_at(col, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(offset + 1, offset + bits + 1)
    ]
    return F.concat(*parts)


def prepare(vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Normalize the vector column to double and precompute norm + bucket.

    At scale this is the 'index build': one pass, persisted/bucketed by the
    LSH key so probes co-locate.
    """
    v = as_double_array(F.col(vec_col))
    return vectors.select(
        F.col(id_col),
        v.alias("vec"),
        l2_norm(v).alias("norm"),
        sign_bucket(v).alias("bucket"),
    )


def rademacher_planes(
    n_tables: int = LSH_MULTITABLE_TABLES,
    bits: int = LSH_MULTITABLE_BITS,
    dim: int = 64,
    seed: str = ROT_SEED,
) -> list[list[list[int]]]:
    """``planes[t][j][i]`` ∈ {−1, +1}: the i-th coefficient of table t's
    j-th hyperplane, from md5 parity — deterministic everywhere, no RNG."""
    import hashlib

    return [
        [
            [
                1
                if int(
                    hashlib.md5(
                        f"{seed}:{t}:{j}:{i}".encode()
                    ).hexdigest(),
                    16,
                )
                % 2
                == 0
                else -1
                for i in range(dim)
            ]
            for j in range(bits)
        ]
        for t in range(n_tables)
    ]


def quantize_fixed(col: Column) -> Column:
    """array<double> -> array<long> fixed-point at ``FP_SCALE`` via floor —
    the engine-exact value both Spark and the SQL oracle bucket on."""
    return F.transform(col, lambda x: F.floor(x * F.lit(float(FP_SCALE))))


def rotated_bucket(qcol: Column, plane_rows: list[list[int]]) -> Column:
    """Bucket key over a quantized vector: one '1'/'0' per hyperplane,
    '1' iff the integer dot product with its ±1 coefficients is >= 0."""
    parts = []
    for coeffs in plane_rows:
        lits = F.array(*[F.lit(int(c)) for c in coeffs])
        d = F.aggregate(
            F.zip_with(qcol, lits, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        parts.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*parts)


def _rotated_buckets_arrow(planes: list[list[list[int]]]):
    """Arrow-vectorized twin of ``rotated_bucket``: ALL tables' bucket
    keys in one int64 matmul per batch. Bit-exact with the HOF path —
    the quantized vectors and ±1 coefficients are integers, so
    ``q @ S.T`` in numpy int64 equals Spark's fold equals DuckDB's
    list_dot_product (asserted in tests). The HOF formulation walks the
    64-array once PER BIT through interpreted lambdas (~48x the work of
    an axis bucket); the matmul amortizes the Python boundary over
    |batch| x 48 projections — measured ~4s -> ~0.3s on the 20k-vector
    index build."""
    import numpy as np
    import pandas as pd

    n_tables, bits = len(planes), len(planes[0])
    S = np.array(
        [row for tbl in planes for row in tbl], dtype=np.int64
    )  # (n_tables*bits, dim)

    def buckets(vecs):  # pd.Series -> pd.DataFrame (struct row per vec)
        if len(vecs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.DataFrame(
                {f"bucket_{t}": [] for t in range(n_tables)}
            )
        mat = np.stack(vecs.to_numpy())  # (n, dim) float64
        q = np.floor(mat * float(FP_SCALE)).astype(np.int64)
        bit = (q @ S.T) >= 0  # (n, n_tables*bits) bool
        chars = np.where(bit, "1", "0")
        out = {}
        for t in range(n_tables):
            seg = chars[:, t * bits : (t + 1) * bits]
            out[f"bucket_{t}"] = ["".join(r) for r in seg]
        return pd.DataFrame(out)

    return buckets


def auto_bits(
    n_vectors: int,
    max_list: int = ANN_MAX_LIST,
    floor: int = LSH_MULTITABLE_BITS,
    cap: int = 16,
) -> int:
    """Rotated-index bit budget from the corpus size: ``ceil(log2(n /
    (max_list/2)))`` clamped to [floor, cap] — sized so the EXPECTED
    inverted-list length is ~max_list/2, keeping lists under the
    candidate cap as the corpus grows (the measured rule from SCALING.md
    r6, previously a docstring-only convention a 10x-bigger corpus would
    silently ignore). Pure function of n: given the same count both an
    engine and an oracle derive the same plan literals."""
    import math

    if n_vectors <= 0:
        return floor
    target = max(1.0, n_vectors / (max_list / 2.0))
    return min(cap, max(floor, math.ceil(math.log2(target))))


def prepare_multitable_rotated(
    vectors: DataFrame,
    bits: int | None = None,
    n_tables: int = LSH_MULTITABLE_TABLES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: str = ROT_SEED,
    arrow: bool = True,
) -> DataFrame:
    """Index build for ROTATED multi-table sign-LSH: same output shape as
    ``prepare_multitable`` (``bucket_t`` columns, ``ann_topk_multitable``
    consumes either), but every bit is a dense Rademacher projection of
    all ``dim`` dimensions instead of one raw dimension's sign — the
    general random-hyperplane family, which keeps lists balanced on
    corpora whose raw axes carry no structure (the axis-aligned worst
    case). One extra narrow projection per row; no new shuffle.

    Sizing (measured, SCALING.md r6): pick ``bits`` ~
    log2(n_vectors / (cap/2)) so inverted lists stay under the candidate
    cap — at 200k vectors, 10 bits lifted worst-case capped recall@3
    0.170 -> 0.308 while CUTTING the graph wall 35% (smaller lists =
    fewer candidate pairs: recall and cost improve together). Add tables
    for recall beyond that (16t x 8b -> 0.367 at ~1.5x cost).
    Axis-aligned planes can do neither: their bit budget is capped by
    the vector dimensionality.

    ``arrow=True`` (default) computes the bucket keys with one Arrow-
    batched int64 matmul (``_rotated_buckets_arrow``) — bit-identical to
    the ``arrow=False`` HOF fold (integer arithmetic both ways, equality
    asserted in tests) but ~10x cheaper, the sanctioned vectorized-UDF
    fallback for math that outgrows SQL expressions. ``vec`` and
    ``norm`` stay JVM-side expressions either way, so downstream cosine
    ranking is byte-identical across both paths.

    ``bits=None`` (default) AUTO-SIZES from the corpus: one ``count()``
    (cheap — parquet row-count metadata, or the already-planned scan),
    run EAGERLY at plan-construction time, feeds ``auto_bits``, so a
    10x-bigger corpus gets the finer buckets the sizing rule demands
    instead of silently reverting to overfull lists. The derived width
    is therefore DATA-DEPENDENT: the bucket-string schema changes when
    the corpus crosses a decade boundary, and a statically-planned
    oracle would silently diverge. Registry queries avoid this by
    pinning ``bits``; library callers get the chosen width back on the
    returned DataFrame as ``._rotated_bits`` and an INFO log line, so a
    mismatch against a static oracle is diagnosable (ADVICE r7)."""
    if bits is None:
        n = vectors.count()
        bits = auto_bits(n)
        logging.getLogger(__name__).info(
            "prepare_multitable_rotated: auto_bits(%d) -> %d bits "
            "(%d tables); pin bits=%d for a static oracle",
            n, bits, n_tables, bits,
        )
    planes = rademacher_planes(n_tables, bits, dim, seed)
    v = as_double_array(F.col(vec_col))
    if not arrow:
        q = quantize_fixed(v)
        out = vectors.select(
            F.col(id_col),
            v.alias("vec"),
            l2_norm(v).alias("norm"),
            *[
                rotated_bucket(q, planes[t]).alias(f"bucket_{t}")
                for t in range(n_tables)
            ],
        )
        out._rotated_bits = bits
        return out
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType, StructField
    from pyspark.sql.types import StructType as _StructType

    udf = pandas_udf(
        _rotated_buckets_arrow(planes),
        _StructType(
            [
                StructField(f"bucket_{t}", StringType())
                for t in range(n_tables)
            ]
        ),
    )
    base = vectors.select(
        F.col(id_col),
        v.alias("vec"),
        l2_norm(v).alias("norm"),
        udf(v).alias("_b"),
    )
    out = base.select(
        id_col,
        "vec",
        "norm",
        *[F.col(f"_b.bucket_{t}").alias(f"bucket_{t}") for t in range(n_tables)],
    )
    out._rotated_bits = bits
    return out


def prepare_multitable(
    vectors: DataFrame,
    bits: int = LSH_MULTITABLE_BITS,
    n_tables: int = LSH_MULTITABLE_TABLES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index build for multi-table sign-LSH: one bucket key per table, each
    over its own dimension range (2^bits buckets per table)."""
    v = as_double_array(F.col(vec_col))
    return vectors.select(
        F.col(id_col),
        v.alias("vec"),
        l2_norm(v).alias("norm"),
        *[
            sign_bucket(v, bits=bits, offset=t * bits).alias(f"bucket_{t}")
            for t in range(n_tables)
        ],
    )


def _overflow_tables(
    corpus: DataFrame, n_tables: int, max_list: int | None
) -> set[int]:
    """Tables with at least one inverted list over ``max_list``. The
    aggregate is <= n_tables * 2^bits rows (bounded by index geometry,
    not data) — one skinny count pass, collected once."""
    if max_list is None:
        return set()
    sizes = (
        corpus.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(t).alias("t"),
                        F.col(f"bucket_{t}").alias("bkt"),
                    )
                    for t in range(n_tables)
                ])
            ).alias("tb")
        )
        .groupBy("tb.t", "tb.bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_list)
        .select("t")
        .distinct()
        .collect()
    )
    return {r["t"] for r in sizes}


def candidate_pairs_multitable(
    corpus: DataFrame,
    n_tables: int = LSH_MULTITABLE_TABLES,
    max_list: int | None = ANN_MAX_LIST,
    query_ids=None,
    pair_pred: str = "!=",
) -> DataFrame:
    """Deduped scored candidate pairs from a multi-table LSH index —
    the shared core of ANN top-k ranking AND near-dup pair counting.

    A pair is a candidate if it collides in ANY table; per-table
    equi-joins union'd, then ``distinct`` (same pair -> same sim) so a
    pair is scored once however many tables it collides in. The
    CANDIDATE side of each inverted list is capped at ``max_list`` via a
    deterministic md5-ordered sample (salted per table, so overflow
    drops are independent across tables): without the cap the self-join
    is Σ|list|² — quadratic in the corpus once lists outgrow 2^bits.
    Every vector still queries from the uncapped side.

    The cap is OVERFLOW-GATED (``_overflow_tables``): a table with no
    overflowing list joins its candidate side directly — zero extra
    shuffles; a table that overflows windows its WHOLE candidate side
    (rows in small lists pass the rank filter trivially): one shuffle
    the bucket-key join then reuses — splitting hot/cool lists and
    unioning was measured 7x slower because the union forfeits that
    exchange reuse.

    ``pair_pred``: ``"!="`` yields directed pairs (both orientations —
    the ANN kNN-graph shape); ``"<"`` yields each unordered pair once,
    kept iff the HIGHER id survives the candidate cap (mirrored verbatim
    by the SQL oracles)."""
    if pair_pred not in ("!=", "<"):
        raise ValueError(f"pair_pred must be '!=' or '<', got {pair_pred!r}")
    overflow = _overflow_tables(corpus, n_tables, max_list)
    per_table = []
    for t in range(n_tables):
        bkt = f"bucket_{t}"
        a = corpus.select("vec_id", "vec", "norm", F.col(bkt).alias("bkt"))
        if query_ids is not None:
            # kNN-graph slice: restrict the QUERY side only (candidate
            # lists stay whole), e.g. for recall probes — per-query cost
            # drops to Σ matched-list sizes instead of the full graph
            a = a.filter(F.col("vec_id").isin(list(query_ids)))
        b = corpus.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("vec").alias("nvec"),
            F.col("norm").alias("nnorm"),
            F.col(bkt).alias("nbkt"),
        )
        if t in overflow:
            wl = Window.partitionBy("nbkt").orderBy(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(str(t)), F.col("neighbor_id").cast("string")
                    )
                ),
                F.col("neighbor_id"),
            )
            b = (
                b.withColumn("lrn", F.row_number().over(wl))
                .filter(F.col("lrn") <= max_list)
                .drop("lrn")
            )
        sim = dot(F.col("vec"), F.col("nvec")) / (F.col("norm") * F.col("nnorm"))
        pred = (
            F.col("vec_id") != F.col("neighbor_id")
            if pair_pred == "!="
            else F.col("vec_id") < F.col("neighbor_id")
        )
        per_table.append(
            a.join(b, (F.col("bkt") == F.col("nbkt")) & pred)
            .select("vec_id", "neighbor_id", sim.alias("sim"))
        )
    pairs = per_table[0]
    for p in per_table[1:]:
        pairs = pairs.unionByName(p)
    return pairs.distinct()


def ann_topk_multitable(
    corpus: DataFrame,
    k: int = 3,
    n_tables: int = LSH_MULTITABLE_TABLES,
    tiebreak_round: int = 6,
    max_list: int | None = ANN_MAX_LIST,
    query_ids=None,
) -> DataFrame:
    """Approximate top-k via multi-table LSH: a pair is a candidate if it
    collides in ANY table; per-table equi-joins union'd, pair-deduped, then
    ranked.

    Scale shape: each table contributes one shuffle on a 2^bits-cardinality
    key; the union + distinct dedups collisions before ranking so a pair is
    scored once no matter how many tables it collides in. An OR-join would
    be a nested loop in Spark — the union of equi-joins is the engine-native
    formulation. The CANDIDATE side of each inverted list is capped at
    ``max_list`` via a deterministic md5-ordered sample (salted per table,
    so overflow drops are independent across tables): without the cap the
    self-join is Σ|list|² — quadratic in the corpus once lists outgrow
    2^bits, which axis-aligned sign planes can't raise past the vector
    dimensionality. Every vector still queries from the uncapped side, so
    each still gets ~k neighbors; only its candidate pool is bounded.

    The cap is OVERFLOW-GATED: list sizes are a <= n_tables * 2^bits row
    aggregate (bounded by index geometry, not data), collected once. A
    table with no overflowing list joins its candidate side directly —
    zero extra shuffles, so fixture/bench scales pay only the skinny count
    pass. A table that overflows windows its WHOLE candidate side (rows in
    small lists pass the rank filter trivially): one shuffle that the
    bucket-key join then reuses — splitting hot/cool lists and unioning
    was measured 7x slower because the union forfeits that exchange reuse.
    """
    pairs = candidate_pairs_multitable(
        corpus,
        n_tables=n_tables,
        max_list=max_list,
        query_ids=query_ids,
        pair_pred="!=",
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.round(F.col("sim"), tiebreak_round).desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def topk_per_query_agg(
    scored: DataFrame,
    k: int,
    tiebreak_round: int = 6,
    group_col: str = "query_id",
) -> DataFrame:
    """Exact per-query top-k over ``(query_id, neighbor_id, sim)`` rows
    WITHOUT a global rank window.

    A ``row_number() over (partition by query_id order by sim desc)`` plan
    shuffles every scored pair into |queries| partitions and FULLY SORTS
    each — with 50 queries that is 50-way parallelism and an O(n log n)
    spill per partition no matter how many executors exist (the docs10
    probe measured it 16.8x for 10x corpus). Here instead:

      1. group on (query_id, spark_partition_id()): each input partition's
         pairs aggregate to its own per-query sorted top-k slice — the
         slice bound means stage 2's input is |partitions| x |queries| x k
         rows, not |corpus| x |queries|;
      2. re-aggregate the slices per query and slice again — exact, since
         any row outside its partition's top-k cannot be in the global
         top-k.

    The one wide exchange carries hash-aggregated buffers at full
    (qid x partition) parallelism with NO sort; skew is impossible because
    the partition id salts the key. Order inside each slice is
    (round(sim, tiebreak) desc, neighbor_id asc) — encoded as an ascending
    struct sort on (-rounded_sim, neighbor_id), the same total order the
    window version used, so results are bit-identical.
    """
    key = F.struct(
        (-F.round(F.col("sim"), tiebreak_round)).alias("nk"),
        F.col("neighbor_id").alias("neighbor_id"),
        F.col("sim").alias("sim"),
    )
    partial = (
        scored.groupBy(group_col, F.spark_partition_id().alias("_p"))
        .agg(F.slice(F.array_sort(F.collect_list(key)), 1, k).alias("top"))
    )
    return (
        partial.select(group_col, F.explode("top").alias("t"))
        .groupBy(group_col)
        .agg(F.slice(F.array_sort(F.collect_list("t")), 1, k).alias("top"))
        .select(group_col, F.explode("top").alias("t"))
        .select(
            group_col,
            F.col("t.neighbor_id").alias("neighbor_id"),
            F.round("t.sim", 4).alias("sim"),
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    tiebreak_round: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self-matches excluded).

    ``corpus``/``queries`` are ``prepare()`` outputs. The join is a broadcast
    nested loop (queries side broadcast); ordering ties resolve on
    (round(sim, 6) desc, neighbor id) so results are deterministic across
    engines despite float addition order. Ranking is the partial-aggregation
    top-k (``topk_per_query_agg``) — the corpus is scored map-side and never
    globally sorted.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("vec"), F.col("norm")
    )
    sim = dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    return topk_per_query_agg(scored, k, tiebreak_round)


def bucketed_candidate_pairs(
    corpus: DataFrame,
    query_ids=None,
    max_list: int | None = ANN_MAX_LIST,
) -> DataFrame:
    """Candidate stage of the legacy 16-bucket index, exposed so tests
    can measure pair VOLUME directly (the cap bounds this stage, not the
    k-bounded final output): (vec_id, bucket, neighbor_id, sim) for every
    surviving bucket-equal pair. Capped volume <= n_queries * max_list."""
    a = corpus.select(
        F.col("vec_id"), F.col("vec"), F.col("norm"), F.col("bucket")
    )
    if query_ids is not None:
        a = a.filter(F.col("vec_id").isin(list(query_ids)))
    b = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vec").alias("nvec"),
        F.col("norm").alias("nnorm"),
        F.col("bucket").alias("cand_bucket"),
    )
    if max_list is not None:
        overflow = (
            corpus.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_list)
            .limit(1)
            .count()
            > 0
        )
        if overflow:
            wl = Window.partitionBy("cand_bucket").orderBy(
                F.md5(F.col("neighbor_id").cast("string")),
                F.col("neighbor_id"),
            )
            b = (
                b.withColumn("lrn", F.row_number().over(wl))
                .filter(F.col("lrn") <= max_list)
                .drop("lrn")
            )
    sim = dot(F.col("vec"), F.col("nvec")) / (F.col("norm") * F.col("nnorm"))
    return (
        a.join(
            b,
            (F.col("bucket") == F.col("cand_bucket"))
            & (F.col("vec_id") != F.col("neighbor_id")),
        )
        .select("vec_id", "bucket", "neighbor_id", sim.alias("sim"))
    )


def ann_topk_bucketed(
    corpus: DataFrame,
    k: int = 3,
    query_ids=None,
    max_list: int | None = ANN_MAX_LIST,
) -> DataFrame:
    """Approximate top-k per vector: candidates share the LSH sign bucket.

    Equi-join on the bucket key. Vectors alone in their bucket produce no
    rows (expected ANN behavior; recall measured in tests). The CANDIDATE
    side of each bucket is capped at ``max_list`` via a deterministic
    md5-ordered sample (round 7: the 16-bucket index otherwise degenerates
    to Σ|bucket|² ≈ n²/16 pairs on any real corpus); the cap is
    overflow-gated — when no bucket exceeds ``max_list`` (one skinny
    count, bounded by 2^bits rows) the join runs direct with zero extra
    shuffles, and the SQL oracle's unconditional rank filter is then a
    trivial pass, so results agree either way.
    """
    pairs = bucketed_candidate_pairs(corpus, query_ids, max_list)
    w = Window.partitionBy("vec_id").orderBy(
        F.round(F.col("sim"), 6).desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "bucket", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    tiebreak_round: int = 6,
) -> DataFrame:
    """Arrow-vectorized twin of ``cosine_topk``: the corpus streams through
    mapInPandas and scores against the query matrix with one numpy matmul
    per batch.

    Same inputs/outputs/tie-breaks as the JVM version — the two paths are
    interchangeable and cross-checked in tests. This is the shape to prefer
    when the scoring math outgrows SQL expressions (real embedding models,
    quantized dot products): the Python boundary costs one Arrow hop per
    batch, and the matmul amortizes it over |batch| x |queries| pairs.

    The per-batch TOP-K happens inside numpy (lexsort under the same
    (rounded sim desc, neighbor_id asc) total order), so each Arrow batch
    returns at most |queries| x k rows instead of |batch| x |queries| —
    the Python->JVM hop and the final reduction both carry k-bounded data.
    The tail is the same ``topk_per_query_agg`` exact reduction.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select("vec_id", "vec", "norm").collect()  # small side
    qm = np.array([r["vec"] for r in q_rows], dtype=np.float64)
    qn = np.array([r["norm"] for r in q_rows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["vec"].to_numpy())
            norms = pdf["norm"].to_numpy(dtype=np.float64)
            nids = pdf["vec_id"].to_numpy(dtype=np.int64)
            sims = (mat @ qm.T) / (norms[:, None] * qn[None, :])
            out_q, out_n, out_s = [], [], []
            for j in range(sims.shape[1]):
                col = sims[:, j]
                mask = nids != qids[j]  # self-match excluded
                cand_ids, cand_sims = nids[mask], col[mask]
                order = np.lexsort(
                    (cand_ids, -np.round(cand_sims, tiebreak_round))
                )[:k]
                out_q.append(np.full(len(order), qids[j], dtype=np.int64))
                out_n.append(cand_ids[order])
                out_s.append(cand_sims[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "sim": np.concatenate(out_s),
                }
            )

    scored = corpus.select("vec_id", "vec", "norm").mapInPandas(
        score, schema="query_id long, neighbor_id long, sim double"
    )
    return topk_per_query_agg(scored, k, tiebreak_round)


def label_centroids(corpus_with_label: DataFrame) -> DataFrame:
    """Per-label centroid vectors (the IVF coarse quantizer / k-means step).

    posexplode -> per-dimension avg -> reassemble: the shuffle carries
    (label, dim, partial) — fixed width, mergeable at any scale.
    """
    return (
        corpus_with_label.select("label", F.posexplode("vec").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s["m"]).alias("cvec"))
    )


def ivf_topk(
    corpus_with_label: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 1,
    tiebreak_round: int = 6,
) -> DataFrame:
    """IVF-style ANN: assign each query to its ``n_probe`` nearest
    centroids, then scan only those inverted lists.

    n_probe > 1 is the recall knob: the scan cost grows linearly with the
    probed lists (still a vanishing fraction of the corpus) while recovering
    neighbors that sit just across a centroid boundary. Lists are disjoint
    by label, so no pair is scored twice. The centroid table is |labels|
    rows — bounded, so it carries an explicit broadcast hint. The
    assignment table is |queries| x n_probe rows — UNBOUNDED, so it
    deliberately carries none: AQE broadcasts it while a probe batch fits
    and falls back to a shuffle join for corpus-sized query sets instead
    of OOMing the build side. The corpus is filtered to the probed lists
    by an equi-join on label — at scale that is a partition-pruned read
    when the corpus is stored partitioned by list id, which is exactly how
    IVF indexes lay out.
    """
    cent = label_centroids(corpus_with_label)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    csim = dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * l2_norm(F.col("cvec")))
    wq = Window.partitionBy("query_id").orderBy(
        F.round(csim, tiebreak_round).desc(), F.col("label").asc()
    )
    assign = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("crn", F.row_number().over(wq))
        .filter(F.col("crn") <= n_probe)
        .select("query_id", "qvec", "qnorm", F.col("label").alias("probe_label"))
    )
    c = corpus_with_label.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label"),
        F.col("vec"),
        F.col("norm"),
    )
    nsim = dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("norm"))
    wn = Window.partitionBy("query_id").orderBy(
        F.round(F.col("sim"), tiebreak_round).desc(), F.col("neighbor_id").asc()
    )
    return (
        c.join(assign, c.label == F.col("probe_label"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "probe_label", "neighbor_id", nsim.alias("sim"))
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") <= k)
        .select("query_id", "probe_label", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# SQL oracle fragments (DuckDB dialect).
# ---------------------------------------------------------------------------

SQL_COSINE = "list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def sql_sign_bucket(c: str, bits: int = LSH_SIGN_BITS, offset: int = 0) -> str:
    parts = " || ".join(
        f"CASE WHEN {c}[{i}] >= 0 THEN '1' ELSE '0' END"
        for i in range(offset + 1, offset + bits + 1)
    )
    return "(" + parts + ")"


def sql_quantize_fixed(c: str) -> str:
    """DuckDB twin of ``quantize_fixed``: float list -> exact fixed-point,
    carried as DOUBLE (integer-valued, so arithmetic stays exact)."""
    return (
        f"list_transform(CAST({c} AS DOUBLE[]), "
        f"x -> CAST(CAST(floor(x * {FP_SCALE}.0) AS BIGINT) AS DOUBLE))"
    )


def sql_rotated_bucket(qc: str, plane_rows: list[list[int]]) -> str:
    """DuckDB twin of ``rotated_bucket`` over a quantized list column
    ``qc``: the ±1 coefficient rows are emitted as literals, and the
    integer-valued dot products match Spark's fold exactly (every
    intermediate < 2^53)."""
    parts = " || ".join(
        "CASE WHEN list_dot_product({qc}, [{lits}]) >= 0 "
        "THEN '1' ELSE '0' END".format(
            qc=qc,
            lits=", ".join(f"{c}.0" for c in coeffs),
        )
        for coeffs in plane_rows
    )
    return "(" + parts + ")"
