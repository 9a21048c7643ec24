"""Property-based tests (hypothesis): operator invariants that must hold on
arbitrary inputs, checked against naive Python reference implementations."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.ops import dedup as dd
from rxlan_aws_lakehouse_spark.ops.asof import asof_join

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.sampled_from("ab c"),  # tiny alphabet -> frequent collisions
    min_size=0,
    max_size=40,
)


@SLOW
@given(st.lists(texts, min_size=1, max_size=8))
def test_minhash_containment(spark, docs):
    """Identical docs always share signatures; signatures are permutation
    minima so each element is <= the sentinel and deterministic."""
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    staged = df.select(
        "doc_id", dd.tokens(F.col("text")).alias("toks")
    ).select("doc_id", dd.shingle_hashes_from(F.col("toks")).alias("sh"))
    sig = dd.minhash_signature_from(F.col("sh"), k=4)
    rows = {
        r["doc_id"]: tuple(r[f"m{i}"] for i in range(4))
        for r in staged.select(
            "doc_id", *[s.alias(f"m{i}") for i, s in enumerate(sig)]
        ).collect()
    }
    by_text = {}
    for i, t in enumerate(docs):
        by_text.setdefault(t, []).append(i)
    for ids in by_text.values():
        sigs = {rows[i] for i in ids}
        assert len(sigs) == 1  # same text -> same signature
    for s in rows.values():
        assert all(0 <= v <= dd.MINHASH_P for v in s)


@SLOW
@given(
    st.lists(st.integers(0, 5), min_size=0, max_size=12),
    st.lists(st.integers(0, 5), min_size=0, max_size=12),
)
def test_jaccard_against_python_sets(spark, a, b):
    sa, sb = set(a), set(b)
    expected = len(sa & sb) / len(sa | sb) if (sa | sb) else 0.0
    df = spark.createDataFrame(
        [(list(sa), list(sb))], "a array<long>, b array<long>"
    )
    got = df.select(dd.jaccard(F.col("a"), F.col("b")).alias("j")).head()["j"]
    assert abs(got - expected) < 1e-12


@SLOW
@given(
    st.lists(st.integers(0, 100), min_size=1, max_size=10),
    st.lists(st.integers(0, 100), min_size=0, max_size=10),
)
def test_asof_against_naive(spark, left_ts, right_ts):
    """asof_join == the naive per-row max(right.ts <= left.ts) lookup."""
    left = spark.createDataFrame(
        [("k", int(t), i) for i, t in enumerate(left_ts)],
        "key string, lts long, lid int",
    )
    right = spark.createDataFrame(
        [("k", int(t), f"r{t}") for t in sorted(set(right_ts))] or [("zzz", 0, "never")],
        "key string, rts long, rval string",
    )
    out = {
        r["lid"]: r["rval_right"]
        for r in asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts").collect()
    }
    rset = sorted(set(right_ts))
    for i, t in enumerate(left_ts):
        prior = [r for r in rset if r <= t]
        expected = f"r{max(prior)}" if prior else None
        assert out[i] == expected, f"left ts {t}: {out[i]} != {expected}"


@SLOW
@given(st.lists(st.integers(0, 1000), min_size=1, max_size=30, unique=True))
def test_bucket_pairs_complete(spark, ids):
    """bucket_pairs emits exactly C(n,2) ordered pairs, each a < b."""
    df = spark.createDataFrame([(sorted(ids),)], "ids array<long>")
    rows = df.select(F.explode(dd.bucket_pairs(F.col("ids"))).alias("p")).select(
        "p.a", "p.b"
    ).collect()
    n = len(ids)
    assert len(rows) == n * (n - 1) // 2
    assert all(r["a"] < r["b"] for r in rows)
    assert len({(r["a"], r["b"]) for r in rows}) == len(rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base_keys=st.sets(st.integers(0, 30), min_size=1, max_size=20),
    upd_keys=st.sets(st.integers(0, 40), min_size=1, max_size=10),
    pre_delete=st.sets(st.integers(0, 30), max_size=5),
)
def test_merge_dv_equals_cow_on_arbitrary_inputs(
    spark, tmp_path_factory, base_keys, upd_keys, pre_delete
):
    """PROPERTY: for any base table, update set, and (optional) pending
    deferred-delete set, merge-on-read (merge_upsert_dv) and
    copy-on-write (merge_upsert, run after materializing the deletes)
    produce the exact same logical table — and materializing the MoR
    result changes nothing. The naive reference: dict-apply in Python."""
    from rxlan_aws_lakehouse_spark.txn import TxnTable

    work = tmp_path_factory.mktemp("mdvprop")
    base = [(k, f"b{k}") for k in sorted(base_keys)]
    upd = [(k, f"u{k}") for k in sorted(upd_keys)]

    # python reference: delete, then last-writer-wins upsert
    ref = {k: v for k, v in base if k not in pre_delete}
    for k, v in upd:
        ref[k] = v

    t = TxnTable(str(work / "mor"))
    t.commit(
        spark.createDataFrame(base, "k long, v string").repartition(3, "k")
    )
    if pre_delete:
        t.delete_where_deferred(
            spark, F.col("k").isin(*[int(k) for k in pre_delete])
        )
    t.merge_upsert_dv(
        spark,
        spark.createDataFrame(upd, "k long, v string"),
        keys=["k"],
    )
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == ref
    t.materialize_deletes(spark)
    assert {r["k"]: r["v"] for r in t.read(spark).collect()} == ref


# ---------------------------------------------------------------------------
# Auto-prune over-approximation (round 10): for ANY conjunction of
# simple comparisons, the manifest prune must keep a SUPERSET of the
# files that contain a matching row — the safety property the SQL
# router's WHERE-derived triples (sql_dml.prune_triples_from_where)
# rest on. One table built once; each example is pure metadata + pandas.

_PRUNE_STATE: dict = {}


def _prune_table(spark, tmp_path_factory):
    if _PRUNE_STATE:
        return _PRUNE_STATE
    import os

    import pandas as pd

    from rxlan_aws_lakehouse_spark.txn import TxnTable, _VERSIONS

    root = str(tmp_path_factory.mktemp("prune_prop") / "t")
    t = TxnTable(root)
    df = spark.range(1100).select(
        F.col("id").alias("k"),  # clustered: tight per-file ranges
        ((F.col("id") * 7919) % 1100).alias("v"),  # scattered
    )
    t.commit(df.repartitionByRange(8, "k"), sort_within=["k"])
    v = t.current_version()
    data_root = os.path.join(root, _VERSIONS, v)
    rows_by_file = {
        rel: pd.read_parquet(os.path.join(data_root, rel))
        for rel in t.files(v)
    }
    _PRUNE_STATE.update(table=t, rows=rows_by_file)
    return _PRUNE_STATE


_OPS = {
    "=": lambda a, b: a == b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}

_triple = st.tuples(
    st.sampled_from(["k", "v"]),
    st.sampled_from(sorted(_OPS)),
    st.integers(-5, 1105),
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_triple, min_size=1, max_size=4))
def test_pruned_files_over_approximate_any_conjunction(
    spark, tmp_path_factory, triples
):
    state = _prune_table(spark, tmp_path_factory)
    t, rows_by_file = state["table"], state["rows"]
    kept, _total = t.pruned_files(list(triples))
    kept_set = set(kept)
    for rel, pdf in rows_by_file.items():
        mask = None
        for col, op, val in triples:
            m = _OPS[op](pdf[col], val)
            mask = m if mask is None else (mask & m)
        if bool(mask.any()):
            assert rel in kept_set, (
                f"file {rel} holds a matching row but was pruned "
                f"under {triples}"
            )
