"""Foreign Delta MERGE (round 16 — r15 verdict task 2's follow-on:
"foreign row-level UPDATE, then MERGE").

``merge_delta`` commits an SCD1 MERGE against a foreign ``_delta_log``:
matched rows leave via deletion vectors (or a CoW key-anti-join
rewrite), the ANSI result set (replacements + inserts) lands as fresh
adds, all in ONE commit — the native ``merge_upsert_dv`` shape on a
table this engine does not own.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.delta_export import (
    export_delta,
    import_delta,
    merge_delta,
    read_delta_cdf,
    replay_delta_log,
)
from rxlan_aws_lakehouse_spark.txn import TxnTable


def _rows(df, cols=("k", "v")):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def _foreign(spark, tmp_path, name="t"):
    t = TxnTable(str(tmp_path / f"src_{name}"))
    df = spark.range(10).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 10).cast("int").alias("v"),
    )
    t.commit(df.repartition(2))
    dest = str(tmp_path / name)
    export_delta(t, dest)
    return dest


def _updates(spark):
    # replace k=2,5 and insert k=100
    return spark.createDataFrame(
        [(2, -2), (5, -5), (100, -100)], "k INT, v INT"
    )


def test_merge_cow(spark, tmp_path):
    dest = _foreign(spark, tmp_path)
    out = merge_delta(
        spark, dest, _updates(spark), ["k"], mode="cow"
    )
    assert out["mode"] == "cow" and out["n_matched"] == 2
    expect = {
        (k, k * 10) for k in range(10) if k not in (2, 5)
    } | {(2, -2), (5, -5), (100, -100)}
    assert _rows(import_delta(spark, dest)) == expect
    assert import_delta(spark, dest, version=0).count() == 10


def test_merge_dv_with_delete_keys(spark, tmp_path):
    dest = _foreign(spark, tmp_path, name="dv")
    before_rels = set(replay_delta_log(dest)["adds"])
    dels = spark.createDataFrame([(7,), (8,)], "k INT")
    out = merge_delta(
        spark,
        dest,
        _updates(spark),
        ["k"],
        delete_keys=dels,
        mode="dv",
    )
    assert out["mode"] == "dv" and out["n_matched"] == 4  # 2,5,7,8
    expect = {
        (k, k * 10) for k in range(10) if k not in (2, 5, 7, 8)
    } | {(2, -2), (5, -5), (100, -100)}
    assert _rows(import_delta(spark, dest)) == expect
    after = replay_delta_log(dest)
    assert before_rels <= set(after["adds"])  # originals kept w/ DVs
    assert any(
        a.get("deletionVector")
        for rel, a in after["adds"].items()
        if rel in before_rels
    )


def test_merge_no_match_is_pure_insert(spark, tmp_path):
    dest = _foreign(spark, tmp_path, name="ins")
    ups = spark.createDataFrame([(50, 1), (51, 2)], "k INT, v INT")
    out = merge_delta(spark, dest, ups, ["k"])
    assert out["n_matched"] == 0 and out["version"] == 1
    assert _rows(import_delta(spark, dest)) == {
        (k, k * 10) for k in range(10)
    } | {(50, 1), (51, 2)}


def test_merge_emits_classified_cdf(spark, tmp_path):
    import json as _json

    dest = _foreign(spark, tmp_path, name="cdf")
    with open(
        os.path.join(dest, "_delta_log", "00000000000000000000.json")
    ) as f:
        meta = next(
            _json.loads(x) for x in f if "metaData" in _json.loads(x)
        )
    meta["metaData"]["configuration"] = {
        "delta.enableChangeDataFeed": "true"
    }
    with open(
        os.path.join(dest, "_delta_log", "00000000000000000001.json"),
        "w",
    ) as f:
        f.write(_json.dumps(meta) + "\n")
    dels = spark.createDataFrame([(9,)], "k INT")
    out = merge_delta(
        spark, dest, _updates(spark), ["k"], delete_keys=dels
    )
    cdf = read_delta_cdf(
        spark, dest, starting_commit=out["version"]
    ).filter(F.col("_commit_version") == out["version"])
    got = {
        (r["k"], r["v"], r["_change_type"]) for r in cdf.collect()
    }
    assert got == {
        (2, 20, "update_preimage"),
        (5, 50, "update_preimage"),
        (2, -2, "update_postimage"),
        (5, -5, "update_postimage"),
        (100, -100, "insert"),
        (9, 90, "delete"),
    }


def test_merge_refusals(spark, tmp_path):
    dest = _foreign(spark, tmp_path, name="ref")
    dup = spark.createDataFrame([(1, 1), (1, 2)], "k INT, v INT")
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_delta(spark, dest, dup, ["k"])
    ups = _updates(spark)
    with pytest.raises(ValueError, match="both updates and delete"):
        merge_delta(
            spark,
            dest,
            ups,
            ["k"],
            delete_keys=spark.createDataFrame([(2,)], "k INT"),
        )
    with pytest.raises(ValueError, match="unknown key column"):
        merge_delta(spark, dest, ups, ["nope"])
    bad = spark.createDataFrame([(1, 1.0)], "k INT, zz DOUBLE")
    with pytest.raises(ValueError, match="do not match"):
        merge_delta(spark, dest, bad, ["k"])
