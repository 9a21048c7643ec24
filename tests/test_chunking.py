"""Structural invariants for the chunking and near-dup-keep operators
(value correctness is oracle-hashed at three SFs; these pin the geometry)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from rxlan_aws_lakehouse_spark.catalog import load
from rxlan_aws_lakehouse_spark.queries.llm import CHUNK_STRIDE


def test_chunks_cover_every_document_to_its_last_char(spark, sf_dir):
    chunks = entrymod.queries()["text_chunking"](spark, sf_dir)
    per_doc = chunks.groupBy("doc_id").agg(
        F.max(F.col("start") + F.col("chunk_len") - 1).alias("covered"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.min("start").alias("first_start"),
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("len")
    )
    joined = per_doc.join(docs, "doc_id")
    bad = joined.filter(
        (F.col("first_start") != 1)
        | (F.col("covered") != F.greatest(F.col("len"), F.lit(1)))
        # starts are 1, 1+stride, ... while start <= len (min one chunk)
        | (
            F.col("n_chunks")
            != F.floor(
                (F.greatest(F.col("len"), F.lit(1)) - 1) / float(CHUNK_STRIDE)
            )
            + 1
        )
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_neardup_keep_counts_reconcile(spark, sf_dir):
    rows = entrymod.queries()["dedup_neardup_keep"](spark, sf_dir).collect()
    assert all(r["n_docs"] == r["n_kept"] + r["n_dropped"] for r in rows)
    total = sum(r["n_docs"] for r in rows)
    assert total == load(spark, sf_dir, "documents").count()
    # the fixture corpus contains planted near-dups: something must drop
    assert sum(r["n_dropped"] for r in rows) > 0
