"""Materialize a documents/embeddings-only scale-up of sf0.1.

The full sf1 replication (tools/make_sf1.py) shows the text/embedding ops
still overhead-bound at 50k docs — their LSH/bucket shuffle cost is
unmeasured. This job scales ONLY the two tables those ops read, by any
factor, using the same bijections as make_sf1:

  * doc_id / vec_id shift by copy_index * (max+1);
  * documents get the token-suffix bijection per copy (within-copy shingle
    structure preserved exactly; cross-copy Jaccard 0 -> near-dup pair
    counts scale linearly, never quadratically);
  * embedding vectors get a deterministic per-copy rotation of the vector
    (element roll by copy_index % dim), so copies don't collapse into the
    same LSH buckets / IVF lists.

The replication is ONE crossJoin against a copies-range (per-copy
transforms expressed with Column-arg regexp_replace / slice), not a
copies-way union — a 1000-branch union plan stalls Catalyst long before
the data is big.

Usage: python tools/make_docs_scale.py [copies] [out_dir] [--docs-only]
       (defaults: 100 -> /root/repo/.scratch/docs10)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.catalog import load
from rxlan_aws_lakehouse_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--docs-only"]
    docs_only = "--docs-only" in sys.argv[1:]
    copies = int(args[0]) if args else 100
    out = args[1] if len(args) > 1 else "/root/repo/.scratch/docs10"
    spark = get_spark("make-docs-scale")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    copy = F.col("copy")
    copies_df = spark.range(copies).select(F.col("id").alias("copy"))

    docs = load(spark, SRC, "documents")
    doc_stride = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    full = docs.crossJoin(copies_df).select(
        (F.col("doc_id") + copy * doc_stride).alias("doc_id"),
        F.when(copy == 0, F.col("text"))
        .otherwise(
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1_"), copy.cast("string")),
            )
        )
        .alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )
    full.repartition(max(32, copies // 2)).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    print(f"documents: x{copies}")
    if docs_only:
        return

    emb = load(spark, SRC, "embeddings")
    vec_stride = int(emb.agg(F.max("vec_id")).first()[0]) + 1
    dim = len(emb.select("embedding").first()[0])
    r = (copy % dim).cast("int")
    rolled = F.concat(
        F.slice("embedding", r + 1, F.lit(dim) - r),
        F.slice("embedding", F.lit(1), r),
    )
    full_e = emb.crossJoin(copies_df).select(
        (F.col("vec_id") + copy * vec_stride).alias("vec_id"),
        rolled.alias("embedding"),
        *[c for c in emb.columns if c not in ("vec_id", "embedding")],
    )
    full_e.repartition(max(32, copies // 2)).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    print(f"embeddings: x{copies}")


if __name__ == "__main__":
    main()
