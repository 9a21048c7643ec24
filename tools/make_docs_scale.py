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

Usage: python tools/make_docs_scale.py [copies] [out_dir]
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
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/docs10"
    spark = get_spark("make-docs-scale")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    docs = load(spark, SRC, "documents")
    doc_stride = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    parts = []
    for i in range(copies):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * doc_stride))
        if i > 0:
            c = c.withColumn("text", F.regexp_replace("text", r"(\S+)", rf"$1_{i}"))
        parts.append(c)
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    full.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    print(f"documents: x{copies}")

    emb = load(spark, SRC, "embeddings")
    vec_stride = int(emb.agg(F.max("vec_id")).first()[0]) + 1
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for i in range(copies):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * vec_stride))
        r = i % dim
        if r:
            # roll the vector by r positions: norm-preserving, bucket-mixing
            c = c.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", r + 1, dim - r),
                    F.slice("embedding", 1, r),
                ),
            )
        parts.append(c)
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    full.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    print(f"embeddings: x{copies}")


if __name__ == "__main__":
    main()
