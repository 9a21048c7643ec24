"""Materialize an sf1-equivalent dataset by replicating sf0.1 ten times.

The driver ships sf{0.001,0.01,0.1}; at sf0.1 every headline query is still
overhead-bound (SCALING.md shows 0.01->0.1 ratios near 1), so throughput
claims need a bigger input. This job derives one deterministically from
sf0.1 — no synthetic generators, same distributions:

  * fact tables get 10 copies with key offsets (orderkey/custkey/suppkey/
    user_id/doc_id/vec_id), so per-key cardinalities stay realistic —
    10x the users, not 10x-deeper histories;
  * ``documents`` suffixes every token with the copy index: a bijection on
    word 3-gram shingles, so each copy's near-dup structure is EXACTLY the
    original's, while cross-copy Jaccard is 0 — pair counts scale linearly
    (a naive body copy would collide in every MinHash band and blow up
    quadratically);
  * bounded dims (region/nation/part) are copied once, matching how TPC-H
    scales.

Usage: python tools/make_sf1.py [out_dir]   (default /root/repo/.scratch/sf1)
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
COPIES = 10

# table -> columns shifted by copy_index * (max+1) of that column
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# shifted foreign keys reuse the PARENT table's stride so joins stay valid
STRIDE_OF = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}
COPY_ONCE = ["region", "nation", "part"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    spark = get_spark("make-sf1")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    strides: dict[tuple[str, str], int] = {}
    for table, cols in KEY_SHIFTS.items():
        df = load(spark, SRC, table)
        for c in cols:
            if c not in STRIDE_OF:  # foreign keys reuse the parent's stride
                strides[(table, c)] = int(df.agg(F.max(c)).first()[0]) + 1

    for table in COPY_ONCE:
        load(spark, SRC, table).write.mode("overwrite").parquet(
            os.path.join(out, f"{table}.parquet")
        )
        print(f"{table}: copied once")

    for table, cols in KEY_SHIFTS.items():
        df = load(spark, SRC, table)
        parts = []
        for i in range(COPIES):
            c_df = df
            for c in cols:
                parent = STRIDE_OF.get(c)
                stride = strides[parent] if parent else strides[(table, c)]
                c_df = c_df.withColumn(c, F.col(c) + F.lit(i * stride))
            if table == "documents" and i > 0:
                # token-suffix bijection: within-copy shingle structure is
                # preserved exactly; cross-copy shingle overlap is zero
                c_df = c_df.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", rf"$1_{i}")
                )
            parts.append(c_df)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        full.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
        print(f"{table}: x{COPIES}")


if __name__ == "__main__":
    main()
