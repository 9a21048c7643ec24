"""sf0.1 -> sf1 scale sweep for the post-round-4 lanes (r7 verdict task 1).

The newest plans — txn merge/incremental, SCD2 (+ point-in-time), winnowing,
contamination, the rotated ANN index (incl. the auto-bits sizing rule) and
the round-7-rewritten emb_neardup — had never run above sf0.1; their
100x-scale claims rested on sf0.1 walls plus synthetic docs probes. This
sweep measures each lane at both scales on the same session and prints
wall seconds + the sf1/sf0.1 slope (10x data => slope ~10 is linear IO-bound,
~1 is overhead-bound, >>10 is super-linear = a scale bug).

Also probes the auto_bits path explicitly: at sf1 the 10x corpus must get
finer buckets (bits up), with max inverted-list length reported before the
candidate cap.

Usage: python tools/sf1_sweep.py [sf1_dir] [lane ...]
Writes one JSON line per lane to stdout; paste the table into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"

DEFAULT_LANES = [
    "txn_merge_evolved",
    "txn_incremental_agg",
    "scd2_customer_history",
    "scd2_point_in_time_join",
    "text_winnowing",
    "winnowing_overlap",
    "contamination_check",
    "emb_ann_rotated",
    "emb_neardup",
    "emb_ann_lsh",
    "dedup_minhash_pairs",
    "streaming_watermark_dedup_counts",
    "multimodal_decode_audio",
    "join_skew_salted",
]


def timed(fn, spark, sf_dir, runs=2):
    fn(spark, sf_dir).count()  # warmup: codegen + lane index build
    walls = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        walls.append(time.perf_counter() - t0)
    return min(walls), n


def autobits_probe(spark, sf_dir):
    """bits chosen + worst/mean inverted-list length for the AUTO-sized
    rotated index (registry queries pin bits; this is the library path)."""
    from pyspark.sql import functions as F

    from rxlan_aws_lakehouse_spark.catalog import load
    from rxlan_aws_lakehouse_spark.ops import similarity as sim

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    t0 = time.perf_counter()
    prep = sim.prepare_multitable_rotated(emb, bits=None)
    bits = prep._rotated_bits
    lists = (
        prep.select(F.col("bucket_0").alias("b"))
        .groupBy("b")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.avg("count").alias("mean"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .first()
    )
    wall = time.perf_counter() - t0
    return {
        "n_vectors": n,
        "auto_bits": bits,
        "max_list": int(lists["mx"]),
        "mean_list": round(float(lists["mean"]), 1),
        "n_buckets": int(lists["n_buckets"]),
        "cap": sim.ANN_MAX_LIST,
        "wall": round(wall, 2),
    }


def _commit_write_cost(t, v) -> tuple[int, int]:
    """(files_written, bytes_written) of one commit: its FRESH data files
    plus any freshly-staged aux payload (_dv) — carried (hard-linked)
    files cost nothing, which is the whole point being measured."""
    meta = t._meta(v)
    root = os.path.join(t.root, "_versions", v)
    files, size = 0, 0
    for info in meta["shards"].values():
        for rel in info["fresh"]:
            files += 1
            size += os.path.getsize(os.path.join(root, rel))
    dv = os.path.join(root, "_dv")
    if os.path.isdir(dv):
        for nme in os.listdir(dv):
            p = os.path.join(dv, nme)
            if os.path.isfile(p):
                size += os.path.getsize(p)
    return files, size


def txn_scale_probe(spark, sf_dir):
    """The registry txn lanes pin small working sets (oracle determinism),
    so their flat sweep slopes prove overhead, not scaling. This probe
    runs the same OPERATIONS on the full customer table at each scale:
    commit (partitioned), 10% merge_upsert (copy-on-write AND the round-9
    deletion-vector merge-on-read path, with bytes-written for each — the
    write-amplification evidence), incremental change-feed agg refresh
    over an append — the walls that must stay ~linear in table size for
    the 100 TB claim."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from rxlan_aws_lakehouse_spark.catalog import load
    from rxlan_aws_lakehouse_spark.txn import TxnTable

    work = tempfile.mkdtemp(prefix="txn_scale_")
    try:
        cust = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
        )
        n = cust.count()
        t = TxnTable(f"{work}/t")
        t0 = time.perf_counter()
        base_v = t.commit(cust, partition_by=["c_mktsegment"])
        commit_wall = time.perf_counter() - t0
        _, table_bytes = _commit_write_cost(t, base_v)
        updates = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + F.lit(1.0)
        )
        t0 = time.perf_counter()
        cow_v = t.merge_upsert(spark, updates, keys=["c_custkey"])
        merge_wall = time.perf_counter() - t0
        cow_files, cow_bytes = _commit_write_cost(t, cow_v)
        # merge-on-read twin: same base, same scattered updates, write
        # cost must be ∝ the delta (update rows + positions), not the
        # touch set (which here is EVERY file)
        t3 = TxnTable(f"{work}/t3")
        t3.commit(cust, partition_by=["c_mktsegment"])
        t0 = time.perf_counter()
        mor_v = t3.merge_upsert_dv(spark, updates, keys=["c_custkey"])
        merge_dv_wall = time.perf_counter() - t0
        mor_files, mor_bytes = _commit_write_cost(t3, mor_v)
        t0 = time.perf_counter()
        mor_n = t3.read(spark).count()
        merge_dv_read_wall = time.perf_counter() - t0
        assert mor_n == n, (mor_n, n)
        t0 = time.perf_counter()
        got = t.read(spark).count()
        read_wall = time.perf_counter() - t0
        assert got == n, (got, n)
        # deletion-vector vs rewrite DELETE, same predicate (~10% of rows
        # scattered across every file — the rewrite worst case)
        t0 = time.perf_counter()
        t.delete_where_deferred(spark, F.col("c_custkey") % 10 == 3)
        dv_delete_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        got_dv = t.read(spark).count()
        dv_read_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        t.materialize_deletes(spark)
        materialize_wall = time.perf_counter() - t0
        t2 = TxnTable(f"{work}/t2")
        t2.commit(cust, partition_by=["c_mktsegment"])
        t0 = time.perf_counter()
        t2.delete_where(spark, F.col("c_custkey") % 10 == 3)
        rewrite_delete_wall = time.perf_counter() - t0
        assert got_dv == t2.read(spark).count()
        return {
            "n_rows": n,
            "table_mb": round(table_bytes / 1e6, 2),
            "commit_wall": round(commit_wall, 2),
            "merge_wall": round(merge_wall, 2),
            "merge_files_written": cow_files,
            "merge_mb_written": round(cow_bytes / 1e6, 2),
            "merge_dv_wall": round(merge_dv_wall, 2),
            "merge_dv_files_written": mor_files,
            "merge_dv_mb_written": round(mor_bytes / 1e6, 2),
            "merge_dv_read_wall": round(merge_dv_read_wall, 2),
            "read_wall": round(read_wall, 2),
            "dv_delete_wall": round(dv_delete_wall, 2),
            "dv_read_wall": round(dv_read_wall, 2),
            "materialize_wall": round(materialize_wall, 2),
            "rewrite_delete_wall": round(rewrite_delete_wall, 2),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _ensure_sf10_customer(spark, sf1: str) -> str:
    """Materialize a customer-only sf10 tier (1.5M rows) by replicating
    the sf1 customer ten times with key shifts — the same bijection
    make_sf1.py uses, scoped to the one table the txn probe needs. The
    third decade of txn-op scaling evidence (r8 verdict task 6)."""
    out = "/root/repo/.scratch/sf10cust"
    dst = os.path.join(out, "customer.parquet")
    if os.path.isdir(dst) or os.path.isfile(dst):
        return out
    from pyspark.sql import functions as F

    from rxlan_aws_lakehouse_spark.catalog import load

    os.makedirs(out, exist_ok=True)
    cust = load(spark, sf1, "customer")
    stride = cust.agg(F.max("c_custkey")).first()[0] + 1
    copies = None
    for i in range(10):
        c = cust.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(i * stride)
        )
        copies = c if copies is None else copies.unionByName(c)
    copies.repartition(32).write.mode("overwrite").parquet(dst)
    return out


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    lanes = sys.argv[2:] or DEFAULT_LANES
    spark = get_spark("sf1-sweep")
    queries = entrymod.queries()
    if lanes in (["txn_probe"], ["txn_probe10"]):
        tiers = [(SF01, "sf0.1"), (sf1, "sf1")]
        if lanes == ["txn_probe10"]:
            tiers.append((_ensure_sf10_customer(spark, sf1), "sf10"))
        for sf_dir, tag in tiers:
            print(
                json.dumps({"txn_scale_" + tag: txn_scale_probe(spark, sf_dir)}),
                flush=True,
            )
        return
    for sf_dir, tag in ((SF01, "sf0.1"), (sf1, "sf1")):
        print(json.dumps({"autobits_" + tag: autobits_probe(spark, sf_dir)}))
    for name in lanes:
        fn = queries[name]
        spark.catalog.clearCache()
        w01, n01 = timed(fn, spark, SF01)
        spark.catalog.clearCache()
        w1, n1 = timed(fn, spark, sf1)
        print(
            json.dumps(
                {
                    "lane": name,
                    "sf0.1_wall": round(w01, 2),
                    "sf1_wall": round(w1, 2),
                    "slope": round(w1 / w01, 2) if w01 else None,
                    "sf0.1_rows": n01,
                    "sf1_rows": n1,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
