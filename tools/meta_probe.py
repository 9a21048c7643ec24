"""Manifest-metadata scaling probe: commit cost vs table file count.

Round 3 flagged TxnTable metadata as the one file-count-proportional
driver path (os.walk carry discovery + single-JSON manifest + serial
footer stats). Round 4 sharded the manifest and made every operation
manifest-driven; this probe MEASURES the result: build tables of N files
(N partitions x 1 file), then time (a) an append of one new file and
(b) a single-key merge_upsert, at increasing N. Flat-ish wall times (the
residual is hard-link syscalls, ~10us/file locally; a manifest entry on an
object store) = commit cost scales with the CHANGE, not the table.

Usage: python tools/meta_probe.py [sizes ...]   (default: 200 1000 5000)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.session import get_spark
from rxlan_aws_lakehouse_spark.txn import TxnTable

SCRATCH = "/root/repo/.scratch/meta_probe"


def build(spark, n_files: int) -> TxnTable:
    root = os.path.join(SCRATCH, f"t{n_files}")
    shutil.rmtree(root, ignore_errors=True)
    t = TxnTable(root)
    df = (
        spark.range(n_files * 10)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % n_files).cast("string").alias("p"),
            F.lit("x").alias("tag"),
        )
        .repartition(max(32, n_files // 50), "p")
    )
    t.commit(df, partition_by=["p"])
    return t


def build_unpartitioned(spark, n_files: int) -> TxnTable:
    """The round-4 degeneracy case: no partition columns at all, so every
    file used to land in ONE "root" manifest fragment that each commit
    rewrote in full. With hash sub-sharding the fragment count is bounded
    and a 1-file append rewrites ~1/64th of the manifest."""
    root = os.path.join(SCRATCH, f"u{n_files}")
    shutil.rmtree(root, ignore_errors=True)
    t = TxnTable(root)
    df = (
        spark.range(n_files * 10)
        .select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        .repartitionByRange(n_files, "k")
    )
    t.commit(df)
    return t


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200, 1000, 5000]
    spark = get_spark("meta-probe")
    print("| files | build commit | append 1 file | merge 1 key |")
    print("|---|---|---|---|")
    for n in sizes:
        t0 = time.perf_counter()
        t = build(spark, n)
        t_build = time.perf_counter() - t0
        nf = t._meta(t.current_version())["n_files"]
        one = spark.createDataFrame([(10**9, "0", "new")], "k long, p string, tag string")
        t0 = time.perf_counter()
        t.append(one)
        t_append = time.perf_counter() - t0
        upd = spark.createDataFrame([(0, "0", "upd")], "k long, p string, tag string")
        t0 = time.perf_counter()
        t.merge_upsert(spark, upd, keys=["k"])
        t_merge = time.perf_counter() - t0
        print(
            f"| {nf} | {t_build:.2f}s | {t_append:.2f}s | {t_merge:.2f}s |",
            flush=True,
        )
    print()
    print("| files (unpartitioned) | build commit | append 1 file | merge 1 key | frags |")
    print("|---|---|---|---|---|")
    for n in sizes:
        t0 = time.perf_counter()
        t = build_unpartitioned(spark, n)
        t_build = time.perf_counter() - t0
        meta = t._meta(t.current_version())
        nf = meta["n_files"]
        one = spark.createDataFrame([(10**9, "new")], "k long, tag string").repartition(1)
        t0 = time.perf_counter()
        t.append(one)
        t_append = time.perf_counter() - t0
        upd = spark.createDataFrame([(0, "upd")], "k long, tag string").repartition(1)
        t0 = time.perf_counter()
        t.merge_upsert(spark, upd, keys=["k"])
        t_merge = time.perf_counter() - t0
        n_frags = len(t._meta(t.current_version())["shards"])
        print(
            f"| {nf} | {t_build:.2f}s | {t_append:.2f}s | {t_merge:.2f}s | {n_frags} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
