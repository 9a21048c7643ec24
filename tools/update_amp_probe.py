"""Write-amplification probe for UPDATE: copy-on-write (update_where)
vs merge-on-read (update_where_dv, round 10) on the same scattered 10%
predicate — the UPDATE twin of the r9 MERGE write-amp evidence.

Usage: python tools/update_amp_probe.py [sf_dir ...]
       (default: sf0.1 and the replicated .scratch/sf10cust customer)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.session import get_spark
from rxlan_aws_lakehouse_spark.txn import TxnTable


def _commit_write_cost(t, v) -> tuple[int, int]:
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


def probe(spark, sf_dir: str) -> dict:
    if os.path.isfile(os.path.join(sf_dir, "customer.parquet")) or os.path.isdir(
        os.path.join(sf_dir, "customer.parquet")
    ):
        cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    else:
        raise FileNotFoundError(sf_dir)
    cust = cust.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    work = tempfile.mkdtemp(prefix="upd_amp_")
    try:
        out = {"sf_dir": sf_dir, "n_rows": cust.count()}
        cond = F.col("c_custkey") % 10 == 0  # scattered: touches EVERY file
        sets = {"c_acctbal": F.col("c_acctbal") + F.lit(1.0)}
        for label, op in (("cow", "update_where"), ("dv", "update_where_dv")):
            t = TxnTable(f"{work}/{label}")
            base_v = t.commit(cust, partition_by=["c_mktsegment"])
            if label == "cow":
                _, out["table_mb"] = _commit_write_cost(t, base_v)
                out["table_mb"] = round(out["table_mb"] / 1e6, 2)
            t0 = time.perf_counter()
            v = getattr(t, op)(spark, cond, dict(sets))
            out[f"{label}_wall"] = round(time.perf_counter() - t0, 2)
            files, size = _commit_write_cost(t, v)
            out[f"{label}_files_written"] = files
            out[f"{label}_mb_written"] = round(size / 1e6, 2)
            t0 = time.perf_counter()
            out[f"{label}_read_rows"] = t.read(spark).count()
            out[f"{label}_read_wall"] = round(time.perf_counter() - t0, 2)
        assert out["cow_read_rows"] == out["dv_read_rows"] == out["n_rows"]
        # value parity: both paths must produce identical tables
        a = TxnTable(f"{work}/cow").read(spark)
        b = TxnTable(f"{work}/dv").read(spark)
        diff = a.exceptAll(b).limit(1).count() + b.exceptAll(a).limit(1).count()
        out["paths_identical"] = diff == 0
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/root/repo/.scratch/sf10cust",
    ]
    spark = get_spark("update-amp-probe")
    for d in dirs:
        print(json.dumps(probe(spark, d)), flush=True)


if __name__ == "__main__":
    main()
