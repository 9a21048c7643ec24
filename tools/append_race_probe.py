"""Two-process FOREIGN-APPEND concurrency probe (round 14).

Claim under test (SCALING.md / append_delta docstring): concurrent
appends against one foreign ``_delta_log`` never lose rows — the
atomic create-if-absent commit publish (``os.link``, the local-FS
conditional PUT) makes the loser of a version-slot race re-replay and
take the next slot, and appends never logically conflict.

The probe forks N writer processes, each appending R batches of
DISTINCT rows to the SAME foreign Delta table (bootstrapped by
``export_delta`` from a txn seed), with no coordination whatsoever.
Afterwards it asserts, via ``import_delta`` and a raw log replay:

  * every (writer, batch, row) triple landed EXACTLY once;
  * the log holds exactly N*R + 1 commits, consecutively numbered
    (no slot skipped, no slot overwritten);
  * every commit carries adds from exactly ONE writer (no torn
    commits).

Usage: python tools/append_race_probe.py [n_writers] [n_batches]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _writer(root: str, wid: int, n_batches: int, rows_per: int) -> None:
    # each process gets its own SparkSession (separate JVM)
    from rxlan_aws_lakehouse_spark.delta_export import append_delta
    from rxlan_aws_lakehouse_spark.session import get_spark

    spark = get_spark(f"append-race-w{wid}")
    for b in range(n_batches):
        df = spark.createDataFrame(
            [
                (wid * 1_000_000 + b * 1_000 + i, float(wid), f"w{wid}b{b}")
                for i in range(rows_per)
            ],
            "k LONG, v DOUBLE, tag STRING",
        )
        out = append_delta(spark, root, df)
        print(
            f"writer {wid} batch {b}: commit {out['version']}",
            flush=True,
        )
    spark.stop()


def main() -> None:
    n_writers = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rows_per = 50
    work = tempfile.mkdtemp(prefix="append_race_")
    try:
        from pyspark.sql import functions as F

        from rxlan_aws_lakehouse_spark.delta_export import (
            export_delta,
            import_delta,
            replay_delta_log,
        )
        from rxlan_aws_lakehouse_spark.session import get_spark
        from rxlan_aws_lakehouse_spark.txn import TxnTable

        spark = get_spark("append-race-main")
        t = TxnTable(os.path.join(work, "seed"))
        t.commit(
            spark.createDataFrame(
                [(-1, 0.0, "seed")], "k LONG, v DOUBLE, tag STRING"
            )
        )
        root = os.path.join(work, "foreign")
        export_delta(t, root)

        ctx = mp.get_context("spawn")
        procs = [
            ctx.Process(
                target=_writer, args=(root, w, n_batches, rows_per)
            )
            for w in range(n_writers)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        assert all(p.exitcode == 0 for p in procs), [
            p.exitcode for p in procs
        ]

        # 1. exactly-once rows
        df = import_delta(spark, root)
        expect = n_writers * n_batches * rows_per + 1
        n = df.count()
        n_distinct = df.select("k").distinct().count()
        assert n == expect == n_distinct, (n, n_distinct, expect)
        per_writer = {
            r["v"]: r["c"]
            for r in df.filter(F.col("k") >= 0)
            .groupBy("v")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        assert all(
            per_writer[float(w)] == n_batches * rows_per
            for w in range(n_writers)
        ), per_writer

        # 2. consecutive commits, no slot skipped/overwritten
        state = replay_delta_log(root)
        assert state["n_commits"] == n_writers * n_batches + 1, state[
            "n_commits"
        ]
        log_dir = os.path.join(root, "_delta_log")
        commits = sorted(
            int(x[:20])
            for x in os.listdir(log_dir)
            if x.endswith(".json") and x[:20].isdigit()
        )
        assert commits == list(range(n_writers * n_batches + 1)), commits

        # 3. no torn commits: one writer per commit
        for c in commits[1:]:
            tags = set()
            with open(os.path.join(log_dir, f"{c:020d}.json")) as f:
                for line in f:
                    a = json.loads(line)
                    if "add" in a:
                        st = json.loads(a["add"]["stats"])
                        tags.add(str(st["minValues"].get("v")))
            assert len(tags) <= 1, (c, tags)

        print(
            f"OK: {n_writers} writers x {n_batches} batches -> "
            f"{expect} rows exactly-once across "
            f"{n_writers * n_batches} racing commits, consecutively "
            "numbered, none torn",
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
