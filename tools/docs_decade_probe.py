"""Decade probe for the dedup lane: docs10 -> docs30 -> docs100.

Round 4 measured dedup_minhash_pairs at 8.0x/10x and contamination_check
at 3.2x/10x (docs1 -> docs10) and claimed the capped-LSH design holds into
the next decade. This probe MEASURES that: the two heaviest scan-bound
text ops run at 10x / 30x / 100x the sf0.1 corpus (0.5M / 1.5M / 5M docs,
tools/make_docs_scale.py), each timed with per-stage wall attribution from
the Spark event log, so a bucket-cap cliff or a quadratic stage shows up
AS A STAGE, not just a total.

Each (corpus, query) pair runs in its OWN SparkSession: the event log
finalizes on session stop (it is not flushed reliably mid-run in local
mode), and per-run logs need no timestamp fencing. JVM startup (~10s) is
outside the timed window.

Usage: python tools/docs_decade_probe.py [corpus_dir ...]
       (default: .scratch/docs10 .scratch/docs30 .scratch/docs100)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from rxlan_aws_lakehouse_spark.session import RUNTIME_CONFS, default_parallelism

EVENTLOG_DIR = "/tmp/docs_decade_eventlog"
# override with DECADE_QUERIES=name1,name2 to run a subset
QUERIES = tuple(
    q
    for q in os.environ.get(
        "DECADE_QUERIES", "dedup_minhash_pairs,contamination_check"
    ).split(",")
    if q
)


def fresh_spark() -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("docs-decade-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.locality.wait", "0s")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{EVENTLOG_DIR}")
        # Spark 4 defaults to rolling v2 logs, zstd-compressed, in an
        # app subdirectory — keep them as plain JSON so the parser below
        # stays dependency-free
        .config("spark.eventLog.compress", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stage_walls() -> list[tuple[str, float]]:
    """(stage name, wall seconds) across every log file in EVENTLOG_DIR
    (the caller clears the dir before each run)."""
    out = []
    paths = [
        os.path.join(r, n)
        for r, _d, ns in os.walk(EVENTLOG_DIR)
        for n in ns
        if n.startswith(("events", "local-")) or n.endswith(".inprogress")
    ]
    for path in paths:
        if not os.path.isfile(path):
            continue
        try:
            with open(path) as f:
                for line in f:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if ev.get("Event") != "SparkListenerStageCompleted":
                        continue
                    info = ev.get("Stage Info", {})
                    sub = info.get("Submission Time")
                    comp = info.get("Completion Time")
                    if not sub or not comp:
                        continue
                    label = (
                        f"s{info.get('Stage ID')}"
                        f"[{info.get('Number of Tasks')}t]"
                    )
                    out.append((label, (comp - sub) / 1000.0))
        except OSError:
            continue
    return sorted(out, key=lambda t: -t[1])


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/repo/.scratch/docs10",
        "/root/repo/.scratch/docs30",
        "/root/repo/.scratch/docs100",
    ]
    print("| corpus | query | rows | wall | top stages (wall) |")
    print("|---|---|---|---|---|")
    for d in dirs:
        for name in QUERIES:
            shutil.rmtree(EVENTLOG_DIR, ignore_errors=True)
            os.makedirs(EVENTLOG_DIR, exist_ok=True)
            spark = fresh_spark()
            import __spark_entry__ as entrymod

            fn = entrymod.queries()[name]
            t0 = time.perf_counter()
            n = fn(spark, d).count()
            wall = time.perf_counter() - t0
            spark.stop()
            # new JVM per run: getOrCreate would reuse the stopped context
            SparkSession._instantiatedSession = None
            top = stage_walls()[:3]
            top_s = "; ".join(f"{nm} {w:.1f}s" for nm, w in top)
            print(
                f"| {os.path.basename(d)} | {name} | {n} | {wall:.2f}s | {top_s} |",
                flush=True,
            )


if __name__ == "__main__":
    main()
