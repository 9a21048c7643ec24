"""Per-lane Spark job/stage/task counts via the status tracker.

Usage: python tools/job_stats.py <lane> [lane ...]   (env PLAN_SF_DIR)

Runs each lane once warm, then once inside a job group, and reports how
many Spark jobs / stages / tasks the lane issues. A lane whose wall is
dominated by DOZENS of tiny jobs is fixed-overhead-bound (guide §1.2:
remove passes), not compute-bound — the number that tells the two apart.
Evidence tool for OPTIMIZATION_r16.md; not part of the bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    lanes = sys.argv[1:]
    sf_dir = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job-stats")
    # optional conf overrides: JOBSTATS_CONFS="k1=v1,k2=v2"
    for kv in os.environ.get("JOBSTATS_CONFS", "").split(","):
        if kv:
            k, v = kv.split("=", 1)
            spark.conf.set(k, v)
    sc = spark.sparkContext
    qs = entrymod.queries()
    print(f"{'lane':32s} {'wall_s':>7s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s}")
    for name in lanes:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warm
        spark.catalog.clearCache()
        group = f"jobstats-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        st = sc.statusTracker()
        job_ids = st.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(
            f"{name:32s} {wall:7.3f} {len(job_ids):5d} {n_stages:6d} "
            f"{n_tasks:6d}"
        )


if __name__ == "__main__":
    main()
