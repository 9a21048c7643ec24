"""Interleaved same-JVM A/B of runtime SQL confs over named lanes.

Usage:
  python tools/ab_conf.py "k1=v1,k2=v2" lane [lane ...]

Protocol: per lane, 2 unmeasured warm passes, then alternate
A(default), B(conf set), A, B, A, B — pairwise interleaving so episodic
host noise (this sandbox shows 1.5-3x basket swings) hits both arms
equally. Reports per-lane medians of each arm and the pairwise ratio.
Evidence tool for OPTIMIZATION_r16.md; not part of the bench contract.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402

N_PAIRS = 3


def main() -> None:
    confs = dict(
        kv.split("=", 1) for kv in sys.argv[1].split(",") if kv
    )
    lanes = sys.argv[2:]
    sf_dir = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-conf")
    qs = entrymod.queries()
    defaults = {k: spark.conf.get(k, None) for k in confs}

    def set_arm(b: bool) -> None:
        for k, v in confs.items():
            if b:
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

    print(f"confs B: {confs}")
    for name in lanes:
        fn = qs[name]
        # warm BOTH arms: each arm's plans differ, so each pays its own
        # codegen/JIT warm-in — warming only one arm biases the other
        set_arm(False)
        fn(spark, sf_dir).count()
        fn(spark, sf_dir).count()
        set_arm(True)
        fn(spark, sf_dir).count()
        fn(spark, sf_dir).count()
        a_times, b_times = [], []
        for _ in range(N_PAIRS):
            set_arm(False)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            a_times.append(time.perf_counter() - t0)
            set_arm(True)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            b_times.append(time.perf_counter() - t0)
        set_arm(False)
        ma, mb = statistics.median(a_times), statistics.median(b_times)
        print(
            f"{name:28s} A={ma:7.3f} B={mb:7.3f} B/A={mb / ma:5.3f}  "
            f"(A runs {[round(t, 2) for t in a_times]}, "
            f"B runs {[round(t, 2) for t in b_times]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
