"""Profile one lane's driver-side wall: cProfile over a warm pass.

Usage: python tools/profile_lane.py <lane> [sf_dir] [n_top]

Runs the lane once to warm codegen/JIT (unmeasured), then once under
cProfile, and prints the top functions by cumulative time. Driver-side
py4j waits show up under socket.recv / java gateway frames — that is
time the DRIVER spent blocked on Spark jobs; pure-Python hot spots
(json encode, file listing, footer parsing) show up by name. Evidence
tool for OPTIMIZATION_r16.md; not part of the bench contract.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    lane = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    spark = get_spark("profile")
    q = entrymod.queries()
    fn = q[lane]

    t0 = time.perf_counter()
    fn(spark, sf_dir).count()  # warm pass (codegen, JIT, index builds)
    warm = time.perf_counter() - t0
    spark.catalog.clearCache()

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    fn(spark, sf_dir).count()
    pr.disable()
    hot = time.perf_counter() - t0

    s = io.StringIO()
    st = pstats.Stats(pr, stream=s)
    st.sort_stats("cumulative").print_stats(n_top)
    print(f"lane={lane} warm_pass={warm:.3f}s profiled_pass={hot:.3f}s")
    print(s.getvalue())


if __name__ == "__main__":
    main()
