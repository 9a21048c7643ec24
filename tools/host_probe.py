"""Fast host-cleanliness probe: bench.py's calibration basket, alone.

Usage: python tools/host_probe.py

Runs the exact three calibration lanes the bench self-annotates with
(CPU xxhash reduce, pinned-parquet IO scan, tiny-plan floor) against
their idle anchors and prints the ratios + the would-be host_flagged
verdict, in ~40 s instead of a full 10+ min suite. Used in r17 to time
full-suite runs into clean host windows (this sandbox shows episodic
1.3-3x hypervisor load with no guest-side load-average signal).
Evidence tool; not part of the bench contract.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("host-probe")
    # brief JIT warm so the CPU lane reads its hot value (same reason
    # bench.py warms before calib_first)
    bench.run_calibration(spark)
    cpu = bench.run_calibration(spark)
    io = bench.run_calibration_io(spark)
    floor = bench.run_calibration_floor(spark)
    ratios = {
        "cpu": round(cpu / bench.CALIB_REF, 4),
        "io": round(io / bench.IO_CALIB_REF, 4),
        "floor": round(floor / bench.FLOOR_CALIB_REF, 4),
    }
    med = sorted(ratios.values())[1]
    flagged = med > 1.10 or max(ratios.values()) > 1.25
    print(
        json.dumps(
            {
                "ratios": ratios,
                "median": med,
                "host_flagged": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()
