"""Repeat the two-process commit probe N times and report retry stats.

Usage:  python tools/concurrency_probe.py [reps=20] [writers=2] [commits=8]

Each repetition spawns real OS processes committing through the full
``commit_staged`` path with zero library retries (see
tests/test_txn_multiprocess.py — this reuses its worker + verifier) and
asserts exactly-once landing plus serial-replay equality. Output: one
JSON line with per-rep retry counts, for SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_txn_multiprocess import run_probe  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    writers = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    commits = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    retry_totals = []
    for r in range(reps):
        work = tempfile.mkdtemp(prefix="cprobe_")
        try:
            out = run_probe(os.path.join(work, "t"), writers, commits)
            retry_totals.append(out["total_retries"])
            print(
                f"rep {r + 1}/{reps}: OK, retries={out['total_retries']}",
                file=sys.stderr,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    retry_totals.sort()
    print(
        json.dumps(
            {
                "reps": reps,
                "writers": writers,
                "commits_each": commits,
                "all_passed": True,
                "retries_min": retry_totals[0],
                "retries_median": retry_totals[len(retry_totals) // 2],
                "retries_max": retry_totals[-1],
                "retries_total": sum(retry_totals),
            }
        )
    )


if __name__ == "__main__":
    main()
