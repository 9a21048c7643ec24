"""Measure export_delta / export_delta_sync scale shape.

Claim under test (delta_export.py): a no-DV export is O(files)
metadata + hard links (no data IO), a DV export pays IO only for the
vector-touched files, and an incremental sync pays only the churn.
Probe: build the same table shape at two sizes (10x rows, same file
count, then 10x file count), time each operation, and report walls +
per-file costs. Run on an idle machine.

Usage: python tools/delta_export_probe.py [rows_base=200000]
Prints one JSON line for SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from rxlan_aws_lakehouse_spark.delta_export import (  # noqa: E402
    export_delta,
    export_delta_sync,
)
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402
from rxlan_aws_lakehouse_spark.txn import TxnTable  # noqa: E402


def probe(spark, rows: int, n_files: int) -> dict:
    work = tempfile.mkdtemp(prefix="dxp_")
    try:
        t = TxnTable(os.path.join(work, "t"))
        t.commit(
            spark.range(rows)
            .select(
                F.col("id"),
                (F.col("id") % 97).alias("g"),
                (F.col("id") * 1.5).alias("x"),
            )
            .repartition(n_files)
        )
        dest_plain = os.path.join(work, "plain")
        t0 = time.perf_counter()
        export_delta(t, dest_plain)
        t_plain = time.perf_counter() - t0

        # scattered 1% deferred delete -> every file touched? no: hit
        # only ~10% of files via an id-range stripe per file boundary
        t.delete_where_deferred(
            spark, (F.col("id") % 1000) == 7
        )  # ~0.1% of rows, scattered across all files
        dest_dv = os.path.join(work, "dv")
        t0 = time.perf_counter()
        s_dv = export_delta(t, dest_dv)
        t_dv = time.perf_counter() - t0

        # incremental: materialize, append 1% more rows, sync
        t.materialize_deletes(spark)
        dest_sync = os.path.join(work, "sync")
        export_delta(t, dest_sync)
        t.append(
            spark.range(rows, int(rows * 1.01))
            .select(
                F.col("id"),
                (F.col("id") % 97).alias("g"),
                (F.col("id") * 1.5).alias("x"),
            )
            .repartition(2)
        )
        t0 = time.perf_counter()
        s_sync = export_delta_sync(t, dest_sync)
        t_sync = time.perf_counter() - t0
        return {
            "rows": rows,
            "n_files": n_files,
            "export_plain_s": round(t_plain, 3),
            "export_dv_s": round(t_dv, 3),
            "dv_rewritten_files": len(s_dv["rewritten"]),
            "sync_s": round(t_sync, 3),
            "sync_adds": s_sync["n_adds"],
            "sync_removes": s_sync["n_removes"],
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("delta-export-probe")
    out = {
        "base": probe(spark, rows, 32),
        "rows10x": probe(spark, rows * 10, 32),
        "files10x": probe(spark, rows, 320),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
