"""Foreign row-level DELETE scale probe (round 15).

Measures what a DELETE actually costs on both open formats as the
matched-row count sweeps 100x, at fixed file count — the write-
amplification story SCALING.md claims, with numbers:

* Delta ``delete_delta`` mode='dv': DV file bytes (roaring-compressed
  ordinals), commit JSON bytes (O(touched files)), wall.
* Delta mode='cow': rewritten data bytes (O(touched files' size)),
  wall — the comparison that shows why DV mode is the 100 TB path.
* Iceberg ``delete_iceberg`` mode='pos': position-delete parquet bytes
  + manifest bytes, wall.

Usage:  python tools/delete_probe.py [n_files] [rows_per_file]
Writes one JSON line per (format, mode, match_pct) to stdout.
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


def dir_bytes(path: str, suffix: str | None = None) -> int:
    total = 0
    for r, _d, ns in os.walk(path):
        for n in ns:
            if suffix is None or n.endswith(suffix):
                total += os.path.getsize(os.path.join(r, n))
    return total


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000
    from pyspark.sql import functions as F

    from rxlan_aws_lakehouse_spark.delta_export import (
        delete_delta,
        export_delta,
        import_delta,
        replay_delta_log,
    )
    from rxlan_aws_lakehouse_spark.iceberg_export import (
        delete_iceberg,
        export_iceberg,
    )
    from rxlan_aws_lakehouse_spark.iceberg_import import import_iceberg
    from rxlan_aws_lakehouse_spark.session import get_spark
    from rxlan_aws_lakehouse_spark.txn import TxnTable

    spark = get_spark("delete_probe")
    n_rows = n_files * rows_per_file
    work = tempfile.mkdtemp(prefix="delete_probe_")
    results = []
    try:
        df = spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).alias("g"),
            (F.col("id") * 1.5).alias("v"),
        ).repartition(n_files)
        t = TxnTable(f"{work}/src")
        t.commit(df)

        for pct in (0.1, 1.0, 10.0):
            n_match = int(n_rows * pct / 100)
            pred = f"k < {n_match}"  # spread across all files (round-robin)
            for fmt, mode in (
                ("delta", "dv"),
                ("delta", "cow"),
                ("iceberg", "pos"),
                ("iceberg", "dv"),
            ):
                dest = f"{work}/{fmt}_{mode}_{pct}"
                if fmt == "delta":
                    export_delta(t, dest)
                    before_data = dir_bytes(dest, ".parquet")
                    t0 = time.perf_counter()
                    out = delete_delta(spark, dest, pred, mode=mode)
                    wall = time.perf_counter() - t0
                    state = replay_delta_log(dest)
                    commit_bytes = os.path.getsize(
                        os.path.join(
                            dest,
                            "_delta_log",
                            f"{out['version']:020d}.json",
                        )
                    )
                    dv_bytes = dir_bytes(dest, ".bin")
                    new_data = dir_bytes(dest, ".parquet") - before_data
                    n_live = import_delta(spark, dest).count()
                else:
                    export_iceberg(t, dest)
                    if mode == "dv":
                        # bump to format-version 3 (otherwise
                        # v3-compatible for reading) so the delete
                        # takes the deletion-vector path
                        mfile = os.path.join(
                            dest, "metadata", "v1.metadata.json"
                        )
                        with open(mfile) as fh:
                            meta = json.load(fh)
                        meta["format-version"] = 3
                        with open(mfile, "w") as fh:
                            json.dump(meta, fh)
                    before_data = dir_bytes(
                        os.path.join(dest, "data"), ".parquet"
                    )
                    t0 = time.perf_counter()
                    out = delete_iceberg(spark, dest, pred, mode=mode)
                    wall = time.perf_counter() - t0
                    commit_bytes = dir_bytes(
                        os.path.join(dest, "metadata")
                    )
                    dv_bytes = dir_bytes(
                        os.path.join(dest, "data"), ".puffin"
                    )
                    new_data = (
                        dir_bytes(os.path.join(dest, "data"), ".parquet")
                        - before_data
                    )  # the position-delete file itself
                    n_live = import_iceberg(spark, dest).count()
                assert n_live == n_rows - n_match, (n_live, n_match)
                rec = {
                    "format": fmt,
                    "mode": out["mode"],
                    "n_files": n_files,
                    "n_rows": n_rows,
                    "match_pct": pct,
                    "n_matched": out["n_matched"],
                    "n_files_touched": out.get("n_files_touched"),
                    "wall_sec": round(wall, 2),
                    "commit_bytes": commit_bytes,
                    "dv_or_delete_file_bytes": dv_bytes or new_data,
                    "rewritten_data_bytes": new_data
                    if (fmt, mode) == ("delta", "cow")
                    else 0,
                }
                results.append(rec)
                print(json.dumps(rec))
                shutil.rmtree(dest, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
