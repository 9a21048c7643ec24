"""Churn-proportionality probe for ``export_iceberg_sync`` (round 14).

Claim under test (SCALING.md): an incremental Iceberg mirror sync
costs O(changed files) links + O(changed manifests) Avro bytes,
INDEPENDENT of table size — a pure append to a large mirrored table
writes one fast-append manifest and carries every previous
manifest-list row by reference.

The probe commits a txn table with N data files, bootstraps the
mirror, then appends ONE small batch (1 file) and syncs; it reports
wall time and the NEW metadata bytes written by the incremental sync
at growing N.  If the claim holds, the incremental columns stay flat
while N grows 64x.

Usage: python tools/iceberg_sync_probe.py [n_files ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rxlan_aws_lakehouse_spark.iceberg_export import (  # noqa: E402
    export_iceberg_sync,
)
from rxlan_aws_lakehouse_spark.iceberg_import import (  # noqa: E402
    import_iceberg,
)
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402
from rxlan_aws_lakehouse_spark.txn import TxnTable  # noqa: E402


def _tree_files(root: str) -> dict[str, int]:
    out = {}
    for r, _d, ns in os.walk(os.path.join(root, "metadata")):
        for n in ns:
            p = os.path.join(r, n)
            out[os.path.relpath(p, root)] = os.path.getsize(p)
    return out


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [16, 128, 1024]
    spark = get_spark("iceberg_sync_probe")
    for n in counts:
        work = tempfile.mkdtemp(prefix=f"syncprobe{n}-")
        try:
            t = TxnTable(os.path.join(work, "t"))
            t.commit(
                spark.range(n * 10)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") % 7).cast("double").alias("v"),
                )
                .repartition(n)
            )
            dest = os.path.join(work, "ice")
            t0 = time.perf_counter()
            export_iceberg_sync(t, dest)
            t_boot = time.perf_counter() - t0
            before = _tree_files(dest)
            t.append(
                spark.createDataFrame(
                    [(10**9, 1.0)], "k LONG, v DOUBLE"
                ).coalesce(1)
            )
            t0 = time.perf_counter()
            out = export_iceberg_sync(t, dest)
            t_sync = time.perf_counter() - t0
            after = _tree_files(dest)
            new = {p: s for p, s in after.items() if p not in before}
            new_bytes = sum(new.values())
            assert out["operation"] == "append" and out["n_adds"] == 1
            assert import_iceberg(spark, dest).count() == n * 10 + 1
            print(
                f"n_files={n:5d}  bootstrap={t_boot:6.2f}s  "
                f"incremental-sync={t_sync * 1e3:7.1f}ms  "
                f"new-metadata-files={len(new):2d}  "
                f"new-metadata-bytes={new_bytes:7d}",
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
