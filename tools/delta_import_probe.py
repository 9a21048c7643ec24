"""Scale probe for the foreign-Delta import/convert paths (round 12).

Claim under test (SCALING.md): planning is O(log metadata) — replay +
file skipping never list directories or open data files — and
``convert_from_delta`` is O(files) link/metadata work with zero data
IO. The probe authors synthetic foreign logs of growing FILE COUNT
(tiny one-row files, so any data IO would be visible as a flat floor,
not a scaling term) and times:

  * ``replay_delta_log``            (log replay alone)
  * ``import_delta`` plan build     (DataFrame construction, no action)
  * pruned partition planning       (DeltaImportReader with a pushed
                                     partition predicate — file skipping)
  * ``convert_from_delta``          (zero-copy adoption)
  * converted-table pruned_files    (manifest skipping off adopted stats)

Usage: python tools/delta_import_probe.py [counts ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rxlan_aws_lakehouse_spark.delta_export import (  # noqa: E402
    convert_from_delta,
    import_delta,
    replay_delta_log,
)
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402
from rxlan_aws_lakehouse_spark.sources.delta_import_source import (  # noqa: E402
    DeltaImportReader,
)

SCHEMA = {
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "g", "type": "string", "nullable": True, "metadata": {}},
    ],
}


def author(root: str, n_files: int) -> None:
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    os.makedirs(os.path.join(root, "data"))
    # ONE shared tiny data file hard-linked n times: authoring cost
    # stays flat so the probe times METADATA work, not file creation
    seed = os.path.join(root, "data", "f000000.parquet")
    pq.write_table(pa.table({"k": pa.array([1], pa.int64())}), seed)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "probe",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(SCHEMA),
                "partitionColumns": ["g"],
                "configuration": {},
                "createdTime": 0,
            }
        },
    ]
    for i in range(n_files):
        name = f"f{i:06d}.parquet"
        p = os.path.join(root, "data", name)
        if i:
            os.link(seed, p)
        actions.append(
            {
                "add": {
                    "path": f"data/{name}",
                    "partitionValues": {"g": str(i % 64)},
                    "size": os.path.getsize(seed),
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": json.dumps(
                        {
                            "numRecords": 1,
                            "minValues": {"k": i},
                            "maxValues": {"k": i},
                            "nullCount": {"k": 0},
                        }
                    ),
                }
            }
        )
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [64, 512, 4096]
    spark = get_spark("delta-import-probe")
    for n in counts:
        work = tempfile.mkdtemp(prefix="dimp_probe_")
        try:
            root = os.path.join(work, "t")
            author(root, n)
            t0 = time.perf_counter()
            state = replay_delta_log(root)
            t_replay = time.perf_counter() - t0
            assert len(state["files"]) == n
            t0 = time.perf_counter()
            import_delta(spark, root)  # plan build only, no action
            t_plan = time.perf_counter() - t0
            r = DeltaImportReader({"path": root}, None)
            r._triples = [("g", "=", "7")]
            t0 = time.perf_counter()
            kept = r.partitions()
            t_prune = time.perf_counter() - t0
            t0 = time.perf_counter()
            conv = convert_from_delta(spark, root, os.path.join(work, "c"))
            t_conv = time.perf_counter() - t0
            t0 = time.perf_counter()
            pk, total = conv.pruned_files([("k", ">=", n - 8)])
            t_manifest = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "n_files": n,
                        "replay_s": round(t_replay, 4),
                        "import_plan_s": round(t_plan, 4),
                        "source_prune_s": round(t_prune, 4),
                        "source_kept": len(kept),
                        "convert_s": round(t_conv, 4),
                        "manifest_prune_s": round(t_manifest, 4),
                        "manifest_kept": len(pk),
                        "manifest_total": total,
                    }
                )
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
