"""Medallion pipeline: bronze (partitioned NDJSON landing) -> silver (typed,
validated) -> gold (partitioned analytics table).

Re-expresses the reference's Glue ETL (/root/reference/glue/
bronze_to_silver_openweather.py) Spark-first: single materialization with
``observe()`` metrics instead of the reference's three full passes, real
dt/hour partition pruning (documented-but-unimplemented there), and
idempotent hour-scoped reloads via dynamic partition overwrite.
"""

from .bronze import read_bronze, write_bronze
from .gold import load_gold, write_gold
from .schema import BRONZE_SCHEMA, CONTRACT_FIELDS, GOLD_COLUMNS
from .silver import normalize, validate

__all__ = [
    "BRONZE_SCHEMA",
    "CONTRACT_FIELDS",
    "GOLD_COLUMNS",
    "load_gold",
    "normalize",
    "read_bronze",
    "run_batch",
    "validate",
    "write_bronze",
    "write_gold",
]

from .batch import run_batch  # noqa: E402  (circular-safe: batch imports the above)
