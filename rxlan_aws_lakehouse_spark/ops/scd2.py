"""SCD Type-2 dimension maintenance: validity-interval history.

The reference's DynamoDB table is SCD Type-1 by construction — PutItem
overwrites the item, history is gone (/root/reference/README.md:62-65,
101-110); its warehouse load appends raw fetches instead of maintaining a
dimension at all. Type-2 — every attribute change CLOSES the current row
(``valid_to``) and OPENS a new one — is the standard warehouse answer
when history must be queryable ("what segment was this customer in when
the order shipped?").

Spark-first shape: apply a batch of timestamped updates with ONE window
pass over (current ∪ updates) per key — no per-row merge loop, no
iterative processing. The per-key ordering handles multiple updates for
the same key in one batch, and consecutive no-change updates collapse
(no spurious versions). At 100 TB the single shuffle is on the dimension
key — dimensions are the small side of a warehouse by definition, and
the op composes with ``TxnTable.merge_upsert`` for the actual commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OPEN_END = "9999-12-31 00:00:00"  # conventional open-interval sentinel


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    attr_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Fold timestamped attribute updates into an SCD2 history.

    ``current`` rows carry ``keys + attr_cols + valid_from + valid_to``
    (``valid_to`` = ``OPEN_END`` for the live version; pass an empty
    history for initial load). ``updates`` carry ``keys + attr_cols +
    ts_col``. Returns the full new history: closed rows pass through
    untouched; each key's open row and its updates re-interval via one
    ``lead`` window; an update whose attributes equal the chronologically
    previous version is DROPPED (no-change suppression). Updates at or
    before the key's open ``valid_from`` are LATE — they describe history
    already superseded — and are dropped too, which is also what makes a
    re-delivered batch idempotent.
    """
    ordered = [*keys, *attr_cols, "valid_from"]
    closed = current.filter(F.col("valid_to") != F.lit(OPEN_END).cast("timestamp"))
    live = current.filter(
        F.col("valid_to") == F.lit(OPEN_END).cast("timestamp")
    ).select(*ordered)
    open_from = live.select(*keys, F.col("valid_from").alias("_open_from"))
    fresh = (
        updates.select(*keys, *attr_cols, F.col(ts_col).alias("valid_from"))
        .join(open_from, keys, "left")
        .filter(
            F.col("_open_from").isNull()
            | (F.col("valid_from") > F.col("_open_from"))
        )
        .select(*ordered)
    )
    w = Window.partitionBy(*keys).orderBy("valid_from")
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    rebuilt = (
        live.unionByName(fresh)
        .withColumn("_prev", F.lag(attrs).over(w))
        # no-change suppression: the FIRST version per key always stays;
        # null-safe compare so NULL attribute values don't eat rows
        .filter(~F.col("_prev").eqNullSafe(attrs))
        .withColumn(
            "valid_to",
            F.coalesce(
                F.lead("valid_from").over(w),
                F.lit(OPEN_END).cast("timestamp"),
            ),
        )
        .select(*ordered, "valid_to")
    )
    return closed.select(*ordered, "valid_to").unionByName(rebuilt)
