"""Top-k per group.

Global top-k is TakeOrderedAndProject (Spark plans orderBy+limit that way
automatically — per-partition heaps, driver merge). Per-group top-k is a
ranking window; one shuffle on the group key, no self-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the top ``k`` rows per group under ``order_cols`` ordering.

    ``order_cols`` must yield a total order within each group (add a unique
    tiebreak column) for deterministic results.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
