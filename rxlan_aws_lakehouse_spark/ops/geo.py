"""Spatial grid self-join: all point pairs within a radius, distributed.

The standard scalable spatial-join design (what GeoSpark/Sedona's
partitioned join and every geohash-bucketed pipeline do): bucket points
into an eps-sized integer grid, generate candidates ONLY from each
point's 3x3 cell neighborhood (any pair within eps must share or touch
cells), then apply the exact distance predicate. Cost is
sum-over-cells(|cell| x |neighborhood|) instead of n² — at 100 TB the
cell id is the shuffle key and density bounds the work per key. A pair
is produced exactly once: the left side explodes to its nine neighbor
cells, the right side keys by its OWN cell, and the id ordering
deduplicates the symmetric match.

Geometry is planar squared distance in coordinate units — RATIONAL
arithmetic end to end (no haversine trig), so an independent engine
reproduces every comparison bit-for-bit; for real geodesics, bucket on a
local-scale grid and swap the final predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_self_join(
    points: DataFrame,
    eps: float,
    id_col: str = "id",
    x_col: str = "lon",
    y_col: str = "lat",
) -> DataFrame:
    """All pairs (i < j) with squared planar distance <= eps²; returns
    (i, j, d2). ``points`` must carry unique ids."""
    cx = F.floor(F.col(x_col) / F.lit(eps))
    cy = F.floor(F.col(y_col) / F.lit(eps))
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = pts.select(
        F.col("id").alias("i"),
        F.col("x").alias("xi"),
        F.col("y").alias("yi"),
        F.explode(offsets).alias("o"),
        F.col("cx").alias("lcx"),
        F.col("cy").alias("lcy"),
    ).select(
        "i",
        "xi",
        "yi",
        (F.col("lcx") + F.col("o.dx")).alias("cx"),
        (F.col("lcy") + F.col("o.dy")).alias("cy"),
    )
    right = pts.select(
        F.col("id").alias("j"),
        F.col("x").alias("xj"),
        F.col("y").alias("yj"),
        "cx",
        "cy",
    )
    d2 = (F.col("xi") - F.col("xj")) * (F.col("xi") - F.col("xj")) + (
        F.col("yi") - F.col("yj")
    ) * (F.col("yi") - F.col("yj"))
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j", d2.alias("d2"))
        .filter(F.col("d2") <= F.lit(eps * eps))
    )
