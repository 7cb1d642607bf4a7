"""Grid-bucketed spatial radius join — the cross-join-free neighbor pair
enumerator.

The spatial sibling of the LSH band-bucket joins in textdedup/ann: find
all point pairs within radius ``r`` WITHOUT the O(n²) cross join, by
snapping points to an r-sized grid and equi-joining each point's cell
against the 3×3 neighborhood of the other side's cells. Any pair within
``r`` differs by at most one cell index per axis, so the candidate set is
a strict superset (completeness lemma, mirror of the PPJoin prefix-filter
argument) and the exact distance predicate then prunes it — results are
exact, never sampled.

Physical shape: one map-side 9× explode of cell offsets on the left, one
hash-partitioned equi-join on the (cx, cy) cell key, one fused filter.
Grid cells are the partition key, so density skew (cities vs desert) maps
to key skew — at 100 TB pick the cell size ~r and let AQE's skew-join
split hot cells, or salt the densest cells exactly like the mmodal
blocked path. Integer coordinates keep the squared distance an exact
BIGINT (no float-order hash trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_pairs(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    radius: int = 500,
) -> DataFrame:
    """Exact (id_a < id_b, dist2 ≤ radius²) pairs via 3×3 cell blocking.

    Each pair is emitted exactly once: the left side explodes its 9
    neighbor cells, the right side keeps its single home cell, and a
    candidate (a, b) matches only at b's unique home cell.
    """
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.floor(F.col(x_col) / radius).alias("cx"),
        F.floor(F.col(y_col) / radius).alias("cy"),
    )
    offsets = F.expr(
        "explode(array(-1, 0, 1))"
    )  # applied twice below → 9 combinations
    left = (
        pts.select("*", offsets.alias("dx"))
        .select("*", F.expr("explode(array(-1, 0, 1))").alias("dy"))
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("jcx"),
            (F.col("cy") + F.col("dy")).alias("jcy"),
        )
    )
    right = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jcx"),
        F.col("cy").alias("jcy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["jcx", "jcy"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= radius * radius))
        .select("id_a", "id_b", d2.cast("long").alias("dist2"))
    )
