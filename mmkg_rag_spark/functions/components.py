"""Iterative connected components over an edge DataFrame.

The order-independent closure of the reference's greedy entity grouping
(deduplicate.py:141-175) — see SURVEY.md §2 D1/§7.3. Implemented as
min-label propagation: each vertex repeatedly adopts the smallest component
id among itself and its neighbors until fixpoint. Per iteration: one shuffle
(groupBy vertex) + one join; lineage is cut with ``localCheckpoint`` so the
plan does not grow exponentially (the classic pitfall of iterative
DataFrame algorithms). Converges in O(diameter) iterations — entity-alias
graphs are near-star-shaped, so 2-4 in practice.

At 10^12-row scale the same loop holds: both sides are pre-partitioned on
the vertex id, so every iteration reuses one hash-partitioning; a
large-star/small-star variant is unnecessary until components have extreme
diameter, which name-similarity clusters do not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return DataFrame(id, component) for every vertex appearing in edges.

    ``component`` is the minimum vertex id (by the column's natural ordering)
    in the connected component. Isolated vertices don't appear — union the
    vertex universe back in with ``coalesce(component, id)`` at the call site.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )
    # comp: current component label per vertex
    comp = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("component"))
        .select(F.col("a").alias("id"), "component")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate labels flowing along edges: neighbor's current component
        prop = (
            sym.join(comp.withColumnRenamed("id", "a"), "a")
            .select(F.col("b").alias("id"), "component")
            .union(comp)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=True)
        changed = (
            prop.join(comp.withColumnRenamed("component", "old"), "id")
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        comp = prop
        if changed == 0:
            break
    return comp
