"""Distributed 2-D Pareto frontier (skyline) — exact, no self-join.

The skyline query — rows not dominated on two minimize-both criteria
(price vs delay, cost vs error, size vs latency) — is classically written
as a quadratic NOT EXISTS self-join. In 2-D it collapses to a staircase
scan: group to per-x minima, order by x, and keep the rows whose y is
strictly below every smaller-x minimum. That running minimum is the only
sequential dependency, and it distributes the same way
`functions/ranks.py` distributes exact ranks:

phase 1  per-x minima (one hash shuffle, distinct-x sized output);
phase 2  ``repartitionByRange`` on x + in-partition sort — a PARALLEL
         range shuffle, never an Exchange SinglePartition;
phase 3  per-partition minima → a |partitions|-row boundary-prefix table
         (its window is single-partition over P rows — the tiny table);
narrow   the within-partition running minimum is a window PARTITIONED BY
         the range-partition id (parallel), combined with the broadcast
         boundary prefix; a final semi-join pulls every original row
         sitting on the frontier (duplicate frontier points are all kept
         — strict dominance requires one strictly-smaller coordinate, so
         equal points never eliminate each other).

Exactness: every row in range partition *i* has x below every row in
partition *i+1*, so ``least(boundary_prefix, running_min_within)`` IS the
global minimum over strictly-smaller x (ties on x are handled by the
per-x grouping). All comparisons are on caller-provided integer/decimal
columns — nothing here introduces a float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the minimize-(x, y) Pareto frontier.

    A row is dominated iff another row has x' ≤ x AND y' ≤ y with at
    least one strict; all non-dominated rows are returned (including
    exact-duplicate frontier points). Output columns = df's columns.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    xmin = df.groupBy(F.col(x).alias("_x")).agg(F.min(y).alias("_ymin"))
    ordered = (
        xmin.repartitionByRange(num_partitions, "_x")
        .sortWithinPartitions("_x")
        .withColumn("_pid", F.spark_partition_id())
        # pin placement: the boundary pass and the keep pass must agree
        .localCheckpoint()
    )
    bw = Window.orderBy("_pid")  # |partitions| rows — the tiny table
    boundary = ordered.groupBy("_pid").agg(F.min("_ymin").alias("_pm")).select(
        "_pid",
        F.min("_pm")
        .over(bw.rowsBetween(Window.unboundedPreceding, -1))
        .alias("_before"),
    )
    ww = (
        Window.partitionBy("_pid")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_x = (
        ordered.join(F.broadcast(boundary), "_pid")
        .withColumn(
            "_lo", F.least(F.min("_ymin").over(ww), F.col("_before"))
        )
        # least() skips NULLs: first row of first partition keeps _lo NULL
        .filter(F.col("_lo").isNull() | (F.col("_ymin") < F.col("_lo")))
        .select("_x", "_ymin")
    )
    return df.join(
        frontier_x,
        (F.col(x) == F.col("_x")) & (F.col(y) == F.col("_ymin")),
        "semi",
    )
