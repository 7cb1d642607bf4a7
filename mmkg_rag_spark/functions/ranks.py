"""Two-phase distributed EXACT global ranking (the scale path for
ntile / percent_rank / global row_number).

``Window.orderBy(...)`` with no partitionBy plans an Exchange
SinglePartition: the entire table sorts in ONE task — fine for a
dimension table, fatal for a fact table. This module computes the same
exact 1-based global row numbers with the two-phase pattern
(`operators/curation.assign_shards` uses the same shape for shard
offsets):

phase 1  ``repartitionByRange`` on the order columns + in-partition sort
         — the only full-data shuffle, and it is a PARALLEL range
         shuffle, not a single-task funnel;
phase 2  per-partition row counts → a |partitions|-row offset table
         (its prefix-sum window is single-partition over P rows — the
         tiny table, never the data);
narrow   in-partition enumeration (``mapInPandas``: local index =
         arange per batch + a running counter — Arrow-batched, no
         per-row Python) + a broadcast join of the offsets.

``rank = offset[pid] + local_index`` is exact because phase 1's range
partitioning guarantees every row in partition *i* precedes every row in
partition *i+1* under the order, and the in-partition sort orders the
rest. The order MUST be total (append a unique key as tiebreaker) or
ranks within a tie group are partition-placement-dependent.

The reference has no ranking at all (its lists sort in memory,
`src/mmkg_rag/index/pipe.py:98-100`); this is the engine-side primitive
that keeps exact quantile/decile jobs fact-table-shaped at 100 TB.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_numbers(
    df: DataFrame,
    order_cols: list[str],
    *,
    num_partitions: int | None = None,
    rank_col: str = "rank",
    total_col: str = "n_total",
) -> DataFrame:
    """df + exact global 1-based ``rank`` by ``order_cols`` + ``n_total``.

    ``order_cols`` must be a TOTAL order over df's rows. Column order of
    the result: df's columns, then ``rank``, then ``n_total`` (both
    BIGINT). One full-data range shuffle; everything else is narrow or
    |partitions|-sized.
    """
    import pandas as pd

    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    cols = df.columns
    ordered = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        # pin partition ids: both the count pass and the enumeration pass
        # must see the SAME placement (repartitionByRange re-samples per
        # execution otherwise)
        .localCheckpoint()
    )
    counts = ordered.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy("_pid")  # |partitions| rows — the tiny table
    offsets = counts.select(
        "_pid",
        (
            F.coalesce(
                F.sum("_n").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).cast("long").alias("_offset"),
        F.sum("_n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).cast("long").alias(total_col),
    )

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in ordered.schema.fields
        if f.name != "_pid"
    ) + ", _local long, _pid int"

    def enumerate_rows(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        # one generator per partition; batches arrive in sorted order
        import numpy as np

        seen = 0
        for pdf in batches:
            n = len(pdf)
            out = pdf.drop(columns=["_pid"])
            out["_local"] = np.arange(seen + 1, seen + n + 1, dtype="int64")
            out["_pid"] = pdf["_pid"].astype("int32")
            seen += n
            yield out

    enumerated = ordered.mapInPandas(enumerate_rows, schema=schema)
    return (
        enumerated.join(F.broadcast(offsets), "_pid")
        .select(
            *cols,
            (F.col("_offset") + F.col("_local")).alias(rank_col),
            total_col,
        )
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    *,
    num_partitions: int | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact SQL ``ntile(n)`` + ``percent_rank`` over a total order,
    two-phase (no SinglePartition data sort). Bucket/pr are derived from
    the exact global rank with the standard definitions
    (bucket = ((rank-1)·n) div N + 1 — the first N mod n buckets take the
    extra row; pr = (rank-1)/(N-1)), so the output is bit-identical to
    the window-function form on any engine."""
    ranked = global_row_numbers(
        df, order_cols, num_partitions=num_partitions
    )
    # SQL ntile: base = N div n rows per bucket, the FIRST (N mod n)
    # buckets take one extra row
    base = F.floor(F.col("n_total") / n)
    extra = F.col("n_total") % n
    cut = extra * (base + 1)  # rows covered by the oversized buckets
    r0 = F.col("rank") - 1
    return ranked.select(
        *df.columns,
        F.when(F.col("rank") <= cut, F.floor(r0 / (base + 1)) + 1)
        .otherwise(extra + F.floor((r0 - cut) / base) + 1)
        .cast("long")
        .alias(bucket_col),
        F.when(F.col("n_total") > 1,
               (F.col("rank") - 1) / (F.col("n_total") - 1))
        .otherwise(0.0)
        .alias("pct_rank"),
    )
