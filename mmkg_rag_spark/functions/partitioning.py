"""Input-parallelism guard for CPU-heavy map stages.

Small single-file parquet inputs (one row group) arrive as ONE input
partition — ``spark.sql.files.maxPartitionBytes`` cannot split below
row-group granularity — so heavy per-row expressions (MinHash signatures,
shingle explodes, sign-LSH keys) would run on a single core no matter how
many executors exist. ``ensure_min_partitions`` repartitions only when the
scan yields fewer partitions than the session's parallelism; on a real
100 TB table the file layout already provides thousands of splits and this
is a metadata check + no-op (no shuffle added).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
