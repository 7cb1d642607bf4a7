"""Per-stage lineage + metrics rows (north-rule ops requirement).

Every materialized stage appends one row per output *data file* (file ↔
write-task partition) to the catalog's ``_metrics`` table:

    (stage, snapshot, input_snapshot, file, rows, wall_ms, ts)

File-level row counts come from ``input_file_name()`` grouping over the
just-written snapshot — a metadata-cheap scan (count-only aggregate over
parquet footers after AQE prunes columns). This is the explicit accounting
the north star asks for beyond what the Spark UI provides, and it lives next
to the data so a resumed run appends to the same history.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.catalog import ParquetCatalog

METRICS_SCHEMA = (
    "stage string, snapshot string, input_snapshot string, file string, "
    "rows long, wall_ms long, ts double"
)


def record_stage(
    catalog: ParquetCatalog,
    stage: str,
    snapshot: str,
    input_snapshot: str,
    data_path: str,
    wall_ms: int,
) -> DataFrame:
    """Append per-partition lineage rows for a just-written snapshot."""
    spark = catalog.spark
    per_file = (
        spark.read.parquet(data_path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(
            F.lit(stage).alias("stage"),
            F.lit(snapshot).alias("snapshot"),
            F.lit(input_snapshot).alias("input_snapshot"),
            "file",
            "rows",
            F.lit(int(wall_ms)).alias("wall_ms"),
            F.lit(time.time()).alias("ts"),
        )
    )
    import os

    out = os.path.join(catalog.warehouse, "_metrics", f"{stage}-{snapshot}")
    per_file.write.mode("overwrite").parquet(out)
    return per_file


def read_metrics(spark: SparkSession, warehouse: str) -> DataFrame:
    import os

    return spark.read.option("basePath", os.path.join(warehouse, "_metrics")).parquet(
        os.path.join(warehouse, "_metrics", "*")
    )
