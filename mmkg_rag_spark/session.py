"""SparkSession factory with engine-wide tuning.

Single place all entry points (tests, bench, __spark_entry__, spark-submit
driver) get their session so Arrow, AQE and shuffle sizing are consistent.
Iceberg extensions are attached when the runtime jar is on the classpath
(real clusters); the sandbox falls back to the parquet catalog
(sources/catalog.py) with identical snapshot semantics.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession


def iceberg_available() -> bool:
    try:
        import pyspark

        jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return bool(glob.glob(os.path.join(jar_dir, "*iceberg-spark-runtime*")))
    except Exception:
        return False


def get_spark(
    master: str | None = None,
    app_name: str = "mmkg-rag-spark",
    shuffle_partitions: int | None = None,
    warehouse: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned session.

    Defaults: ``local[$SPARK_GRAFT_CPUS or *]``; shuffle partitions sized to
    2× cores locally (on a real cluster leave the default 200+AQE coalesce).
    """
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[6:-1]
            cores = os.cpu_count() if inner == "*" else int(inner)
            shuffle_partitions = max(8, 2 * cores)
        else:
            shuffle_partitions = 200

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Arrow: every pandas UDF crosses the JVM↔Python boundary in batches
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # AQE: runtime coalesce + skew-join splitting on top of our salting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce INSIDE .cache() materialization too — otherwise
        # every cached reduce output keeps the raw shuffle.partitions count
        # and downstream map stages inherit hundreds of near-empty tasks
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # generous broadcast ceiling: alias dictionaries & dim tables
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom filters (off by default in Spark): when a join's
        # build side is selective but too big to broadcast, inject a bloom
        # might_contain onto the probe-side scan — at 100 TB this turns a
        # full fact-table shuffle into a shuffle of the ~matching rows.
        # Injection + correctness pinned by tests/test_runtime_filters.py.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if warehouse:
        b = b.config("spark.sql.warehouse.dir", warehouse)
    for k, v in (extra_conf or {}).items():
        # caller overrides (e.g. tools/bench_skew.py re-enables the UI to
        # read per-task summaries from the REST API)
        b = b.config(k, v)
    if iceberg_available():
        b = (
            b.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.kg", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.kg.type", "hadoop")
            .config(
                "spark.sql.catalog.kg.warehouse",
                warehouse or os.path.join(os.getcwd(), "warehouse"),
            )
        )
    return b.getOrCreate()
