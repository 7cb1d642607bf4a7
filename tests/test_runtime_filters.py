"""Scan-reduction machinery the 100 TB plans lean on: static partition
pruning, dynamic partition pruning (DPP), and runtime bloom filters.

These are capability pins — a Spark upgrade or session-config regression
that silently stops pruning would not change any query's ROWS, only its
scan volume, so the row-level oracles can never catch it. The pins
assert the plan artifacts directly: ``PartitionFilters`` with a literal
(static), ``dynamicpruningexpression`` (DPP), and ``might_contain``
(bloom), plus result parity so the pruning is provably lossless.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-rtf"
    )


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    """Orders partitioned by order year + a tiny year-dimension table."""
    d = str(tmp_path_factory.mktemp("rtf"))
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    o.withColumn("o_year", F.year("o_orderdate")).write.partitionBy(
        "o_year"
    ).parquet(os.path.join(d, "orders_part"))
    spark.createDataFrame(
        [(y, "keep" if y == 1997 else "drop") for y in range(1995, 2002)],
        "yy int, flag string",
    ).write.parquet(os.path.join(d, "years"))
    return d


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_static_partition_pruning(spark, part_dir):
    """A literal filter on the partition column must land in
    PartitionFilters (directories never listed), not a post-scan
    Filter."""
    op = spark.read.parquet(os.path.join(part_dir, "orders_part"))
    q = op.filter(F.col("o_year") == 1997).agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = _executed(q)
    assert "PartitionFilters: [isnotnull(o_year" in plan
    assert "(o_year" in plan.split("PartitionFilters")[1][:120]
    direct = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.year("o_orderdate") == 1997)
        .count()
    )
    assert q.collect()[0].n == direct


def test_dynamic_partition_pruning_injected(spark, part_dir):
    """Joining the partitioned fact on its partition column against a
    selectively-filtered dimension must inject a dynamicpruning
    expression into the fact scan — at 100 TB this is the difference
    between scanning one year and scanning every year."""
    op = spark.read.parquet(os.path.join(part_dir, "orders_part"))
    dim = spark.read.parquet(os.path.join(part_dir, "years")).filter(
        F.col("flag") == "keep"
    )
    q = op.join(dim, op.o_year == dim.yy).agg(
        F.count(F.lit(1)).alias("n")
    )
    full = q._jdf.queryExecution().toString()
    assert "dynamicpruning" in full
    direct = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.year("o_orderdate") == 1997)
        .count()
    )
    assert q.collect()[0].n == direct


def test_runtime_bloom_filter_injected_and_lossless(spark):
    """With broadcast disabled (the 100 TB case: build side selective
    but not broadcastable), the optimizer must inject a bloom
    might_contain onto the fact scan side, and the filtered join must
    return exactly the rows of the unfiltered join."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    sel = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    scan_thresh = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    old_scan = spark.conf.get(scan_thresh)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # default 10GB — the sf0.01 fact side is MBs, so scale the threshold
    # down to what the test corpus is (the machinery, not the heuristic,
    # is what this pin protects)
    spark.conf.set(scan_thresh, "1KB")
    try:
        q = li.join(sel, li.l_orderkey == sel.o_orderkey).agg(
            F.count(F.lit(1)).alias("n")
        )
        optimized = q._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized
        n_bloom = q.collect()[0].n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set(scan_thresh, old_scan)
        if old_aqe is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )
    n_plain = (
        li.join(F.broadcast(sel), li.l_orderkey == sel.o_orderkey).count()
    )
    assert n_bloom == n_plain > 0
