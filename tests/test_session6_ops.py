"""Session-6 query classes: TPC-H Q13-shaped outer-join count
distribution and Q22-shaped global-scalar + anti-join prospects.

Semantics-level invariants on synthetic micro-inputs (exact,
hand-checkable); exact DuckDB oracle parity for the mapped query classes
(cust_order_distribution, cust_prospects) is covered by
tools/check_oracle.py at three SFs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-s6ops"
    )


# ------------------------------------------- cust_order_distribution


def test_cust_order_distribution_zero_bucket(spark):
    """Customers with no (qualifying) orders must land in the k=0 bucket —
    the outer join is the load-bearing part of the Q13 shape."""
    import __spark_entry__ as se

    out = {
        r.c_count: r.custdist
        for r in se.q_cust_order_distribution(spark, SF_DIR).collect()
    }
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    # every customer appears in exactly one bucket
    assert sum(out.values()) == n_cust
    # the total order count re-aggregates to the non-urgent order count
    n_orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .count()
    )
    assert sum(k * v for k, v in out.items()) == n_orders


def test_cust_order_distribution_micro(spark):
    """3 customers, one with zero qualifying orders: exact distribution."""
    import __spark_entry__ as se
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1,), (2,), (3,)], ["c_custkey"]
        ).write.parquet(os.path.join(d, "customer.parquet"))
        spark.createDataFrame(
            [
                (10, 1, "5-LOW"),
                (11, 1, "5-LOW"),
                (12, 2, "5-LOW"),
                (13, 3, "1-URGENT"),  # filtered: c3 has ZERO qualifying
            ],
            ["o_orderkey", "o_custkey", "o_orderpriority"],
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {
            r.c_count: r.custdist
            for r in se.q_cust_order_distribution(spark, d).collect()
        }
    assert out == {2: 1, 1: 1, 0: 1}


# ------------------------------------------------- cust_prospects


def test_cust_prospects_threshold_and_anti_join(spark):
    """Every reported group member is above the positive-balance pool
    average and none has an urgent order; re-derive via plain pyspark."""
    import __spark_entry__ as se

    out = se.q_cust_prospects(spark, SF_DIR)
    rows = out.collect()
    assert set(out.columns) == {"cc", "numcust", "totacctbal"}

    c = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .withColumn("cc", F.substring("c_name", 17, 2))
        .filter(F.col("cc").isin(*se._PROSPECT_CCS))
    )
    pool = [r.c_acctbal for r in c.filter("c_acctbal > 0").collect()]
    avg = sum(pool) / len(pool)
    urgent = {
        r.o_custkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'")
        .select("o_custkey")
        .collect()
    }
    expect = {}
    for r in c.collect():
        if r.c_acctbal > avg and r.c_custkey not in urgent:
            n, t = expect.get(r.cc, (0, 0.0))
            expect[r.cc] = (n + 1, t + r.c_acctbal)
    got = {r.cc: (r.numcust, round(r.totacctbal, 2)) for r in rows}
    assert got == {
        cc: (n, round(t, 2)) for cc, (n, t) in expect.items()
    }


def test_cust_prospects_nonvacuous(spark):
    """The anti-join must not be vacuously empty at the test SF."""
    import __spark_entry__ as se

    assert se.q_cust_prospects(spark, SF_DIR).count() >= 1
