"""Statistical-aggregate and ordered-listagg query classes: semantics tests.

Pins the textbook definitions (Pearson corr, sample covariance/variance)
against numpy on a tiny hand-built table, and the listagg contract
(alphabetical order inside the group regardless of input order). The
sf0.01 DuckDB oracle parity for the same two driver queries
(lineitem_stats_corr, region_nations_listagg) is covered by the driver
harness / tools/check_oracle.py.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-sl")


def test_corr_covar_match_numpy(spark):
    qty = [1.0, 4.0, 2.0, 8.0, 5.0, 7.0]
    price = [10.0, 41.0, 19.0, 80.0, 52.0, 68.0]
    df = spark.createDataFrame(
        list(zip(qty, price)), "q double, p double"
    ).repartition(4)
    row = df.agg(
        F.corr("q", "p").alias("c"),
        F.covar_samp("q", "p").alias("cv"),
        F.var_samp("q").alias("v"),
        F.stddev_samp("p").alias("sd"),
    ).first()
    assert row["c"] == pytest.approx(np.corrcoef(qty, price)[0, 1], abs=1e-12)
    assert row["cv"] == pytest.approx(np.cov(qty, price, ddof=1)[0, 1], abs=1e-12)
    assert row["v"] == pytest.approx(np.var(qty, ddof=1), abs=1e-12)
    assert row["sd"] == pytest.approx(np.std(price, ddof=1), abs=1e-12)


def test_listagg_orders_within_group(spark):
    # input deliberately unsorted and spread across partitions: the ordered
    # listagg must sort INSIDE the group, not rely on input order
    rows = [("g", "zeta"), ("g", "alpha"), ("g", "mid"), ("h", "b"), ("h", "a")]
    df = spark.createDataFrame(rows, "k string, v string").repartition(5)
    got = {
        r["k"]: r["joined"]
        for r in df.groupBy("k")
        .agg(F.array_join(F.array_sort(F.collect_list("v")), ",").alias("joined"))
        .collect()
    }
    assert got == {"g": "alpha,mid,zeta", "h": "a,b"}


def test_driver_queries_shapes(spark):
    import __spark_entry__ as se

    sf = "/root/testdata/sf0.001"
    stats = se.queries()["lineitem_stats_corr"](spark, sf).collect()
    assert {r["l_returnflag"] for r in stats} == {"A", "N", "R"}
    for r in stats:
        assert -1.0 <= r["corr_qty_price"] <= 1.0
        assert r["sd_price"] > 0 and r["var_disc"] >= 0

    la = se.queries()["region_nations_listagg"](spark, sf).collect()
    assert len(la) == 5
    for r in la:
        names = r["nations"].split(",")
        assert names == sorted(names) and len(names) == r["n_nations"]
