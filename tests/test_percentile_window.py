"""Percentile aggregate + hopping-window queries: semantics unit tests.

Hand-checkable tiny inputs; the sf0.01 DuckDB oracle parity for the same
two driver queries (events_value_percentiles, events_hopping_window) is
covered by the driver harness / tools/check_oracle.py.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-pw")


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )


def _stage(spark, tmp_path, rows):
    """Driver queries read parquet from an sf dir; stage a tiny one."""
    p = str(tmp_path / "events.parquet")
    _events(spark, rows).write.mode("overwrite").parquet(p)
    return str(tmp_path)


def test_percentiles_linear_interpolation(spark, tmp_path):
    # values 10,20,30,40 → p50 = 25 (midpoint), p90 = 10+0.9*3 steps = 37,
    # p99 = 39.7 — the quantile_cont / exact `percentile` convention:
    # rank = (n-1)*p, linear between floor/ceil order statistics.
    import __spark_entry__ as se

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, t0, 1, "click", float(v), "{}")
        for i, v in enumerate([10, 20, 30, 40])
    ]
    sf = _stage(spark, tmp_path, rows)
    [r] = se.queries()["events_value_percentiles"](spark, sf).collect()
    assert (r["n"], r["p50"], r["p90"], r["p99"]) == (4, 25.0, 37.0, 39.7)


def test_hopping_window_every_event_in_exactly_two_windows(spark, tmp_path):
    import __spark_entry__ as se

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(seconds=137 * i), 1, "click", 1.0, "{}")
        for i in range(50)
    ]
    sf = _stage(spark, tmp_path, rows)
    out = se.queries()["events_hopping_window"](spark, sf)
    # len/hop = 600/300 = 2 windows per event → total n is exactly 2×events
    assert out.agg(F.sum("n")).first()[0] == 2 * len(rows)
    # every window start is hop-aligned and covers its members:
    # 0 <= ts_epoch - win_start < 600 for every contributing event
    w = out.select("win_start").distinct().collect()
    assert all(r["win_start"] % 300 == 0 for r in w)


def test_hll_sketch_estimates_within_error_bound(spark, tmp_path):
    # lgK=12 HLL relative standard error ≈ 1.04/sqrt(2^12) ≈ 1.6%; assert
    # a loose 5% bound per day AND for the unioned whole-range estimate,
    # plus that the union estimate is no smaller than the largest day.
    import __spark_entry__ as se

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(days=i % 3, seconds=i), i % 997, "click", 1.0, "{}")
        for i in range(4000)
    ]
    sf = _stage(spark, tmp_path, rows)
    out = se.queries()["events_distinct_sketch"](spark, sf).collect()
    e = _events(spark, rows)
    exact = {
        r["day"]: r["n"]
        for r in e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_total = e.agg(F.countDistinct("user_id")).first()[0]
    for r in out:
        assert abs(r["est_users"] - exact[r["day"]]) / exact[r["day"]] < 0.05
        assert abs(r["est_total_users"] - exact_total) / exact_total < 0.05
        assert r["est_total_users"] >= max(exact.values()) * 0.95


def test_hopping_window_boundary_event_on_window_edge(spark, tmp_path):
    import __spark_entry__ as se

    t0 = dt.datetime(2024, 1, 1, 0, 10, 0)  # epoch % 600 == 0 boundary
    sf = _stage(spark, tmp_path, [(1, t0, 1, "click", 5.0, "{}")])
    rows = se.queries()["events_hopping_window"](spark, sf).collect()
    starts = sorted(r["win_start"] for r in rows)
    ep = int(dt.datetime(2024, 1, 1, 0, 10, 0, tzinfo=dt.timezone.utc).timestamp())
    # boundary event belongs to [ep, ep+600) and [ep-300, ep+300)
    assert starts == [ep - 300, ep]
    assert all(r["n"] == 1 and r["sum_value"] == 5.0 for r in rows)
