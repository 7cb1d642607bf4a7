"""Round-4 late query classes: growth accounting, gap fill, pair affinity.

Semantics-level invariant tests on the sf0.001 tables (hand-checkable
identities that must hold for ANY input); exact DuckDB oracle parity for
the same queries is covered by the driver harness (tools/check_oracle.py —
events_growth_accounting, events_gap_fill, part_pair_affinity,
sssp_suppliers; the sssp OPERATOR has its own reference-parity tests in
tests/test_graph.py).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-qcr4"
    )


def test_growth_accounting_flow_conservation(spark):
    """active(w) = new + retained + resurrected, and last week's actives
    split exactly into retained(w+1) + churned(w+1)."""
    rows = {
        r.week: r
        for r in entry.q_events_growth_accounting(spark, SF_DIR).collect()
    }
    assert rows, "no weeks"
    weeks = sorted(rows)
    active = {
        w: rows[w].n_new + rows[w].n_retained + rows[w].n_resurrected
        for w in weeks
    }
    # week 0 of the corpus: everyone is new, nobody churned yet
    assert rows[weeks[0]].n_new == active[weeks[0]]
    assert rows[weeks[0]].n_retained == 0
    assert rows[weeks[0]].n_resurrected == 0
    assert rows[weeks[0]].n_churned == 0
    for prev_w, w in zip(weeks, weeks[1:]):
        if w == prev_w + 1:  # consecutive weeks: exact flow split
            assert active[prev_w] == rows[w].n_retained + rows[w].n_churned, w


def test_gap_fill_dense_spine_and_zero_rows(spark):
    from collections import defaultdict

    rows = entry.q_events_gap_fill(spark, SF_DIR).collect()
    by_type = defaultdict(dict)
    for r in rows:
        by_type[r.event_type][r.day] = r.n_events
    assert by_type
    for t, days in by_type.items():
        lo, hi = min(days), max(days)
        # dense: every day in [lo, hi] present exactly once
        assert sorted(days) == list(range(lo, hi + 1)), t
        # span endpoints are real activity, zeros only interior
        assert days[lo] > 0 and days[hi] > 0, t


def test_part_pair_affinity_counts_consistent(spark):
    rows = entry.q_part_pair_affinity(spark, SF_DIR).collect()
    assert rows
    for r in rows[:200]:
        assert r.part_a < r.part_b
        # co-occurrence can't exceed either part's own basket count
        assert 2 <= r.n_both <= min(r.n_a, r.n_b)
