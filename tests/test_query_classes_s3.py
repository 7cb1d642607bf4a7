"""Session-3 query classes: connected components as a registered query,
fact-table two-phase deciles, dictionary-collapsed edit-distance join,
equi-width histogram, vector-column dimension stats.

Semantics-level invariant tests on the sf0.001 tables (identities that must
hold for ANY input) plus plan pins for the scale-critical shapes; exact
DuckDB oracle parity for the same queries is covered by the driver harness
(tools/check_oracle.py — all five verified hash-green at sf0.001/0.01/0.1).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-qcs3"
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_part_components_consistent_with_pair_affinity(spark):
    """part_components and part_pair_affinity are built from the SAME
    thresholded co-order graph (co-ordered >= 2), so: the component vertex
    universe equals the affinity pairs' vertex set, components partition
    it, and both endpoints of every affinity edge share a component."""
    comps = entry.q_part_components(spark, SF_DIR).collect()
    pairs = entry.q_part_pair_affinity(spark, SF_DIR).collect()
    assert comps and pairs

    n_vertices = sum(r.n_nodes for r in comps)
    vert_universe = {p.part_a for p in pairs} | {p.part_b for p in pairs}
    assert n_vertices == len(vert_universe)

    # labels are min member ids: label <= max_node, labels distinct
    labels = [r.component for r in comps]
    assert len(set(labels)) == len(labels)
    for r in comps:
        assert r.component <= r.max_node
        # sum of n_nodes distinct bigints in [component, max_node]
        assert r.sum_nodes >= r.component + (r.n_nodes - 1)

    # every edge is intra-component: rebuild membership from a local
    # union-find over the affinity edges and compare label sets exactly
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p.part_a), find(p.part_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    local = {}
    for v in vert_universe:
        local.setdefault(find(v), set()).add(v)
    spark_comps = {r.component: r.n_nodes for r in comps}
    assert {min(m) for m in local.values()} == set(spark_comps)
    assert {min(m): len(m) for m in local.values()} == spark_comps


def test_lineitem_price_deciles_partition_of_table(spark):
    rows = sorted(
        entry.q_lineitem_price_deciles(spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    n_total = entry._t(spark, SF_DIR, "lineitem").count()
    assert sum(r.n for r in rows) == n_total
    # SQL ntile: bucket sizes differ by at most 1, larger buckets first
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)
    # deciles tile the price axis in order; pct_rank tops out at exactly 1
    for a, b in zip(rows, rows[1:]):
        assert a.price_max <= b.price_min
        assert a.pr_max < b.pr_max
    assert rows[-1].pr_max == 1.0


def test_part_name_matches_blocked_and_exact(spark):
    rows = entry.q_part_name_matches(spark, SF_DIR).collect()
    assert rows

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    for r in rows:
        assert r.name_a < r.name_b  # distinct-collapse: no self/dup pairs
        assert 1 <= r.dist <= entry.EDITDIST_MAX
        assert r.name_a.split(" ")[-1] == r.name_b.split(" ")[-1]  # block key
        assert lev(r.name_a, r.name_b) == r.dist
        assert r.n_a >= 1 and r.n_b >= 1


def test_part_name_matches_no_cartesian(spark):
    plan = _plan(entry.q_part_name_matches(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_orders_price_histogram_covers_table(spark):
    rows = entry.q_orders_price_histogram(spark, SF_DIR).collect()
    o = entry._t(spark, SF_DIR, "orders")
    assert sum(r.n_orders for r in rows) == o.count()
    w, top = entry.HIST_BUCKET_WIDTH, entry.HIST_MAX_BUCKET
    for r in rows:
        assert 0 <= r.bucket <= top
        assert r.price_min >= r.bucket * w
        if r.bucket < top:  # top bucket clamps the tail
            assert r.price_max < (r.bucket + 1) * w
        assert r.price_min <= r.price_max
        # sum of n values inside [min, max]
        assert r.n_orders * r.price_min <= r.sum_price + 0.01
        assert r.sum_price <= r.n_orders * r.price_max + 0.01


def test_orders_price_histogram_single_shuffle(spark):
    plan = _plan(entry.q_orders_price_histogram(spark, SF_DIR))
    assert plan.count("Exchange") <= 2  # agg hashpartitioning (+AQE read)
    assert "Exchange SinglePartition" not in plan


def test_embedding_dim_stats_shape_and_bounds(spark):
    rows = entry.q_embedding_dim_stats(spark, SF_DIR).collect()
    e = entry._t(spark, SF_DIR, "embeddings")
    n_vecs = e.count()
    assert sorted(r.dim for r in rows) == list(range(1, 65))
    for r in rows:
        assert r.n == n_vecs
        assert r.min_q <= r.max_q
        assert r.min_q * r.n <= r.sum_q <= r.max_q * r.n
        assert abs(r.mean - r.sum_q / r.n / 1e6) < 1e-6


def test_embedding_dim_stats_narrow_explode(spark):
    """The explode must stay narrow: one exchange total (the 64-key agg)."""
    plan = _plan(entry.q_embedding_dim_stats(spark, SF_DIR))
    assert "Generate explode" in plan or "Generate posexplode" in plan
    assert plan.count("Exchange") <= 2  # agg hashpartitioning (+AQE read)
