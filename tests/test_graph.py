"""PageRank: exact fixed-point parity with a Python integer reference."""

from __future__ import annotations

import pytest

from mmkg_rag_spark.operators.graph import SCALE, pagerank


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-graph")


def ref_pagerank(edges, iterations=5, num=17, den=20, scale=SCALE,
                 undirected=False):
    """The operator's recurrence in plain Python integers."""
    es = set(edges)
    if undirected:
        es |= {(b, a) for a, b in edges}
    nodes = {n for e in es for n in e}
    outdeg = {n: 0 for n in nodes}
    for a, _ in es:
        outdeg[a] += 1
    base = (scale * (den - num)) // den
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for a, b in es:
            inc[b] += rank[a] // outdeg[a]
        rank = {n: base + (inc[n] // den) * num for n in nodes}
    return rank


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("e", "c"), ("c", "e"), ("b", "d"),
]


def test_pagerank_matches_integer_reference_directed(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank_scaled for r in pagerank(df, iterations=5).collect()}
    assert got == ref_pagerank(EDGES, iterations=5)


def test_pagerank_undirected_no_dangling_and_hub_wins(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    out = pagerank(df, undirected=True, iterations=5).collect()
    got = {r.node: r.rank_scaled for r in out}
    assert got == ref_pagerank(EDGES, iterations=5, undirected=True)
    # c touches every other node — it must rank first
    assert max(got, key=got.get) == "c"
    # the double projection mirrors the fixed-point exactly
    assert all(r.rank == r.rank_scaled / SCALE for r in out)


def test_pagerank_multi_edges_collapse(spark):
    dup = EDGES + EDGES[:3]
    df = spark.createDataFrame(dup, "src string, dst string")
    got = {r.node: r.rank_scaled for r in pagerank(df, iterations=3).collect()}
    assert got == ref_pagerank(EDGES, iterations=3)


def test_pagerank_partitioning_invariance(spark):
    """Integer fixed-point ⇒ bit-identical under any partitioning."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {r.node: r.rank_scaled for r in pagerank(df.coalesce(1)).collect()}
    b = {r.node: r.rank_scaled for r in pagerank(df.repartition(7)).collect()}
    assert a == b
