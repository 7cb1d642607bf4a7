"""Session-13 operators: SCC (trim+color+match), HITS, closed-form OLS.

Each operator is pinned against a plain-Python reference on synthetic
inputs (including the shapes that break naive implementations: singleton
chains for SCC trimming, one-sided bipartite nodes for HITS, degenerate
all-same-x groups for OLS) plus a partitioning-invariance check — the
repo-wide determinism contract that lets DuckDB oracles hash-match.
"""

from __future__ import annotations

import random

import pytest

from mmkg_rag_spark.functions.regression import group_ols
from mmkg_rag_spark.operators.graph import (
    hits,
    strongly_connected_components,
)


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-s13ops"
    )


def tarjan_scc(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan; returns node -> min-node-in-SCC."""
    adj: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        nodes.update((a, b))
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    def strongconnect(root: int) -> None:
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return out


def _scc_spark(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = strongly_connected_components(df, **kw).collect()
    return {r.node: r.scc_id for r in got}


def test_scc_crafted_shapes(spark):
    # two 3-cycles bridged by a DAG edge, plus a singleton chain (the
    # coloring worst case that TRIM must absorb) and a self-loop node
    edges = [
        (1, 2), (2, 3), (3, 1),          # SCC {1,2,3}
        (3, 10),                          # bridge
        (10, 11), (11, 12), (12, 10),     # SCC {10,11,12}
        (20, 21), (21, 22), (22, 23),     # chain of singletons
        (30, 30),                         # self-loop singleton SCC
        (12, 20),
    ]
    assert _scc_spark(spark, edges) == tarjan_scc(edges)


@pytest.mark.parametrize("seed,n,m", [(0, 30, 60), (1, 40, 55), (2, 25, 90)])
def test_scc_random_digraphs_match_tarjan(spark, seed, n, m):
    rng = random.Random(seed)
    edges = list(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    )
    edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
    assert _scc_spark(spark, edges) == tarjan_scc(edges)


def test_scc_partitioning_invariance(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(80)]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df17 = spark.createDataFrame(edges, "src long, dst long").repartition(17)
    a = {
        r.node: r.scc_id
        for r in strongly_connected_components(df1).collect()
    }
    b = {
        r.node: r.scc_id
        for r in strongly_connected_components(df17).collect()
    }
    assert a == b == tarjan_scc(list(set(edges)))


def test_scc_max_rounds_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        strongly_connected_components(df, max_rounds=0)


def hits_ref(edges: list[tuple[str, str]], k: int) -> dict[str, tuple[int, int]]:
    """Plain-dict unnormalized HITS; returns node -> (hub, authority)."""
    es = sorted(set(edges))
    nodes = {n for e in es for n in e}
    hub = {n: 1 for n in nodes}
    auth: dict[str, int] = {}
    for _ in range(k):
        auth = {n: 0 for n in nodes}
        for a, b in es:
            auth[b] += hub[a]
        hub = {n: 0 for n in nodes}
        for a, b in es:
            hub[a] += auth[b]
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_reference_and_zero_sides(spark):
    rng = random.Random(3)
    # bipartite-ish with some pure hubs (no in-edges) and pure authorities
    edges = [
        (f"u{rng.randrange(12)}", f"v{rng.randrange(8)}") for _ in range(60)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: (int(r.hub), int(r.authority))
        for r in hits(df, iterations=3).collect()
    }
    assert got == hits_ref(edges, 3)
    # pure authorities (dst-only nodes) must carry hub = 0, not be dropped
    assert any(h == 0 and a > 0 for h, a in got.values())


def test_hits_partitioning_invariance(spark):
    edges = [(f"a{i % 7}", f"b{(i * 3) % 5}") for i in range(40)]
    one = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    many = spark.createDataFrame(edges, "src string, dst string").repartition(13)
    ra = sorted(map(tuple, hits(one, iterations=4).collect()))
    rb = sorted(map(tuple, hits(many, iterations=4).collect()))
    assert ra == rb


def ols_ref(pts: list[tuple[int, int]]) -> tuple[int, int, int]:
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    return (n * sxy - sx * sy, sy * sxx - sx * sxy, n * sxx - sx * sx)


def test_group_ols_exact_components(spark):
    rng = random.Random(11)
    rows = []
    pts: dict[str, list[tuple[int, int]]] = {"g0": [], "g1": [], "flat": []}
    for g in ("g0", "g1"):
        for x in range(25):
            y = (3 if g == "g0" else -2) * x + rng.randrange(10)
            rows.append((g, x, y))
            pts[g].append((x, y))
    # degenerate group: all x equal -> den = 0 -> NULL slope
    for y in (5, 9, 14):
        rows.append(("flat", 4, y))
        pts["flat"].append((4, y))
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in group_ols(df, ["g"], "x", "y").collect()}
    for g, p in pts.items():
        sn, inum, den = ols_ref(p)
        r = got[g]
        assert (r.slope_num, r.intercept_num, r.den) == (sn, inum, den)
        if den == 0:
            assert r.slope is None and r.intercept is None
        else:
            assert r.slope == pytest.approx(sn / den)
            assert r.intercept == pytest.approx(inum / den)
    # positive-trend group really reads positive, negative negative
    assert got["g0"].slope > 0 > got["g1"].slope


def test_group_ols_partitioning_invariance(spark):
    rows = [("g", i % 37, (i * i) % 101) for i in range(300)]
    a = group_ols(
        spark.createDataFrame(rows, "g string, x long, y long").repartition(1),
        ["g"], "x", "y",
    ).collect()
    b = group_ols(
        spark.createDataFrame(rows, "g string, x long, y long").repartition(19),
        ["g"], "x", "y",
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def skyline_ref(pts: list[tuple[int, int]]) -> set[tuple[int, int]]:
    return {
        (x, y)
        for x, y in pts
        if not any(
            (a <= x and b <= y and (a < x or b < y)) for a, b in pts
        )
    }


def test_skyline_matches_bruteforce(spark):
    from mmkg_rag_spark.functions.pareto import skyline_2d

    rng = random.Random(5)
    pts = [(rng.randrange(50), rng.randrange(50)) for _ in range(400)]
    # duplicate frontier points must all survive (strict dominance)
    pts += pts[:7]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
    )
    got = skyline_2d(df, "x", "y").collect()
    want = skyline_ref(pts)
    assert {(r.x, r.y) for r in got} == want
    # row multiplicity preserved: every original row at a frontier point
    n_expected = sum(1 for p in pts if p in want)
    assert len(got) == n_expected


def test_skyline_partitioning_invariance(spark):
    from mmkg_rag_spark.functions.pareto import skyline_2d

    rng = random.Random(9)
    rows = [(i, rng.randrange(30), rng.randrange(30)) for i in range(300)]
    a = skyline_2d(
        spark.createDataFrame(rows, "id long, x long, y long").repartition(1),
        "x", "y",
    ).collect()
    b = skyline_2d(
        spark.createDataFrame(rows, "id long, x long, y long").repartition(23),
        "x", "y", num_partitions=7,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def mis_ref(edges: list[tuple[int, int]], rounds: int) -> dict[int, str]:
    """Plain-Python Luby with md5 priorities (mirrors the operator)."""
    import hashlib

    def pri(v: int) -> str:
        return hashlib.md5(str(v).encode()).hexdigest()

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    state = {v: "undecided" for v in adj}
    active = set(adj)
    for _ in range(rounds):
        if not active:
            break
        winners = {
            v
            for v in active
            if all(
                pri(v) < pri(u) for u in adj[v] if u in active
            )
        }
        if not winners:
            break
        killed = {
            u for v in winners for u in adj[v] if u in active
        } - winners
        for v in winners:
            state[v] = "in"
        for u in killed:
            state[u] = "out"
        active -= winners | killed
    return state


def test_mis_properties_and_reference(spark):
    from mmkg_rag_spark.operators.graph import maximal_independent_set

    rng = random.Random(13)
    edges = list(
        {
            (rng.randrange(60), rng.randrange(60))
            for _ in range(150)
        }
    )
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.state
        for r in maximal_independent_set(df, rounds=12).collect()
    }
    assert got == mis_ref(edges, 12)
    ins = {v for v, s in got.items() if s == "in"}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independence: no edge inside the set
    assert not any(b in ins for a in ins for b in adj[a])
    # maximality (once fully decided): every 'out' node has an 'in' neighbor
    assert all(s != "undecided" for s in got.values())
    assert all(
        any(u in ins for u in adj[v])
        for v, s in got.items()
        if s == "out"
    )


def test_mis_partitioning_invariance(spark):
    from mmkg_rag_spark.operators.graph import maximal_independent_set

    rng = random.Random(21)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(90)]
    edges = [e for e in edges if e[0] != e[1]]
    a = maximal_independent_set(
        spark.createDataFrame(edges, "src long, dst long").repartition(1),
        rounds=10,
    ).collect()
    b = maximal_independent_set(
        spark.createDataFrame(edges, "src long, dst long").repartition(17),
        rounds=10,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def treach_ref(
    edges: list[tuple[int, int, int]], seeds: list[int], rounds: int
) -> dict[int, int]:
    arr = {s: 0 for s in seeds}
    for _ in range(rounds):
        new = dict(arr)
        for u, v, t in edges:
            if u in arr and t >= arr[u]:
                if v not in new or t < new[v]:
                    new[v] = t
        arr = new
    return arr


def test_temporal_reachability_respects_time(spark):
    from mmkg_rag_spark.operators.graph import temporal_reachability

    # 0 -(t5)-> 1 -(t3)-> 2: the 1->2 edge fired BEFORE arrival at 1, so 2
    # is NOT reachable; 1 -(t7)-> 3 is; a later parallel 1->2 edge (t9)
    # makes 2 reachable at 9, not 3.
    edges = [(0, 1, 5), (1, 2, 3), (1, 3, 7), (1, 2, 9)]
    df = spark.createDataFrame(edges, "src long, dst long, ts long")
    got = {
        r.node: r.arrival
        for r in temporal_reachability(df, [0], 4).collect()
    }
    assert got == {0: 0, 1: 5, 3: 7, 2: 9}
    assert got == treach_ref(edges, [0], 4)


@pytest.mark.parametrize("seed", [1, 2])
def test_temporal_reachability_random_and_invariance(spark, seed):
    from mmkg_rag_spark.operators.graph import temporal_reachability

    rng = random.Random(seed)
    edges = [
        (rng.randrange(25), rng.randrange(25), rng.randrange(1, 50))
        for _ in range(120)
    ]
    want = treach_ref(sorted(set(edges)), [0, 1], 5)
    for parts in (1, 13):
        df = spark.createDataFrame(
            edges, "src long, dst long, ts long"
        ).repartition(parts)
        got = {
            r.node: r.arrival
            for r in temporal_reachability(df, [0, 1], 5).collect()
        }
        assert got == want
