"""PageRank: exact fixed-point parity with a Python integer reference."""

from __future__ import annotations

import pytest

from mmkg_rag_spark.operators.graph import SCALE, pagerank


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-graph")


def ref_pagerank(edges, iterations=5, num=17, den=20, scale=SCALE,
                 undirected=False, seeds=None):
    """The operator's recurrence in plain Python integers."""
    es = set(edges)
    if undirected:
        es |= {(b, a) for a, b in edges}
    nodes = {n for e in es for n in e}
    flag = {n: (1 if seeds is None or n in seeds else 0) for n in nodes}
    outdeg = {n: 0 for n in nodes}
    for a, _ in es:
        outdeg[a] += 1
    base = (scale * (den - num)) // den
    rank = {n: scale * flag[n] for n in nodes}
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for a, b in es:
            inc[b] += rank[a] // outdeg[a]
        rank = {n: flag[n] * base + (inc[n] // den) * num for n in nodes}
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


def test_personalized_pagerank_matches_reference_and_localizes(spark):
    """Seed-biased teleport: exact parity with the integer reference, and
    mass concentrates near the seed (random-walk proximity ranking)."""
    # chain a-b-c-d-e plus a far cluster x-y-z reachable only through e
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("e", "x"), ("x", "y"), ("y", "z")]
    df = spark.createDataFrame(chain, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r.node: r.rank_scaled
        for r in pagerank(df, undirected=True, iterations=6,
                          personalize=seeds).collect()
    }
    assert got == ref_pagerank(chain, iterations=6, undirected=True,
                               seeds={"a"})
    # proximity ordering: the seed outranks its neighbor, which outranks
    # the far end of the chain
    assert got["a"] > got["b"] > got["z"]
    # un-personalized run over the same graph is unchanged by the feature
    got_all = {
        r.node: r.rank_scaled
        for r in pagerank(df, undirected=True, iterations=6).collect()
    }
    assert got_all == ref_pagerank(chain, iterations=6, undirected=True)


def test_pagerank_partitioning_invariance(spark):
    """Integer fixed-point ⇒ bit-identical under any partitioning."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {r.node: r.rank_scaled for r in pagerank(df.coalesce(1)).collect()}
    b = {r.node: r.rank_scaled for r in pagerank(df.repartition(7)).collect()}
    assert a == b


def ref_lpa(edges, iterations=4, undirected=True):
    """label_propagation's recurrence in plain Python."""
    es = set(edges)
    if undirected:
        es |= {(b, a) for a, b in edges}
    nodes = {n for e in es for n in e}
    label = {n: n for n in nodes}
    for _ in range(iterations):
        votes = {}
        for a, b in es:
            votes.setdefault(b, {}).setdefault(label[a], 0)
            votes[b][label[a]] += 1
        label = {
            v: (min(votes[v].items(), key=lambda kv: (-kv[1], kv[0]))[0]
                if v in votes else label[v])  # vote-less keeps its label
            for v in nodes
        }
    return label


def test_label_propagation_matches_reference(spark):
    # two triangles bridged by one edge -> two communities
    tri = [("a", "b"), ("b", "c"), ("c", "a"),
           ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")]
    from mmkg_rag_spark.operators.graph import label_propagation

    df = spark.createDataFrame(tri, "src string, dst string")
    got = {
        r.node: r.community
        for r in label_propagation(df, iterations=4).collect()
    }
    assert got == ref_lpa(tri, iterations=4)
    # the bridge does not merge the triangles
    assert len({got["a"], got["x"]}) == 2
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]


def test_label_propagation_partitioning_invariance(spark):
    from mmkg_rag_spark.operators.graph import label_propagation

    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {r.node: r.community
         for r in label_propagation(df.coalesce(1), iterations=3).collect()}
    b = {r.node: r.community
         for r in label_propagation(df.repartition(5), iterations=3).collect()}
    assert a == b == ref_lpa(EDGES, iterations=3)


def test_graph_ops_on_random_graphs_match_reference(spark):
    """Seeded random digraphs with self-loops, dangling nodes, and
    disconnected parts: both operators equal their integer references."""
    import random

    from mmkg_rag_spark.operators.graph import label_propagation

    for seed in (1, 7, 23):
        rng = random.Random(seed)
        n = rng.randint(8, 25)
        edges = list({
            (f"v{rng.randrange(n)}", f"v{rng.randrange(n)}")
            for _ in range(rng.randint(n, 3 * n))
        })  # may include (v, v) self-loops and leave dangling sinks
        df = spark.createDataFrame(edges, "src string, dst string")
        got_pr = {r.node: r.rank_scaled
                  for r in pagerank(df, iterations=4).collect()}
        assert got_pr == ref_pagerank(edges, iterations=4), seed
        got_lpa = {r.node: r.community
                   for r in label_propagation(df, iterations=3).collect()}
        assert got_lpa == ref_lpa(edges, iterations=3), seed
        # DIRECTED LPA: in-neighbor-less nodes must persist with their own
        # label instead of dropping out of the label table
        got_dir = {
            r.node: r.community
            for r in label_propagation(df, iterations=3,
                                       undirected=False).collect()
        }
        assert got_dir == ref_lpa(edges, iterations=3, undirected=False), seed


def _brute_triangles(edge_list):
    """O(n^3) reference: per-node triangle counts on the simple graph."""
    import itertools

    adj = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] += 1
    return counts, {n: len(adj[n]) for n in adj}


def test_triangle_counts_k4(spark):
    from mmkg_rag_spark.operators.graph import triangle_counts

    edges = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = {r["node"]: r for r in triangle_counts(df).collect()}
    # K4: every node is in C(3,2)=3 triangles, clustering 1.0
    assert all(rows[n]["triangles"] == 3 for n in "abcd")
    assert all(rows[n]["clustering"] == 1.0 for n in "abcd")
    assert all(rows[n]["degree"] == 3 for n in "abcd")


def test_triangle_counts_dedup_and_self_loops(spark):
    from mmkg_rag_spark.operators.graph import triangle_counts

    edges = [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("a", "c"),
             ("c", "a")]  # one triangle after cleanup
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = {r["node"]: r for r in triangle_counts(df).collect()}
    assert all(rows[n]["triangles"] == 1 for n in "abc")


def test_triangle_counts_random_graphs_match_brute(spark):
    import random

    from mmkg_rag_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    for trial in range(3):
        n = 30
        edges = [(f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
                 for _ in range(120)]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: (r["degree"], r["triangles"])
               for r in triangle_counts(df).collect()}
        want_tri, want_deg = _brute_triangles(edges)
        assert got == {n: (want_deg[n], want_tri[n]) for n in want_tri}


def _brute_kcore(edge_list, k, rounds):
    """Synchronous fixed-round peeling reference."""
    adj = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    deg = {}
    for _ in range(rounds):
        deg = {n: sum(1 for m in adj[n] if m in alive)
               for n in alive}
        alive = {n for n, d in deg.items() if d >= k}
    return {n: deg[n] for n in alive}


def test_kcore_triangle_with_pendant(spark):
    from mmkg_rag_spark.operators.graph import kcore

    # triangle a-b-c plus pendant chain c-d-e: 2-core = the triangle
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = {r["node"]: r["core_degree"] for r in kcore(df, k=2, rounds=4).collect()}
    assert rows == {"a": 2, "b": 2, "c": 2}


def test_kcore_cascade(spark):
    from mmkg_rag_spark.operators.graph import kcore

    # path graph: 2-core empty, but only after cascading peels
    edges = [(f"n{i}", f"n{i+1}") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert kcore(df, k=2, rounds=6).count() == 0
    # 1-core keeps everything
    assert kcore(df, k=1, rounds=3).count() == 7


def test_kcore_random_graphs_match_brute(spark):
    import random

    from mmkg_rag_spark.operators.graph import kcore

    rng = random.Random(11)
    for k in (2, 3):
        edges = [(f"n{rng.randrange(25)}", f"n{rng.randrange(25)}")
                 for _ in range(70)]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["core_degree"]
               for r in kcore(df, k=k, rounds=5).collect()}
        assert got == _brute_kcore(edges, k, 5)


def ref_sssp(edges, seeds, rounds, undirected=True):
    """Plain-Python fixed-round Bellman-Ford: min weight over ≤R edges."""
    es = list(edges)
    if undirected:
        es += [(b, a, w) for a, b, w in es]
    best = {}
    for a, b, w in es:
        best[(a, b)] = min(w, best.get((a, b), w))
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for (a, b), w in best.items():
            if a in dist and dist[a] + w < nxt.get(b, 1 << 60):
                nxt[b] = dist[a] + w
        dist = nxt
    return dist


def test_sssp_matches_reference_on_random_weighted_graphs(spark):
    import random

    from mmkg_rag_spark.operators.graph import sssp_distances

    rng = random.Random(7)
    for trial in range(3):
        edges = [
            (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}",
             rng.randrange(1, 10))
            for _ in range(80)
        ]
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        for rounds in (1, 3):
            got = {
                r.node: r.dist
                for r in sssp_distances(df, ["n0", "n1"], rounds).collect()
            }
            assert got == ref_sssp(edges, ["n0", "n1"], rounds), (
                trial, rounds)


def test_sssp_weighted_beats_hop_count(spark):
    """A 2-edge cheap path must beat a 1-edge expensive one once rounds
    allow it — the semantics BFS cannot express."""
    from mmkg_rag_spark.operators.graph import sssp_distances

    edges = [("s", "t", 10), ("s", "m", 2), ("m", "t", 3)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    d1 = {r.node: r.dist for r in sssp_distances(df, ["s"], 1).collect()}
    d2 = {r.node: r.dist for r in sssp_distances(df, ["s"], 2).collect()}
    assert d1["t"] == 10 and d2["t"] == 5


def test_sssp_parallel_edges_and_partitioning_invariance(spark):
    from mmkg_rag_spark.operators.graph import sssp_distances

    edges = [("a", "b", 5), ("a", "b", 2), ("b", "c", 1), ("c", "d", 4)]
    outs = []
    for parts in (1, 7):
        df = spark.createDataFrame(
            edges, "src string, dst string, w long"
        ).repartition(parts)
        outs.append(sorted(
            (r.node, r.dist)
            for r in sssp_distances(df, ["a"], 3).collect()
        ))
    assert outs[0] == outs[1]
    assert dict(outs[0])["b"] == 2  # parallel edges collapse to min weight
