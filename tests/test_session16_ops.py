"""Session-16 operators: 1-WL color refinement and greedy max-coverage
source selection.

Pins: wl_refinement's exact color strings vs a plain-Python md5 replica
of the identical recurrence (path-vs-star role separation, a regular
graph staying monochrome, a random graph); refinement-partition
properties (round-R colors refine round-(R-1) classes); greedy cover vs
an exhaustive Python greedy with the documented tie-break, including
the gain-0-still-picks and fewer-sources-than-k edges.
"""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from mmkg_rag_spark.operators.curation import greedy_source_cover
from mmkg_rag_spark.operators.graph import wl_refinement


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-s16ops"
    )


# ---------------------------------------------------------------------------
# Python replica of the exact WL recurrence
# ---------------------------------------------------------------------------


def _py_wl(edges: list[tuple[str, str]], rounds: int) -> dict[str, str]:
    adj: dict[str, list[str]] = defaultdict(list)
    seen = set()
    for s, d in edges:
        a, b = min(s, d), max(s, d)
        if a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        adj[a].append(b)
        adj[b].append(a)
    colors = {n: str(len(ns)) for n, ns in adj.items()}
    for _ in range(rounds):
        nxt = {}
        for n, ns in adj.items():
            cnt: dict[str, int] = defaultdict(int)
            for u in ns:
                cnt[colors[u]] += 1
            sig = ",".join(sorted(f"{c}:{k}" for c, k in cnt.items()))
            nxt[n] = hashlib.md5(
                f"{colors[n]}|{sig}".encode()
            ).hexdigest()
        colors = nxt
    return colors


def _spark_wl(spark, edges, rounds):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = wl_refinement(df, rounds=rounds).collect()
    return {r["node"]: r["color"] for r in out}


def test_wl_matches_python_replica_exactly(spark):
    rng = random.Random(16)
    nodes = [f"n{i}" for i in range(40)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    for rounds in (1, 3):
        assert _spark_wl(spark, edges, rounds) == _py_wl(edges, rounds)


def test_wl_separates_path_center_from_star_center(spark):
    # P5 center vs S4 hub: equal degree 2 vs 4 differ at round 0 already,
    # so craft equal-degree case: path a-b-c-d-e (c has deg 2) vs
    # cycle-ish; instead pin the classic refinement: in P5 the two
    # deg-2 neighbors of the center get a different round-2 color than
    # the center, while in C5 (2-regular) every node stays monochrome.
    path = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    cycle = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a")]
    pc = _spark_wl(spark, path, 2)
    cc = _spark_wl(spark, cycle, 2)
    assert len(set(cc.values())) == 1  # regular graph: never refines
    assert pc["c"] != pc["b"]  # center vs off-center roles split
    assert pc["b"] == pc["d"] and pc["a"] == pc["e"]  # symmetry kept


def test_wl_rounds_refine_previous_partition(spark):
    rng = random.Random(99)
    nodes = [f"v{i}" for i in range(30)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    c1 = _spark_wl(spark, edges, 1)
    c2 = _spark_wl(spark, edges, 2)
    # same round-2 color => same round-1 color (refinement property)
    by_c2: dict[str, set[str]] = defaultdict(set)
    for n, c in c2.items():
        by_c2[c].add(c1[n])
    assert all(len(v) == 1 for v in by_c2.values())


# ---------------------------------------------------------------------------
# greedy max-coverage source selection
# ---------------------------------------------------------------------------


def _py_greedy(rows: list[tuple[int, str, str]], k: int):
    terms: dict[str, set[str]] = defaultdict(set)
    for _, text, srcname in rows:
        terms[srcname] |= {t for t in text.split(" ") if t}
    covered: set[str] = set()
    picked = []
    total = 0
    remaining = sorted(terms)
    for rank in range(1, k + 1):
        if not remaining:
            break
        best = max(remaining, key=lambda s: (len(terms[s] - covered), ))
        # tie-break: max gain, then lexically smallest
        gains = {s: len(terms[s] - covered) for s in remaining}
        mx = max(gains.values())
        best = min(s for s in remaining if gains[s] == mx)
        total += mx
        picked.append((rank, best, mx, total))
        covered |= terms[best]
        remaining.remove(best)
    return picked


def _run_cover(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = greedy_source_cover(df, k=k).orderBy("pick_rank").collect()
    return [
        (r["pick_rank"], r["source"], r["gain_terms"], r["covered_terms"])
        for r in out
    ]


def test_greedy_cover_matches_python(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(20)), f"s{i % 7}")
        for i in range(50)
    ]
    assert _run_cover(spark, rows, 4) == _py_greedy(rows, 4)


def test_greedy_cover_zero_gain_still_picks(spark):
    # s2's vocabulary is a subset of s1's: after picking s1, both s2 and
    # s3 have gain 0 -> lexically smallest (s2) picked at rank 2.
    rows = [
        (1, "a b c d e", "s1"),
        (2, "a b", "s2"),
        (3, "c d", "s3"),
    ]
    out = _run_cover(spark, rows, 3)
    assert out == [(1, "s1", 5, 5), (2, "s2", 0, 5), (3, "s3", 0, 5)]


def test_greedy_cover_fewer_sources_than_k(spark):
    rows = [(1, "x y", "only")]
    assert _run_cover(spark, rows, 5) == [(1, "only", 2, 2)]


# ---------------------------------------------------------------------------
# quotient_graph (blockmodel contraction)
# ---------------------------------------------------------------------------


def test_quotient_graph_matches_python(spark):
    from mmkg_rag_spark.operators.graph import quotient_graph

    rng = random.Random(3)
    nodes = [f"n{i}" for i in range(20)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    labels = {n: f"L{hash(n) % 3}" for n in nodes}

    canon = {(min(a, b), max(a, b)) for a, b in edges}
    expect: dict[tuple[str, str], int] = defaultdict(int)
    for a, b in canon:
        la, lb = labels[a], labels[b]
        expect[(min(la, lb), max(la, lb))] += 1

    e = spark.createDataFrame(edges, "src string, dst string")
    lab = spark.createDataFrame(
        list(labels.items()), "node string, label string"
    )
    out = quotient_graph(e, lab).collect()
    got = {(r["comm_a"], r["comm_b"]): r["n_edges"] for r in out}
    assert got == dict(expect)


def test_quotient_graph_dedupes_multi_edges(spark):
    from mmkg_rag_spark.operators.graph import quotient_graph

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a")],
        "src string, dst string",
    )
    lab = spark.createDataFrame(
        [("a", "X"), ("b", "Y")], "node string, label string"
    )
    out = quotient_graph(e, lab).collect()
    assert [(r["comm_a"], r["comm_b"], r["n_edges"]) for r in out] == [
        ("X", "Y", 1)
    ]


# ---------------------------------------------------------------------------
# cusum_drift
# ---------------------------------------------------------------------------


def _py_cusum(series: dict[str, list[int]]):
    rows = []
    for key, xs in series.items():
        n_days, tot = len(xs), sum(xs)
        up = down = 0
        for d, x in enumerate(xs):
            dev = n_days * x - tot
            up = max(0, up + dev)
            down = max(0, down - dev)
            rows.append((key, d, x, dev, up, down))
    return rows


def test_cusum_matches_reflected_recurrence(spark):
    from datetime import date, timedelta

    from mmkg_rag_spark.operators.temporal import cusum_drift

    rng = random.Random(11)
    series = {
        "a": [rng.randrange(0, 50) for _ in range(40)],
        "b": [10] * 12,  # constant: dev 0 everywhere
        "c": [1, 1, 1, 30, 30, 30],  # step change: cusum_up ramps
    }
    d0 = date(2024, 1, 1)
    rows = [
        (k, d0 + timedelta(days=i), v)
        for k, xs in series.items()
        for i, v in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "key string, day date, n long")
    out = cusum_drift(df).orderBy("key", "day").collect()
    got = [
        (r["key"], r["n"], r["dev_scaled"], r["cusum_up"], r["cusum_down"])
        for r in out
    ]
    expect = [
        (k, x, dev, up, down)
        for k, _, x, dev, up, down in sorted(_py_cusum(series))
    ]
    assert got == expect
    # constant series never accumulates
    assert all(r[3] == 0 and r[4] == 0 for r in got if r[0] == "b")


# ---------------------------------------------------------------------------
# knn_classify
# ---------------------------------------------------------------------------


def test_knn_classify_matches_python(spark):
    import math

    from mmkg_rag_spark.operators.ann import knn_classify

    rng = random.Random(5)
    dim = 8
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(dim)] for i in range(40)
    }
    labels = {i: i % 3 for i in range(40)}
    train_ids = [i for i in vecs if i % 2 == 1]
    test_ids = [i for i in vecs if i % 2 == 0]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    expect = {}
    for t in test_ids:
        scored = sorted(
            ((cos(vecs[t], vecs[j]), j) for j in train_ids),
            key=lambda p: (-p[0], p[1]),
        )[:5]
        votes: dict[int, list[int]] = defaultdict(list)
        for rank, (_, j) in enumerate(scored, 1):
            votes[labels[j]].append(rank)
        win = min(
            votes.items(), key=lambda kv: (-len(kv[1]), min(kv[1]), kv[0])
        )
        expect[t] = (win[0], len(win[1]), min(win[1]))

    rows = [(i, vecs[i], labels[i]) for i in vecs]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    out = knn_classify(
        df.filter("vec_id % 2 = 1"), df.filter("vec_id % 2 = 0"), k=5
    ).collect()
    got = {
        r["vec_id"]: (r["pred_label"], r["n_votes"], r["best_rank"])
        for r in out
    }
    assert got == expect


# ---------------------------------------------------------------------------
# vocab_growth
# ---------------------------------------------------------------------------


def test_vocab_growth_matches_python(spark):
    from mmkg_rag_spark.operators.relevance import vocab_growth

    rng = random.Random(21)
    vocab = [f"t{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(6)), f"s{i % 3}")
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = vocab_growth(df).collect()
    got = {
        (r["source"], r["ckpt"]): (r["tokens_cum"], r["vocab_cum"])
        for r in out
    }

    by_src: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for i, text, s in rows:
        by_src[s].append((i, text))
    expect = {}
    for s, docs in by_src.items():
        docs.sort()
        n = len(docs)
        cps = {1 << i for i in range(20) if (1 << i) <= n} | {n}
        seen: set[str] = set()
        tok_cum = 0
        for rank, (_, text) in enumerate(docs, 1):
            ts = [t for t in text.split(" ") if t]
            tok_cum += len(ts)
            seen |= set(ts)
            if rank in cps:
                expect[(s, rank)] = (tok_cum, len(seen))
    assert got == expect


def test_vocab_growth_checkpoints_are_log_spaced(spark):
    from mmkg_rag_spark.operators.relevance import vocab_growth

    rows = [(i, "a b", "s") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    cks = [r["ckpt"] for r in vocab_growth(df).collect()]
    assert cks == [1, 2, 4, 8, 10]


# ---------------------------------------------------------------------------
# session_motifs
# ---------------------------------------------------------------------------


def test_session_motifs_matches_python(spark):
    from datetime import datetime, timedelta

    from mmkg_rag_spark.operators.temporal import session_motifs

    rng = random.Random(42)
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(6):
        t = t0
        for _ in range(rng.randrange(3, 12)):
            t = t + timedelta(seconds=rng.choice([60, 300, 2400]))
            rows.append((eid, t, u, rng.choice(["a", "b", "c"])))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = session_motifs(df).collect()
    got = {r["motif"]: (r["n_sessions"], r["n_users"]) for r in out}

    by_user: dict[int, list[tuple]] = defaultdict(list)
    for e, t, u, ty in rows:
        by_user[u].append((t, e, ty))
    paths: dict[str, list[int]] = defaultdict(list)
    for u, evs in by_user.items():
        evs.sort()
        cur = [evs[0][2]]
        for (pt, _, _), (t, _, ty) in zip(evs, evs[1:]):
            if (t - pt).total_seconds() > 1800:
                paths[">".join(cur)].append(u)
                cur = []
            cur.append(ty)
        paths[">".join(cur)].append(u)
    expect = {m: (len(us), len(set(us))) for m, us in paths.items()}
    assert got == expect


# ---------------------------------------------------------------------------
# mutual_topk_edges
# ---------------------------------------------------------------------------


def test_mutual_topk_matches_python(spark):
    from mmkg_rag_spark.operators.graph import mutual_topk_edges

    rng = random.Random(13)
    nodes = list(range(15))
    weights = {}
    for _ in range(40):
        a, b = rng.sample(nodes, 2)
        weights[(min(a, b), max(a, b))] = rng.randrange(1, 20)

    k = 3
    nbrs: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for (a, b), w in weights.items():
        nbrs[a].append((w, b))
        nbrs[b].append((w, a))
    topk = {
        n: {
            b: rk
            for rk, (_, b) in enumerate(
                sorted(ls, key=lambda p: (-p[0], p[1]))[:k], 1
            )
        }
        for n, ls in nbrs.items()
    }
    expect = {
        (a, b): (w, topk[a][b], topk[b][a])
        for (a, b), w in weights.items()
        if b in topk[a] and a in topk[b]
    }

    e = spark.createDataFrame(
        [(a, b, w) for (a, b), w in weights.items()],
        "src long, dst long, w long",
    )
    out = mutual_topk_edges(e, k=k).collect()
    got = {(r["a"], r["b"]): (r["w"], r["rank_ab"], r["rank_ba"]) for r in out}
    assert got == expect


def test_mutual_topk_drops_one_sided_hub_edges(spark):
    from mmkg_rag_spark.operators.graph import mutual_topk_edges

    # hub 0 connects to everyone with w=1; nodes 1-6 pair up strongly.
    edges = [(0, i, 1) for i in range(1, 7)]
    edges += [(1, 2, 9), (3, 4, 9), (5, 6, 9)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    out = mutual_topk_edges(e, k=1).collect()
    got = {(r["a"], r["b"]) for r in out}
    assert got == {(1, 2), (3, 4), (5, 6)}


# ---------------------------------------------------------------------------
# negative_edge_samples
# ---------------------------------------------------------------------------


def test_negative_samples_match_python(spark):
    from mmkg_rag_spark.operators.graph import negative_edge_samples

    rng = random.Random(8)
    edges = sorted(
        {(rng.randrange(5), 100 + rng.randrange(12)) for _ in range(25)}
    )
    tails = sorted({t for _, t in edges})
    pos = set(edges)

    expect = set()
    for s, t in edges:
        for i in (1, 2):
            h = int(hashlib.md5(f"{s}|{t}|{i}|7".encode()).hexdigest()[:15], 16)
            tn = tails[h % len(tails)]
            if (s, tn) not in pos:
                expect.add((s, t, i, tn))

    df = spark.createDataFrame(edges, "src long, dst long")
    out = negative_edge_samples(df, n_neg=2, seed=7).collect()
    got = {(r["s"], r["t_pos"], r["i"], r["t_neg"]) for r in out}
    assert got == expect


def test_negative_samples_never_emit_positives(spark):
    from mmkg_rag_spark.operators.graph import negative_edge_samples

    edges = [(0, 100), (0, 101), (1, 100)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = negative_edge_samples(df, n_neg=4).collect()
    pos = set(edges)
    assert all((r["s"], r["t_neg"]) not in pos for r in out)
    assert all(r["t_neg"] in (100, 101) for r in out)


# ---------------------------------------------------------------------------
# pseudo_diameter
# ---------------------------------------------------------------------------


def test_pseudo_diameter_exact_on_path_graph(spark):
    from mmkg_rag_spark.operators.graph import pseudo_diameter

    # path b0-b1-...-b6: diameter 6; start=min node b0, turn=b6, far=b0
    edges = [(f"b{i}", f"b{i+1}") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = pseudo_diameter(df, max_hops=8).collect()[0]
    assert (
        r["start_node"], r["turn_node"], r["ecc_start"],
        r["far_node"], r["diameter_lb"], r["n_reached"],
    ) == ("b0", "b6", 6, "b0", 6, 7)


def test_pseudo_diameter_star_and_double_sweep_improves(spark):
    from mmkg_rag_spark.operators.graph import pseudo_diameter

    # start at the hub ("a"): ecc 1; sweep 2 from a leaf certifies 2
    edges = [("a", f"x{i}") for i in range(5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = pseudo_diameter(df, max_hops=4).collect()[0]
    assert r["start_node"] == "a"
    assert r["ecc_start"] == 1 and r["diameter_lb"] == 2
    assert r["turn_node"] == "x0"  # farthest ties -> smallest id


# ---------------------------------------------------------------------------
# doc_novelty
# ---------------------------------------------------------------------------


def test_doc_novelty_matches_python(spark):
    from mmkg_rag_spark.operators.relevance import doc_novelty

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(10)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = doc_novelty(df, n=3).collect()
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"]) for r in out}

    first: dict[tuple, int] = {}
    per_doc: dict[int, set] = {}
    for i, text in rows:
        ts = text.split(" ")
        gs = {tuple(ts[j : j + 3]) for j in range(len(ts) - 2)}
        per_doc[i] = gs
        for g in gs:
            first.setdefault(g, i)
    expect = {
        i: (len(gs), sum(1 for g in gs if first[g] == i))
        for i, gs in per_doc.items()
    }
    assert got == expect


def test_doc_novelty_short_docs_emit_nothing(spark):
    from mmkg_rag_spark.operators.relevance import doc_novelty

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["n_grams"], r["n_novel"])
           for r in doc_novelty(df, n=3).collect()}
    assert out == {2: (1, 1)}


# ---------------------------------------------------------------------------
# gini_coefficient
# ---------------------------------------------------------------------------


def test_gini_matches_python_and_bounds(spark):
    from mmkg_rag_spark.operators.profile import gini_coefficient

    rng = random.Random(17)
    rows = [(k, rng.randrange(1, 40)) for k in range(50)]
    df = spark.createDataFrame(rows, "k long, n long")
    r = gini_coefficient(df, "k", "n").collect()[0]

    xs = sorted((x, k) for k, x in rows)
    n = len(xs)
    s = sum(x for x, _ in xs)
    w = sum(i * x for i, (x, _) in enumerate(xs, 1))
    num, den = 2 * w - (n + 1) * s, n * s
    assert (r["n_keys"], r["total"], r["gini_num"], r["gini_den"]) == (
        n, s, num, den,
    )
    assert r["gini"] == round(num / den, 6)
    assert 0.0 <= r["gini"] < 1.0


def test_gini_uniform_is_zero_and_concentrated_is_high(spark):
    from mmkg_rag_spark.operators.profile import gini_coefficient

    uni = spark.createDataFrame([(k, 5) for k in range(10)], "k long, n long")
    assert gini_coefficient(uni, "k", "n").collect()[0]["gini"] == 0.0
    conc = spark.createDataFrame(
        [(0, 1000)] + [(k, 1) for k in range(1, 10)], "k long, n long"
    )
    assert gini_coefficient(conc, "k", "n").collect()[0]["gini"] > 0.85


# ---------------------------------------------------------------------------
# source_overlap_matrix
# ---------------------------------------------------------------------------


def test_source_overlap_matches_python(spark):
    from mmkg_rag_spark.operators.curation import source_overlap_matrix

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(12)), f"s{i % 4}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = source_overlap_matrix(df).collect()
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_common"], r["n_a"], r["n_b"], r["jaccard_ppm"]
        )
        for r in out
    }

    vs: dict[str, set] = defaultdict(set)
    for _, text, s in rows:
        vs[s] |= set(text.split(" "))
    expect = {}
    srcs = sorted(vs)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            c = len(vs[a] & vs[b])
            expect[(a, b)] = (
                c, len(vs[a]), len(vs[b]),
                1000000 * c // (len(vs[a]) + len(vs[b]) - c),
            )
    assert got == expect


def test_cusum_fixed_ref_matches_recurrence(spark):
    from datetime import date, timedelta

    from mmkg_rag_spark.operators.temporal import cusum_drift

    series = {"a": [10, 2, 30, 8, 8, 40], "b": [8] * 5}
    d0 = date(2024, 1, 1)
    rows = [
        (k, d0 + timedelta(days=i), v)
        for k, xs in series.items()
        for i, v in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "key string, day date, n long")
    out = cusum_drift(df, ref=(8, 1)).orderBy("key", "day").collect()
    got = [(r["key"], r["n"], r["dev_scaled"], r["cusum_up"], r["cusum_down"])
           for r in out]
    expect = []
    for k in sorted(series):
        up = down = 0
        for x in series[k]:
            dev = x - 8
            up, down = max(0, up + dev), max(0, down - dev)
            expect.append((k, x, dev, up, down))
    assert got == expect


# ---------------------------------------------------------------------------
# surface_pmi / exact floor-log2 ratio
# ---------------------------------------------------------------------------


def test_floor_log2_ratio_exact(spark):
    from fractions import Fraction

    from mmkg_rag_spark.operators.mentions import _floor_log2_ratio

    rng = random.Random(3)
    rows = [
        (rng.randrange(1, 10**9), rng.randrange(1, 10**9)) for _ in range(300)
    ]
    rows += [(1, 1), (1, 2), (2, 1), (3, 4), (4, 3), (7, 56), (56, 7)]
    df = spark.createDataFrame(rows, "pmi_num long, pmi_den long")
    out = df.select(
        "pmi_num", "pmi_den",
        _floor_log2_ratio("pmi_num", "pmi_den").alias("bits"),
    ).collect()
    for r in out:
        # definitional check: 2^bits <= num/den < 2^(bits+1), exactly
        f = Fraction(r["pmi_num"], r["pmi_den"])
        lo = Fraction(2) ** r["bits"]
        assert lo <= f < lo * 2, (r["pmi_num"], r["pmi_den"], r["bits"])


def test_surface_pmi_matches_python(spark):
    from mmkg_rag_spark.operators.mentions import surface_pmi

    rng = random.Random(77)
    surfaces = ["alpha", "beta", "gamma"]
    rows = []
    for i in range(40):
        words = [rng.choice(surfaces + ["x", "y", "z"]) for _ in range(8)]
        rows.append((i, " ".join(words), "en", "s", 10))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = surface_pmi(df, surfaces=surfaces).collect()
    got = {
        (r["surface_a"], r["surface_b"]): (
            r["n_ab"], r["n_a"], r["n_b"], r["pmi_bits"]
        )
        for r in out
    }

    present: dict[str, set] = defaultdict(set)
    for i, text, *_ in rows:
        for s in surfaces:
            if s in text.split(" "):
                present[s].add(i)
    N = len(rows)
    expect = {}
    for i, a in enumerate(sorted(surfaces)):
        for b in sorted(surfaces)[i + 1 :]:
            nab = len(present[a] & present[b])
            if nab == 0:
                continue
            num, den = nab * N, len(present[a]) * len(present[b])
            bits = len(bin(num)[2:]) - len(bin(den)[2:])
            ok = (
                num >= den * (1 << bits)
                if bits >= 0
                else num * (1 << -bits) >= den
            )
            if not ok:
                bits -= 1
            expect[(a, b)] = (nab, len(present[a]), len(present[b]), bits)
    assert got == expect and expect


def test_lorenz_matches_python(spark):
    from mmkg_rag_spark.operators.profile import lorenz_checkpoints

    rng = random.Random(41)
    rows = [(k, rng.randrange(1, 500)) for k in range(37)]
    df = spark.createDataFrame(rows, "k long, cents long")
    out = lorenz_checkpoints(df, "k", "cents").collect()
    got = [(r["ckpt"], r["cum_value"], r["total_value"], r["share_ppm"])
           for r in out]

    ordered = sorted(rows, key=lambda p: (-p[1], p[0]))
    n, total = len(ordered), sum(v for _, v in ordered)
    cps = sorted({1 << i for i in range(10) if (1 << i) <= n} | {n})
    expect = []
    for cp in cps:
        cum = sum(v for _, v in ordered[:cp])
        expect.append((cp, cum, total, 1000000 * cum // total))
    assert got == expect
    # curve is monotone and ends at 100%
    assert got[-1][3] == 1000000


def test_burst_spans_hysteresis_semantics(spark):
    from datetime import date, timedelta

    from mmkg_rag_spark.operators.temporal import burst_spans

    d0 = date(2024, 5, 1)
    # series: below, cross hi, dead band (holds), drop below lo,
    # dead band (stays off), cross hi again, end in-burst
    series = [5, 15, 11, 4, 11, 20, 18]
    rows = [("k", d0 + timedelta(days=i), v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "key string, day date, n long")
    out = burst_spans(df, hi=12, lo=10).orderBy("span_start").collect()
    got = [
        (r["span_start"], r["span_end"], r["n_days"], r["peak"], r["total"])
        for r in out
    ]
    assert got == [
        (d0 + timedelta(days=1), d0 + timedelta(days=2), 2, 15, 26),
        (d0 + timedelta(days=5), d0 + timedelta(days=6), 2, 20, 38),
    ]


def test_burst_spans_matches_python_state_machine(spark):
    from datetime import date, timedelta

    from mmkg_rag_spark.operators.temporal import burst_spans

    rng = random.Random(9)
    d0 = date(2024, 6, 1)
    rows = [
        (k, d0 + timedelta(days=i), rng.randrange(0, 30))
        for k in ("a", "b")
        for i in range(60)
    ]
    hi, lo = 20, 10
    df = spark.createDataFrame(rows, "key string, day date, n long")
    out = burst_spans(df, hi=hi, lo=lo).collect()
    got = {
        (r["key"], r["span_start"]): (r["span_end"], r["n_days"], r["peak"], r["total"])
        for r in out
    }

    expect = {}
    for k in ("a", "b"):
        state, span = 0, None
        seq = sorted((d, n) for kk, d, n in rows if kk == k)
        for d, n in seq:
            if n >= hi:
                state = 1
            elif n < lo:
                state = 0
            if state == 1:
                if span is None:
                    span = [d, d, 0, 0, 0]
                span[1] = d
                span[2] += 1
                span[3] = max(span[3], n)
                span[4] += n
            elif span is not None:
                expect[(k, span[0])] = (span[1], span[2], span[3], span[4])
                span = None
        if span is not None:
            expect[(k, span[0])] = (span[1], span[2], span[3], span[4])
    assert got == expect and expect


# ---------------------------------------------------------------------------
# invariance properties
# ---------------------------------------------------------------------------


def test_wl_histogram_is_isomorphism_invariant(spark):
    """Relabeling nodes must leave the WL color histogram unchanged —
    the defining property of the WL fingerprint."""
    from collections import Counter

    rng = random.Random(55)
    nodes = [f"n{i}" for i in range(25)]
    edges = list({
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)
    })
    perm = dict(zip(nodes, rng.sample(nodes, len(nodes))))
    edges_p = [(perm[a], perm[b]) for a, b in edges]

    h1 = Counter(_spark_wl(spark, edges, 3).values())
    h2 = Counter(_spark_wl(spark, edges_p, 3).values())
    assert h1 == h2


def test_mutual_topk_is_orientation_invariant(spark):
    from mmkg_rag_spark.operators.graph import mutual_topk_edges

    rng = random.Random(29)
    base = list({
        (a, b): None
        for a, b in (tuple(sorted(rng.sample(range(12), 2))) for _ in range(30))
    })
    weights = [(a, b, rng.randrange(1, 9)) for a, b in base]
    flipped = [
        (b, a, w) if rng.random() < 0.5 else (a, b, w) for a, b, w in weights
    ]
    e1 = spark.createDataFrame(weights, "src long, dst long, w long")
    e2 = spark.createDataFrame(flipped, "src long, dst long, w long")
    r1 = {(r["a"], r["b"]): (r["w"], r["rank_ab"], r["rank_ba"])
          for r in mutual_topk_edges(e1, k=2).collect()}
    r2 = {(r["a"], r["b"]): (r["w"], r["rank_ab"], r["rank_ba"])
          for r in mutual_topk_edges(e2, k=2).collect()}
    assert r1 == r2


def test_gini_is_key_permutation_invariant_and_scale_free(spark):
    from mmkg_rag_spark.operators.profile import gini_coefficient

    rng = random.Random(71)
    vals = [rng.randrange(1, 100) for _ in range(40)]
    a = spark.createDataFrame(list(enumerate(vals)), "k long, n long")
    # permute which key holds which value: Gini depends on the multiset only
    shuffled = vals[:]
    rng.shuffle(shuffled)
    b = spark.createDataFrame(list(enumerate(shuffled)), "k long, n long")
    ga = gini_coefficient(a, "k", "n").collect()[0]
    gb = gini_coefficient(b, "k", "n").collect()[0]
    assert ga["gini"] == gb["gini"]
    # scaling every value by a constant leaves Gini unchanged
    c = spark.createDataFrame(
        [(k, 7 * v) for k, v in enumerate(vals)], "k long, n long"
    )
    gc = gini_coefficient(c, "k", "n").collect()[0]
    assert gc["gini"] == ga["gini"]


# ---------------------------------------------------------------------------
# rich_club
# ---------------------------------------------------------------------------


def test_rich_club_matches_python(spark):
    from mmkg_rag_spark.operators.graph import rich_club

    rng = random.Random(19)
    edges = list({
        tuple(sorted(rng.sample(range(30), 2))) for _ in range(120)
    })
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["k"]: (r["club_edges"], r["possible_edges"], r["density_ppm"])
           for r in rich_club(df, ks=[4, 8, 16]).collect()}

    deg: dict[int, int] = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    ranked = sorted(deg, key=lambda n: (-deg[n], n))
    for k in (4, 8, 16):
        club = set(ranked[:k])
        ce = sum(1 for a, b in edges if a in club and b in club)
        poss = k * (k - 1) // 2
        assert out[k] == (ce, poss, 1000000 * ce // poss)


def test_rich_club_complete_graph_is_saturated(spark):
    from itertools import combinations

    from mmkg_rag_spark.operators.graph import rich_club

    edges = list(combinations(range(10), 2))
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["k"]: r["density_ppm"] for r in rich_club(df, ks=[4, 8]).collect()}
    assert out == {4: 1000000, 8: 1000000}


def test_mutual_topk_dedupes_double_oriented_input(spark):
    """Round-5 hardening: supplying BOTH orientations of every undirected
    edge (or exact duplicate rows) must give the same result as the
    canonical one-row-per-edge input — duplicates may not consume top-k
    slots or double-emit survivors."""
    from mmkg_rag_spark.operators.graph import mutual_topk_edges

    rng = random.Random(31)
    base = list({
        tuple(sorted(rng.sample(range(10), 2))): None for _ in range(25)
    })
    weights = [(a, b, rng.randrange(1, 9)) for a, b in base]
    doubled = weights + [(b, a, w) for a, b, w in weights] + weights[:7]
    e1 = spark.createDataFrame(weights, "src long, dst long, w long")
    e2 = spark.createDataFrame(doubled, "src long, dst long, w long")
    r1 = {(r["a"], r["b"]): (r["w"], r["rank_ab"], r["rank_ba"])
          for r in mutual_topk_edges(e1, k=2).collect()}
    r2 = {(r["a"], r["b"]): (r["w"], r["rank_ab"], r["rank_ba"])
          for r in mutual_topk_edges(e2, k=2).collect()}
    assert r1 == r2 and len(r1) > 0


def test_rich_club_k_below_2_yields_null_density(spark):
    """k < 2 ⇒ possible_edges = 0: density_ppm is NULL by contract, never
    a divide-by-zero (round-5 hardening)."""
    from mmkg_rag_spark.operators.graph import rich_club

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    rows = {r["k"]: r for r in rich_club(e, ks=[1, 3]).collect()}
    assert rows[1]["possible_edges"] == 0
    assert rows[1]["density_ppm"] is None
    assert rows[3]["possible_edges"] == 3
    assert rows[3]["density_ppm"] is not None


def test_bfs_early_exit_matches_deep_max_hops(spark):
    """Round-5 BFS fusion: the empty-frontier early exit must leave the
    result identical to running far more rounds than the diameter, for
    both the multi-source map and the per-seed variant."""
    from mmkg_rag_spark.operators.graph import (
        bfs_distances,
        bfs_distances_per_seed,
    )

    # path graph 0-1-2-3-4 plus a disconnected pair 10-11 (never reached)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    d4 = {(r["node"]): r["dist"] for r in bfs_distances(e, [0], 4).collect()}
    d50 = {(r["node"]): r["dist"] for r in bfs_distances(e, [0], 50).collect()}
    assert d4 == d50 == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}

    p5 = {(r["seed"], r["node"]): r["dist"]
          for r in bfs_distances_per_seed(e, [0, 4], 5).collect()}
    p40 = {(r["seed"], r["node"]): r["dist"]
           for r in bfs_distances_per_seed(e, [0, 4], 40).collect()}
    assert p5 == p40 and (4, 0) in p5 and p5[(4, 0)] == 4
