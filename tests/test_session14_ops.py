"""Session-14 operators: Fellegi-Sunter linkage, temperature sampling,
attribute modularity.

Pins: blocked candidate generation vs a brute-force reference; the EM
estimator's (m, u, λ) recovery and match separation on planted-duplicate
data; exact_isqrt as a true integer sqrt incl. the boundary cases that
break floor(libm-sqrt); the α=1/2 temperature plan vs a plain-Python
integer recurrence and its partitioning invariance; modularity vs a
hand-computed Q on a crafted two-community graph and the Q = 1 − Σ(d_c/2m)²
identity when the partition equals the connected components.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from mmkg_rag_spark.operators.curation import (
    exact_isqrt,
    plan_temperature,
    sample_temperature,
)
from mmkg_rag_spark.operators.graph import attribute_modularity
from mmkg_rag_spark.operators.linkage import (
    agreement_patterns,
    candidate_pairs,
    estimate_m_u,
    fs_score,
    pack_pattern,
    weights_milli,
)


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-s14ops"
    )


# ---------------------------------------------------------------------------
# linkage
# ---------------------------------------------------------------------------


def test_candidate_pairs_match_bruteforce(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randrange(4), rng.choice("xyz"), rng.randrange(100))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, blk int, f string, v long")
    got = {
        (r.id_a, r.id_b, r.a_f, r.b_f, r.a_v, r.b_v)
        for r in candidate_pairs(df, "id", ["blk"], ["f", "v"]).collect()
    }
    want = {
        (a[0], b[0], a[2], b[2], a[3], b[3])
        for a in rows
        for b in rows
        if a[1] == b[1] and a[0] < b[0]
    }
    assert got == want and len(want) > 100


def _python_em(pattern_counts, k, rounds, m0=0.9, u0=0.1, lam0=0.1):
    """Independent plain-Python EM reference (same spec, separate code)."""
    m, u, lam = [m0] * k, [u0] * k, lam0
    pats = sorted(pattern_counts)
    total = sum(n for _, n in pats)
    for _ in range(rounds):
        sg = sh = 0.0
        gm, hu = [0.0] * k, [0.0] * k
        for pat, n in pats:
            pm, pu = lam, 1 - lam
            for j in range(k):
                bit = (pat >> (k - 1 - j)) & 1
                pm *= m[j] if bit else 1 - m[j]
                pu *= u[j] if bit else 1 - u[j]
            g = pm / (pm + pu)
            sg += n * g
            sh += n * (1 - g)
            for j in range(k):
                if (pat >> (k - 1 - j)) & 1:
                    gm[j] += n * g
                    hu[j] += n * (1 - g)
        m = [min(max(x / sg, 1e-6), 1 - 1e-6) for x in gm]
        u = [min(max(x / sh, 1e-6), 1 - 1e-6) for x in hu]
        lam = sg / total
    return m, u, lam


def test_em_matches_reference_and_recovers_planted_params():
    """Generate pattern counts from known (m*, u*, λ*); EM must agree with
    the independent reference exactly and land near the truth."""
    rng = random.Random(13)
    k = 3
    m_true, u_true, lam_true = [0.95, 0.9, 0.8], [0.3, 0.1, 0.2], 0.15
    counts: dict[int, int] = {}
    for _ in range(200_000):
        is_match = rng.random() < lam_true
        pat = 0
        for j in range(k):
            p = m_true[j] if is_match else u_true[j]
            pat = pat * 2 + (1 if rng.random() < p else 0)
        counts[pat] = counts.get(pat, 0) + 1
    items = sorted(counts.items())
    m, u, lam = estimate_m_u(items, k, rounds=60)
    m_ref, u_ref, lam_ref = _python_em(items, k, 60)
    assert m == pytest.approx(m_ref, abs=1e-12)
    assert u == pytest.approx(u_ref, abs=1e-12)
    assert lam == pytest.approx(lam_ref, abs=1e-12)
    assert lam == pytest.approx(lam_true, abs=0.03)
    for got, want in zip(m + u, m_true + u_true):
        assert got == pytest.approx(want, abs=0.08)


def test_fs_weights_separate_planted_duplicates(spark):
    """Plant duplicate records (fields agree with prob m*) among random
    ones; FS scores with weights_milli from the planted params must rank
    every planted pair above every non-planted pair's median."""
    rng = random.Random(99)
    k = 3
    m_t, u_t = [0.95, 0.9, 0.9], [0.2, 0.1, 0.1]
    rows = []
    planted = set()
    for i in range(80):
        base = [rng.randrange(5), rng.randrange(10), rng.randrange(10)]
        rows.append((2 * i, 0, *base))
        dup = [
            b if rng.random() < m else rng.randrange(5 if j == 0 else 10)
            for j, (b, m) in enumerate(zip(base, m_t))
        ]
        rows.append((2 * i + 1, 0, *dup))
        planted.add((2 * i, 2 * i + 1))
    df = spark.createDataFrame(rows, "id long, blk int, x long, y long, z long")
    pairs = candidate_pairs(df, "id", ["blk"], ["x", "y", "z"])
    bits = [
        F.col("a_x") == F.col("b_x"),
        F.col("a_y") == F.col("b_y"),
        F.col("a_z") == F.col("b_z"),
    ]
    w = weights_milli(m_t, u_t)
    score, cls = fs_score(bits, w, match_milli=3000, possible_milli=0)
    out = pairs.select("id_a", "id_b", score.alias("s"), cls.alias("c")).collect()
    planted_scores = [r.s for r in out if (r.id_a, r.id_b) in planted]
    other = sorted(r.s for r in out if (r.id_a, r.id_b) not in planted)
    assert len(planted_scores) == 80
    med_other = other[len(other) // 2]
    assert sum(1 for s in planted_scores if s > med_other) >= 80 * 0.9
    # EM on the observed patterns recovers weights with the same signs
    pat = agreement_patterns(pairs, pack_pattern(bits)).collect()
    m_e, u_e, lam_e = estimate_m_u([(r.pattern, r.n_pairs) for r in pat], 3)
    assert all(me > ue for me, ue in zip(m_e, u_e))
    assert 0.0 < lam_e < 0.3


def test_weights_milli_values():
    w = weights_milli([0.9], [0.1])
    assert w == [(round(1000 * math.log2(9)), round(1000 * math.log2(1 / 9)))]


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------


def test_exact_isqrt_boundaries(spark):
    vals = []
    for k in (0, 1, 2, 3, 10, 999, 10**6, 10**9, 10**12):
        vals.extend({max(k - 1, 0), k, k + 1})
        if k <= 10**6:  # stay inside the documented ≤1e12 stratum-count domain
            vals.extend({k * k, max(k * k - 1, 0), k * k + 1})
    df = spark.createDataFrame([(v,) for v in sorted(set(vals))], "n long")
    got = df.select("n", exact_isqrt(F.col("n")).alias("s")).collect()
    assert all(r.s == math.isqrt(r.n) for r in got)


def test_temperature_plan_matches_python_and_is_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = {
        r.stratum: (r.n_docs, r.sqrt_n, r.rate_ppm)
        for r in plan_temperature(docs, 100, strata_col="lang").collect()
    }
    counts = {
        r.lang: r.c
        for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    s_total = sum(math.isqrt(n) for n in counts.values())
    for lang, n in counts.items():
        f = math.isqrt(n)
        want = min(10**6, (10**6 * 100 * f) // (s_total * n))
        assert plan[lang] == (n, f, want)
    # kept set is a pure function of doc_id — invariant under repartition
    a = {r.doc_id for r in sample_temperature(docs, 100, strata_col="lang").collect()}
    b = {
        r.doc_id
        for r in sample_temperature(
            docs.repartition(13, "doc_id"), 100, strata_col="lang"
        ).collect()
    }
    assert a == b and len(a) > 0
    # rebalancing: every stratum keeps at least one doc at this budget and
    # head strata are flattened — max/min kept ratio well under raw ratio
    kept = (
        sample_temperature(docs, 100, strata_col="lang")
        .groupBy("lang")
        .agg(F.count("*").alias("k"))
        .collect()
    )
    assert len(kept) == len(counts)


# ---------------------------------------------------------------------------
# attribute modularity
# ---------------------------------------------------------------------------


def _py_modularity(edges, labels):
    m = len(edges)
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    e_c: dict[str, int] = {}
    d_c: dict[str, int] = {}
    for a, b in edges:
        if labels[a] == labels[b]:
            e_c[labels[a]] = e_c.get(labels[a], 0) + 1
    for n, d in deg.items():
        d_c[labels[n]] = d_c.get(labels[n], 0) + d
    return sum(
        e_c.get(c, 0) / m - (d_c[c] / (2 * m)) ** 2 for c in d_c
    )


def test_modularity_crafted_two_communities(spark):
    # two 4-cliques joined by one bridge: strong positive Q
    edges = [
        (a, b)
        for grp in ([0, 1, 2, 3], [4, 5, 6, 7])
        for i, a in enumerate(grp)
        for b in grp[i + 1 :]
    ] + [(3, 4)]
    labels = {n: "A" if n < 4 else "B" for n in range(8)}
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(list(labels.items()), "node long, label string")
    row = attribute_modularity(e, lab).collect()[0]
    assert row.n_edges == 13 and row.n_communities == 2
    want = _py_modularity(edges, labels)
    assert row.q_num / row.q_den == pytest.approx(want, abs=1e-12)
    assert row.q == pytest.approx(want, abs=1e-6)
    assert row.q > 0.3


def test_modularity_random_graph_vs_reference(spark):
    rng = random.Random(5)
    nodes = list(range(40))
    edges = sorted(
        {
            (a, b)
            for _ in range(150)
            for a, b in [sorted(rng.sample(nodes, 2))]
        }
    )
    labels = {n: f"c{rng.randrange(4)}" for n in nodes}
    touched = {n for e in edges for n in e}
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(list(labels.items()), "node long, label string")
    row = attribute_modularity(e, lab).collect()[0]
    want = _py_modularity(edges, {n: labels[n] for n in touched})
    assert row.q_num / row.q_den == pytest.approx(want, abs=1e-12)
    assert row.n_edges == len(edges)


def test_modularity_cc_partition_identity(spark):
    """When the partition IS the connected components, every edge is
    internal, so Q = 1 − Σ_c (d_c/2m)² exactly."""
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (20, 21)]
    comp = {0: "x", 1: "x", 2: "x", 10: "y", 11: "y", 12: "y", 20: "z", 21: "z"}
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(list(comp.items()), "node long, label string")
    row = attribute_modularity(e, lab).collect()[0]
    m = len(edges)
    d_c = {"x": 6, "y": 4, "z": 2}
    want = 1 - sum((d / (2 * m)) ** 2 for d in d_c.values())
    assert row.q_num / row.q_den == pytest.approx(want, abs=1e-12)


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking
# ---------------------------------------------------------------------------


def test_sorted_neighborhood_matches_bruteforce(spark):
    from mmkg_rag_spark.operators.linkage import sorted_neighborhood_pairs

    rng = random.Random(3)
    rows = [(i, rng.randrange(50), rng.choice("pq")) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, key long, f string")
    w = 4
    got = {
        (r.id_a, r.id_b, r.gap, r.a_f, r.b_f)
        for r in sorted_neighborhood_pairs(
            df.repartition(7), "id", ["key"], w, field_cols=["f"]
        ).collect()
    }
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {
        (order[i][0], order[j][0], j - i, order[i][2], order[j][2])
        for i in range(len(order))
        for j in range(i + 1, min(i + w + 1, len(order)))
    }
    assert got == want
    assert len(want) == w * len(rows) - w * (w + 1) // 2


# ---------------------------------------------------------------------------
# modularity-greedy moves
# ---------------------------------------------------------------------------


def _py_modularity_move(edges, labels, rounds):
    """Plain-Python synchronous Louvain phase-1 reference (same spec)."""
    sym: dict[int, list[int]] = {}
    for a, b in edges:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    deg = {n: len(v) for n, v in sym.items()}
    m = len(edges)
    lab = {n: labels[n] for n in sym}
    for _ in range(rounds):
        new = {}
        tot: dict[str, int] = {}
        for n, k in deg.items():
            tot[lab[n]] = tot.get(lab[n], 0) + k
        for n in sym:
            kic: dict[str, int] = {}
            for nb in sym[n]:
                kic[lab[nb]] = kic.get(lab[nb], 0) + 1
            cands = set(kic) | {lab[n]}
            best = None
            for c in sorted(cands):
                score = 2 * m * kic.get(c, 0) - (
                    tot[c] - (deg[n] if c == lab[n] else 0)
                ) * deg[n]
                key = (score, 1 if c == lab[n] else 0)
                if best is None or key > best[0]:
                    best = (key, c)
            new[n] = best[1]
        lab = new
    return lab


def test_modularity_move_corrects_planted_mislabel(spark):
    from mmkg_rag_spark.operators.graph import modularity_move

    # two 4-cliques + bridge; node 3 starts mislabeled as 'B'
    edges = [
        (a, b)
        for grp in ([0, 1, 2, 3], [4, 5, 6, 7])
        for i, a in enumerate(grp)
        for b in grp[i + 1 :]
    ] + [(3, 4)]
    labels = {n: ("B" if n == 3 else ("A" if n < 4 else "B")) for n in range(8)}
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(list(labels.items()), "node long, label string")
    moved = {r.node: r.label for r in modularity_move(e, lab, rounds=1).collect()}
    assert moved[3] == "A"
    assert moved == _py_modularity_move(edges, labels, 1)
    # and the corrected partition has strictly higher modularity
    lab_after = spark.createDataFrame(list(moved.items()), "node long, label string")
    q_before = attribute_modularity(e, lab).collect()[0].q
    q_after = attribute_modularity(e, lab_after).collect()[0].q
    assert q_after > q_before


def test_modularity_move_matches_reference_on_random_graph(spark):
    from mmkg_rag_spark.operators.graph import modularity_move

    rng = random.Random(11)
    nodes = list(range(30))
    edges = sorted(
        {
            (a, b)
            for _ in range(90)
            for a, b in [sorted(rng.sample(nodes, 2))]
        }
    )
    labels = {n: f"c{rng.randrange(5)}" for n in nodes}
    touched = {n for e2 in edges for n in e2}
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(list(labels.items()), "node long, label string")
    for rounds in (1, 3):
        got = {
            r.node: r.label
            for r in modularity_move(e, lab, rounds=rounds).collect()
        }
        want = _py_modularity_move(edges, {n: labels[n] for n in touched}, rounds)
        assert got == want
