"""Session-12 additions: deterministic random-walk sampling and RAKE
keyphrase mining. Oracle parity at three SFs runs via
tools/check_oracle.py; these are semantics-level invariants on synthetic
micro-inputs (exact, hand-checkable) plus plain-Python reference parity.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-s12ops"
    )


# ------------------------------------------- random_walks


def _py_walks(edges, seeds, n_walks, n_steps, salt=42, undirected=True):
    """Plain-Python reference: same md5 draw over the sorted adjacency."""
    adj: dict = {}
    es = set()
    for s, d in edges:
        es.add((s, d))
        if undirected:
            es.add((d, s))
    for s, d in sorted(es):
        adj.setdefault(s, []).append(d)
    out = []
    for seed in seeds:
        for w in range(n_walks):
            cur = seed
            out.append((seed, w, 0, cur))
            for t in range(1, n_steps + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                key = f"{seed}|{w}|{salt}|{t}|{cur}"
                draw = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
                cur = nbrs[draw % len(nbrs)]
                out.append((seed, w, t, cur))
    return sorted(out)


EDGES = [
    (0, 1), (0, 3), (1, 2), (2, 3), (2, 5), (4, 5), (4, 1), (5, 0),
]


def test_random_walks_match_python_reference(spark):
    from mmkg_rag_spark.operators.graph import random_walks

    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = sorted(
        tuple(r) for r in random_walks(e, [0, 2, 4], 3, 5).collect()
    )
    assert got == _py_walks(EDGES, [0, 2, 4], 3, 5)


def test_random_walks_steps_follow_edges(spark):
    """Every consecutive (step t-1 → t) pair of a walk is a graph edge."""
    from mmkg_rag_spark.operators.graph import random_walks

    e = spark.createDataFrame(EDGES, "src long, dst long")
    rows = random_walks(e, [0, 1], 2, 4).collect()
    pos = {(r.seed, r.walk, r.step): r.node for r in rows}
    und = {(s, d) for s, d in EDGES} | {(d, s) for s, d in EDGES}
    for (seed, walk, step), node in pos.items():
        if step == 0:
            assert node == seed
        else:
            assert (pos[(seed, walk, step - 1)], node) in und


def test_random_walks_partitioning_invariant(spark):
    """The walk table is a pure function of the graph — identical under
    any input partitioning and under the non-broadcast join path."""
    from mmkg_rag_spark.operators.graph import random_walks

    e1 = spark.createDataFrame(EDGES, "src long, dst long")
    e13 = e1.repartition(13)
    a = sorted(tuple(r) for r in random_walks(e1, [0, 4], 2, 4).collect())
    b = sorted(tuple(r) for r in random_walks(e13, [0, 4], 2, 4).collect())
    c = sorted(
        tuple(r)
        for r in random_walks(e13, [0, 4], 2, 4, broadcast_walks=0).collect()
    )
    assert a == b == c


def test_random_walks_dead_end_truncates(spark):
    """Directed walk hitting a sink stops: rows exist only up to the sink
    step (bounded output, never a null/loop)."""
    from mmkg_rag_spark.operators.graph import random_walks

    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    rows = random_walks(e, [0], 1, 5, undirected=False).collect()
    # 0 -> 1 -> 2 (sink): steps 0,1,2 only
    assert sorted((r.step, r.node) for r in rows) == [(0, 0), (1, 1), (2, 2)]


# ------------------------------------------- rake_keyphrases


def _py_rake(texts, n_breakers, max_words, k):
    from collections import Counter

    toks_per_doc = [[t for t in tx.split(" ") if t] for tx in texts]
    freq = Counter(t for toks in toks_per_doc for t in toks)
    breakers = set(
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:n_breakers]
    )
    phrases = []
    for toks in toks_per_doc:
        run: list[str] = []
        for t in toks + ["\x00stop"]:
            if t in breakers or t == "\x00stop":
                if run and len(run) <= max_words:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(t)
    deg: Counter = Counter()
    for p in phrases:
        for w in p:
            deg[w] += len(p)
    stats = Counter(phrases)
    out = []
    for p, n_occ in stats.items():
        score = sum(deg[w] for w in set(p))
        out.append((" ".join(p), len(p), n_occ, score))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:k]


def test_rake_matches_python_reference(spark):
    from mmkg_rag_spark.operators.relevance import rake_keyphrases

    texts = [
        "the quick brown fox the lazy dog the quick brown fox",
        "a quick brown fox jumps over a lazy dog a a",
        "the dog the fox the quick quick brown fox dog dog",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [
        (r.phrase, r.n_words, r.n_occ, r.score)
        for r in rake_keyphrases(
            docs, n_breakers=2, max_words=3, k=50
        ).collect()
    ]
    assert got == _py_rake(texts, 2, 3, 50)


def test_rake_cap_drops_long_runs_everywhere(spark):
    """A run longer than max_words contributes NOTHING — not a phrase,
    and none of its occurrences feed word degrees (declared semantic)."""
    from mmkg_rag_spark.operators.relevance import rake_keyphrases

    # breakers = top-1 = 'x'; doc 1 has a 4-token run (dropped at cap 3),
    # doc 2 a 2-token run sharing the word 'b'.
    docs = spark.createDataFrame(
        [(1, "x a b c d x"), (2, "x b e x x x")], ["doc_id", "text"]
    )
    rows = rake_keyphrases(docs, n_breakers=1, max_words=3, k=10).collect()
    assert [(r.phrase, r.n_words, r.n_occ, r.score) for r in rows] == [
        ("b e", 2, 1, 4)
    ]


def test_rake_partitioning_invariant(spark):
    from mmkg_rag_spark.operators.relevance import rake_keyphrases

    texts = ["%s w%d w%d" % ("the", i % 5, (i * 3) % 7) for i in range(40)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    a = [tuple(r) for r in rake_keyphrases(docs, k=30).collect()]
    b = [
        tuple(r)
        for r in rake_keyphrases(docs.repartition(11), k=30).collect()
    ]
    assert a == b


# ------------------------------------------- customer_rfm_segments


def test_rfm_quartiles_balanced_and_partition_invariant(spark):
    """Each RFM dimension's quartiles differ in size by at most 1 (exact
    SQL ntile contract via ranks.global_ntile), and the segment table is
    identical under any input partitioning."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as se

    sf = "/root/testdata/sf0.001"
    out = se.q_customer_rfm_segments(spark, sf)
    rows = out.collect()
    for dim in ("r_q", "f_q", "m_q"):
        per = {}
        for r in rows:
            per[r[dim]] = per.get(r[dim], 0) + r.n_customers
        assert set(per) == {1, 2, 3, 4}
        assert max(per.values()) - min(per.values()) <= 1
    total = sum(r.n_customers for r in rows)
    n_cust = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .select("o_custkey").distinct().count()
    )
    assert total == n_cust
