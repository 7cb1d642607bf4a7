"""Session-9/10 additions: PMI collocations, Misra-Gries heavy hitters,
and BPE tokenizer training/encoding. Oracle parity at three SFs runs via
tools/check_oracle.py; these are semantics-level invariants on synthetic
micro-inputs (exact, hand-checkable).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-s9ops"
    )


# ------------------------------------------- pmi_collocations


def test_pmi_planted_collocation(spark):
    """'san francisco' co-occurring twice is the only pair surviving
    min_count=2, with lift hand-computed: (2*8*8)/(6*2*2) = 16/3."""
    from mmkg_rag_spark.operators.relevance import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "san francisco is big"), (2, "i love san francisco")],
        ["doc_id", "text"],
    )
    rows = pmi_collocations(docs, min_count=2, k=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.lt, r.rt, r.pair_cnt, r.left_cnt, r.right_cnt) == (
        "san", "francisco", 2, 2, 2,
    )
    assert r.lift == pytest.approx(round(128.0 / 24.0, 6), abs=0)


def test_pmi_bigrams_stay_within_documents(spark):
    """Bigrams never span document boundaries: two one-word docs
    produce zero pairs."""
    from mmkg_rag_spark.operators.relevance import pmi_collocations

    docs = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    assert pmi_collocations(docs, min_count=1, k=10).count() == 0


def test_pmi_tiebreak_deterministic(spark):
    """Equal-lift pairs are cut by (lt, rt) — the top-k boundary cannot
    depend on partitioning."""
    from mmkg_rag_spark.operators.relevance import pmi_collocations

    # Four disjoint pairs, each appearing twice with identical statistics.
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b", "a b", "c d", "c d", "e f", "e f", "g h", "g h"]
        )],
        ["doc_id", "text"],
    )
    rows = pmi_collocations(docs, min_count=2, k=2).collect()
    assert [(r.lt, r.rt) for r in rows] == [("a", "b"), ("c", "d")]


# ------------------------------------------- heavy hitters


def _hh_docs(spark, n_docs=20):
    # Per doc: 'x' six times plus four singletons -> x share = 0.6.
    return spark.createDataFrame(
        [(i, "x x x x x x a b c d") for i in range(n_docs)],
        ["doc_id", "text"],
    )


def test_heavy_hitters_exact_with_evicting_sketch(spark):
    """k=2 counters over a 5-term vocabulary forces MG evictions, yet the
    final answer is the exact phi-frequent set (share > 1/3): just 'x'."""
    from mmkg_rag_spark.functions.heavyhitters import heavy_hitters

    rows = heavy_hitters(_hh_docs(spark), k=2).collect()
    assert [(r.term, r.cnt, r.n_tokens, r.share_ppm) for r in rows] == [
        ("x", 120, 200, 600000)
    ]


def test_mg_candidates_superset_property(spark):
    """The MG pass may over-nominate but never misses a term whose global
    share exceeds 1/(k+1) — even with k=1 (majority-vote degenerate)."""
    from mmkg_rag_spark.functions.heavyhitters import (
        misra_gries_candidates,
    )

    toks = (
        _hh_docs(spark)
        .select(F.explode(F.split("text", " ")).alias("term"))
        .repartition(7)
    )
    cands = {r.term for r in misra_gries_candidates(toks, k=1).collect()}
    assert "x" in cands


def test_heavy_hitters_partition_invariant(spark):
    """Result identical under a different input partitioning (the sketch
    nomination varies; the exact recount doesn't)."""
    from mmkg_rag_spark.functions.heavyhitters import heavy_hitters

    a = heavy_hitters(_hh_docs(spark), k=2).collect()
    b = heavy_hitters(_hh_docs(spark).repartition(13), k=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------- BPE


BPE_CORPUS = "low low low lower lower newest newest newest newest widest"


def test_bpe_first_merge_is_classic(spark):
    """On the textbook corpus (low x3, lower x2, newest x4, widest x1) the
    first merge is (w, e) with pair count 6 = 2 (lower) + 4 (newest)."""
    from mmkg_rag_spark.functions import bpe

    docs = spark.createDataFrame([(1, BPE_CORPUS)], ["doc_id", "text"])
    wc = bpe.word_counts(docs)
    merges, stats = bpe.train_bpe(wc, n_merges=3, min_pair_count=1)
    assert merges[0] == (1, "w", "e", 6)
    assert stats["words_dropped"] == 0 and stats["tokens_dropped"] == 0


def test_bpe_train_partition_invariant(spark):
    """Merges are a pure function of the word-frequency table, so input
    partitioning cannot change them."""
    from mmkg_rag_spark.functions import bpe

    docs = spark.createDataFrame(
        [(i, BPE_CORPUS) for i in range(6)], ["doc_id", "text"]
    )
    m1, _ = bpe.train_bpe(bpe.word_counts(docs), n_merges=8, min_pair_count=1)
    m2, _ = bpe.train_bpe(
        bpe.word_counts(docs.repartition(5)), n_merges=8, min_pair_count=1
    )
    assert m1 == m2


def test_bpe_encode_matches_pure_python(spark):
    """Distributed encode equals a driver-side recount with encode_word:
    the memoized mapInPandas path introduces no drift."""
    from mmkg_rag_spark.functions import bpe

    docs = spark.createDataFrame(
        [(1, BPE_CORPUS), (2, "newest low"), (3, "")], ["doc_id", "text"]
    )
    merges, _ = bpe.train_bpe(bpe.word_counts(docs), n_merges=5, min_pair_count=1)
    ranks = {(a, b): r for r, a, b, _ in merges}
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe.encode_bpe(docs, merges).collect()
    }
    for doc_id, text in [(1, BPE_CORPUS), (2, "newest low"), (3, "")]:
        words = [w for w in text.split(" ") if w]
        want = (
            len(words),
            sum(len(bpe.encode_word(w, ranks)) for w in words),
        )
        assert got[doc_id] == want, doc_id


def test_bpe_vocab_cap_disclosed(spark):
    """Capping the word table drops the rare tail and DISCLOSES exactly
    how many words/tokens the cap removed (no-silent-caps rule)."""
    from mmkg_rag_spark.functions import bpe

    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc")], ["doc_id", "text"]
    )
    _, stats = bpe.train_bpe(
        bpe.word_counts(docs), n_merges=2, min_pair_count=1, max_vocab_words=2
    )
    assert stats["words_kept"] == 2
    assert stats["words_dropped"] == 1
    assert stats["tokens_dropped"] == 1  # the single 'cc'


def test_bpe_merge_rank_order_equals_lowest_rank_first():
    """encode_word (lowest-rank-first) agrees with sequential rank-order
    application — the equivalence the SQL oracle's replace chain relies
    on — including on adjacent/overlapping occurrences."""
    from mmkg_rag_spark.functions.bpe import END, _apply_merge, encode_word

    merges = [(1, "a", "b", 0), (2, "ab", "ab", 0), (3, "abab", END, 0)]
    ranks = {(a, b): r for r, a, b, _ in merges}
    for word in ["abab", "ababab", "aabb", "ba", "abba"]:
        syms = tuple(word) + (END,)
        for _, a, b, _c in merges:
            syms = _apply_merge(syms, (a, b))
        assert list(syms) == encode_word(word, ranks), word


# ------------------------------------------- Count-Min Sketch


def _cms_toks(spark):
    # 12 distinct terms, skewed counts; term t{i} appears i+1 times.
    rows = [(f"g{i % 2}", f"t{i}") for i in range(12) for _ in range(i + 1)]
    return spark.createDataFrame(rows, ["g", "term"])


def test_cms_one_sided_under_forced_collisions(spark):
    """width=4 over 12 distinct terms forces register collisions: every
    estimate must still be >= the exact count (the CMS one-sided
    guarantee), and at least one term must actually overcount — proving
    the test exercises the collision path, not a lossless sketch."""
    from mmkg_rag_spark.functions import cms

    toks = _cms_toks(spark)
    regs = cms.cms_registers(toks, "term", depth=2, width=4)
    exact = {r.term: r.cnt for r in toks.groupBy("term").count().withColumnRenamed("count", "cnt").collect()}
    est = {
        r.term: r.cnt_est
        for r in cms.cms_estimate(
            regs, toks.select("term").distinct(), "term", depth=2, width=4
        ).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    assert any(est[t] > exact[t] for t in exact)


def test_cms_registers_mergeable(spark):
    """sketch(A union B) == sketch(A) + sketch(B) register-wise: merging
    the per-group register tables equals sketching the whole input."""
    from mmkg_rag_spark.functions import cms

    toks = _cms_toks(spark)
    merged = cms.cms_merge(
        cms.cms_registers(toks, "term", depth=3, width=8, group_cols=["g"])
    )
    whole = cms.cms_registers(toks, "term", depth=3, width=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_partition_invariant(spark):
    """Registers and estimates are pure functions of the multiset of
    keys — input partitioning cannot change them."""
    from mmkg_rag_spark.functions import cms

    a = cms.cms_registers(_cms_toks(spark), "term").collect()
    b = cms.cms_registers(_cms_toks(spark).repartition(17), "term").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------- KMV distinct sketch


def test_kmv_exact_below_k(spark):
    """Sets that never fill the signature are counted exactly — estimate
    == true distinct, intersection == true intersection."""
    from mmkg_rag_spark.functions import kmv

    rows = [("a", i) for i in range(10)] + [("b", i) for i in range(5, 15)]
    df = spark.createDataFrame(rows, ["g", "uid"])
    sigs = kmv.kmv_signatures(df, "uid", ["g"], k=32)
    est = {r.g: r.n_distinct_est for r in kmv.kmv_estimates(sigs, ["g"], k=32).collect()}
    assert est == {"a": 10, "b": 10}
    ov = kmv.kmv_pair_overlap(sigs, "g", k=32).collect()
    assert len(ov) == 1
    assert (ov[0].est_union, ov[0].est_inter) == (15, 5)


def test_kmv_estimate_within_band_above_k(spark):
    """1000 distinct keys with k=32: the (k-1)/kth estimator lands within
    the ~3-sigma KMV band (sigma ~ 1/sqrt(k-2) ~ 18%)."""
    from mmkg_rag_spark.functions import kmv

    df = spark.createDataFrame([("a", i) for i in range(1000)], ["g", "uid"])
    sigs = kmv.kmv_signatures(df, "uid", ["g"], k=32)
    est = kmv.kmv_estimates(sigs, ["g"], k=32).collect()[0].n_distinct_est
    assert 450 <= est <= 1550, est


def test_kmv_signatures_mergeable(spark):
    """sig(A union B) == k smallest of sig(A) union sig(B): merging
    signatures equals sketching the union — the property that lets
    signatures fold across partitions/days without touching raw keys."""
    from pyspark.sql import functions as F

    from mmkg_rag_spark.functions import kmv

    a = spark.createDataFrame([("g", i) for i in range(200)], ["g", "uid"])
    b = spark.createDataFrame([("g", i) for i in range(150, 400)], ["g", "uid"])
    direct = kmv.kmv_signatures(a.unionAll(b), "uid", ["g"], k=16)
    sig_union = (
        kmv.kmv_signatures(a, "uid", ["g"], k=16)
        .unionAll(kmv.kmv_signatures(b, "uid", ["g"], k=16))
        .distinct()
        .orderBy("h")
        .limit(16)
    )
    assert sorted(r.h for r in direct.collect()) == sorted(
        r.h for r in sig_union.collect()
    )


def test_kmv_intersection_tracks_true_overlap(spark):
    """Two 600-key sets overlapping in 300: the intersection estimate is
    in the right ballpark and bounded by the union estimate."""
    from mmkg_rag_spark.functions import kmv

    rows = [("a", i) for i in range(600)] + [("b", i) for i in range(300, 900)]
    df = spark.createDataFrame(rows, ["g", "uid"])
    sigs = kmv.kmv_signatures(df, "uid", ["g"], k=32)
    ov = kmv.kmv_pair_overlap(sigs, "g", k=32).collect()[0]
    # true union 900, true intersection 300
    assert 400 <= ov.est_union <= 1500, ov
    assert 0 < ov.est_inter <= ov.est_union
    assert 75 <= ov.est_inter <= 700, ov
