"""Lexical relevance (TF-IDF/BM25/inverted index) + funnel/range-join ops.

Semantics-level unit tests on tiny hand-checkable inputs; the sf0.01
DuckDB oracle parity for the same six queries is covered by the driver
harness (tools/check_oracle.py — doc_tfidf_topk, bm25_search,
inverted_index, events_funnel, events_json_extract, events_range_join).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from mmkg_rag_spark.operators.relevance import (
    bm25_search,
    inverted_index,
    tfidf_topk,
)
from mmkg_rag_spark.operators.temporal import (
    funnel_counts,
    funnel_stages,
    range_join,
)


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-rel")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry durian"),
            (3, "apple apple apple banana"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_ranks_rare_heavy_terms_first(spark, docs):
    rows = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: durian is unique to it (df=1) -> highest idf; cherry has tf=2
    d2 = sorted(by_doc[2], key=lambda r: r.rank)
    n, df_d, df_c = 3, 1, 2
    idf_d = math.log((n + 1) / (df_d + 1)) + 1
    idf_c = math.log((n + 1) / (df_c + 1)) + 1
    expect_first = "durian" if idf_d > 2 * idf_c else "cherry"
    assert d2[0].term == expect_first
    assert d2[0].tfidf == round(
        (1 * idf_d) if expect_first == "durian" else (2 * idf_c), 6
    )
    # deterministic ties: doc 3 has apple(3) then banana(1)
    d3 = sorted(by_doc[3], key=lambda r: r.rank)
    assert [r.term for r in d3] == ["apple", "banana"]


def test_bm25_manual_score_single_term(spark, docs):
    out = bm25_search(docs, ["durian"], k=3).collect()
    assert [r.doc_id for r in out] == [2]
    n, df, tf, dl, avgdl, k1, b = 3, 1, 1, 4, 4.0, 1.2, 0.75
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    s = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert out[0].score == pytest.approx(round(s, 6), abs=1e-6)
    assert out[0].n_terms_hit == 1


def test_bm25_topk_order_deterministic(spark, docs):
    out = bm25_search(docs, ["apple", "banana"], k=3).collect()
    # doc3 (apple tf=3 + banana) must outrank doc1 (apple tf=2 + banana)
    assert out[0].doc_id == 3
    assert {r.doc_id for r in out} == {1, 2, 3}
    assert out[0].score > out[1].score >= out[2].score


def test_inverted_index_postings_sorted_numerically(spark):
    docs = spark.createDataFrame(
        [(i, "zed common") if i != 10 else (i, "zed only") for i in [1, 2, 10]],
        "doc_id long, text string",
    )
    rows = {r.term: r for r in inverted_index(docs, min_df=1).collect()}
    # numeric order (1,2,10), not lexicographic ('1','10','2')
    assert list(rows["zed"].postings) == [1, 2, 10]
    assert rows["zed"].df == 3
    assert list(rows["common"].postings) == [1, 2]
    assert inverted_index(docs, min_df=3).count() == 1  # only 'zed'


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def events(spark):
    # u1 completes the funnel in order; u2 clicks BEFORE signup (must not
    # count as stage 2); u3 signs up only; u4 has click ts == signup ts
    # (inclusive ties: counts)
    rows = [
        (1, _ts(0), "signup"), (1, _ts(10), "click"), (1, _ts(20), "purchase"),
        (2, _ts(5), "click"), (2, _ts(6), "signup"), (2, _ts(7), "purchase"),
        (3, _ts(1), "signup"),
        (4, _ts(2), "signup"), (4, _ts(2), "click"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string"
    )


def test_funnel_stage_order_enforced(spark, events):
    st = {r.user_id: r for r in funnel_stages(events, ["signup", "click", "purchase"]).collect()}
    assert st[1].t_1 == _ts(0) and st[1].t_2 == _ts(10) and st[1].t_3 == _ts(20)
    # u2: click precedes signup -> no stage 2, hence no stage 3 even though
    # a purchase exists after signup
    assert st[2].t_1 == _ts(6) and st[2].t_2 is None and st[2].t_3 is None
    assert st[3].t_2 is None
    # u4: equal-timestamp tie is inclusive
    assert st[4].t_2 == _ts(2)


def test_funnel_counts_conversion(spark, events):
    rows = {r.step: r for r in funnel_counts(events, ["signup", "click", "purchase"]).collect()}
    assert rows[1].n_users == 4
    assert rows[2].n_users == 2  # u1, u4
    assert rows[3].n_users == 1  # u1
    assert rows[2].conv_from_first == 0.5
    assert rows[1].conv_from_first == 1.0


def test_range_join_boundaries_and_buckets(spark):
    # interval [100s, 200s) for u1; points at 99 (out), 100 (in, inclusive
    # start), 199 (in), 200 (out, exclusive end); u2 point inside u1's
    # window must NOT match (key isolation)
    base = dt.datetime(2024, 1, 1)
    mk = lambda s: base + dt.timedelta(seconds=s)
    iv = spark.createDataFrame(
        [(1, mk(100), mk(200))],
        "user_id long, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )
    pt = spark.createDataFrame(
        [(1, mk(99)), (1, mk(100)), (1, mk(199)), (1, mk(200)), (2, mk(150))],
        "user_id long, ts timestamp_ntz",
    )
    # bucket width smaller than the interval -> interval spans >1 bucket
    out = range_join(pt, iv, ["user_id"], bucket_seconds=30).collect()
    assert sorted(r.ts for r in out) == [mk(100), mk(199)]
    # bucket width much larger than the interval also works
    out2 = range_join(pt, iv, ["user_id"], bucket_seconds=86400).collect()
    assert sorted(r.ts for r in out2) == [mk(100), mk(199)]


def test_range_join_overlapping_intervals_preserve_duplicates(spark):
    base = dt.datetime(2024, 1, 1)
    mk = lambda s: base + dt.timedelta(seconds=s)
    iv = spark.createDataFrame(
        [(1, mk(0), mk(100)), (1, mk(50), mk(150))],
        "user_id long, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )
    pt = spark.createDataFrame([(1, mk(75))], "user_id long, ts timestamp_ntz")
    assert range_join(pt, iv, ["user_id"], bucket_seconds=60).count() == 2


def test_ngram_counts_bigrams_and_trigrams(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b  x")],  # double space -> empty token dropped
        "doc_id long, text string",
    )
    bg = {r.ngram: r.n_occurrences for r in
          __import__("mmkg_rag_spark.operators.relevance", fromlist=["ngram_counts"])
          .ngram_counts(docs, n=2).collect()}
    assert bg == {"a b": 3, "b a": 1, "b c": 1, "b x": 1}
    tg = {r.ngram: r.n_occurrences for r in
          __import__("mmkg_rag_spark.operators.relevance", fromlist=["ngram_counts"])
          .ngram_counts(docs, n=3).collect()}
    assert tg == {"a b a": 1, "b a b": 1, "a b c": 1, "a b x": 1}
    # doc shorter than n contributes nothing (and doesn't error)
    short = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    from mmkg_rag_spark.operators.relevance import ngram_counts

    assert ngram_counts(short, n=2).count() == 0


def test_rare_ngram_score_semantics(spark):
    from mmkg_rag_spark.operators.relevance import rare_ngram_score

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # all bigrams common within corpus
            (2, "a b a b"),              # shares doc 1's bigrams
            (3, "q w e r t y"),          # every bigram corpus-unique
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in rare_ngram_score(docs, n=2, rare_max=1).collect()}
    # doc 3 is pure gibberish under the corpus LM: every bigram rare
    assert rows[3].rare_frac == 1.0 and rows[3].n_rare == rows[3].n_ngrams == 5
    # docs 1/2's bigrams all occur >= 2 times corpus-wide
    assert rows[1].rare_frac == 0.0 and rows[2].rare_frac == 0.0
    # mean corpus frequency: doc 2's bigrams 'a b'(x5 corpus),'b a'(x3)
    assert rows[2].n_ngrams == 3
    assert rows[2].avg_freq == round((5 + 3 + 5) / 3, 4)


def test_bfs_distances_semantics(spark):
    from mmkg_rag_spark.operators.graph import bfs_distances

    # a-b-c-d chain + shortcut a-c: dist(c) must be 1 (min, not path order);
    # x-y disconnected; directed edge d->z ignored upstream when undirected
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("x", "y")],
        "src string, dst string",
    )
    d = {r.node: r.dist for r in bfs_distances(e, ["a"], 2).collect()}
    assert d == {"a": 0, "b": 1, "c": 1, "d": 2}
    # multi-source: nearest seed wins
    d2 = {r.node: r.dist for r in bfs_distances(e, ["a", "d"], 1).collect()}
    assert d2 == {"a": 0, "d": 0, "b": 1, "c": 1}
    # directed mode: no backward reach
    d3 = {r.node: r.dist for r in
          bfs_distances(e, ["b"], 3, undirected=False).collect()}
    assert d3 == {"b": 0, "c": 1, "d": 2}
