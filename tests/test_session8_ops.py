"""Session-8 additions: the six TPC-H-completion shapes (plan pins live
in test_plans.py; oracle parity at three SFs via tools/check_oracle.py)
and the ExactSubstr-style duplicate-window-span operator.

Semantics-level invariants on synthetic micro-inputs (exact,
hand-checkable).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-s8ops"
    )


# ------------------------------------------- duplicate_window_spans


def _spans(spark, rows, k=3, min_count=2):
    from mmkg_rag_spark.operators.textdedup import duplicate_window_spans

    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicate_window_spans(docs, k=k, min_count=min_count)
    return {
        (r.doc_id, r.span_start, r.span_end): (r.dup_tokens, r.n_windows)
        for r in out.collect()
    }


def test_dup_spans_planted_cross_doc_duplicate(spark):
    """A 5-token passage planted in two docs at different offsets marks
    exactly that passage in both (k=3 ⇒ 3 windows merge into one
    maximal span of 5 tokens)."""
    passage = "the quick brown fox jumps"
    rows = [
        (1, f"alpha beta {passage} gamma delta"),
        (2, f"{passage} epsilon zeta eta theta iota"),
    ]
    spans = _spans(spark, rows, k=3)
    # doc 1: passage occupies token positions 2..6 → span [2, 7)
    assert spans == {
        (1, 2, 7): (5, 3),
        (2, 0, 5): (5, 3),
    }


def test_dup_spans_merge_adjacent_and_split_on_gap(spark):
    """Two duplicated 3-grams separated by a unique token in one doc
    produce TWO spans (gap > k ⇒ islands split); back-to-back
    duplicated windows merge into one."""
    rows = [
        (1, "a b c UNIQ1 x y z"),
        (2, "a b c p q r s x y z"),
        # make both 3-grams corpus-duplicates
    ]
    spans = _spans(spark, rows, k=3)
    assert (1, 0, 3) in spans and (1, 4, 7) in spans
    assert (2, 0, 3) in spans and (2, 7, 10) in spans


def test_dup_spans_in_doc_repetition_counts(spark):
    """min_count counts ALL occurrences (ExactSubstr semantics): a
    passage repeated within ONE doc is marked even with no second
    document."""
    rows = [(1, "m n o filler1 m n o"), (2, "totally different words here")]
    spans = _spans(spark, rows, k=3)
    assert (1, 0, 3) in spans and (1, 4, 7) in spans
    assert not any(d == 2 for d, _, _ in spans)


def test_dup_spans_no_false_positives(spark):
    """All-unique corpus → zero spans."""
    rows = [(1, "one two three four"), (2, "five six seven eight")]
    assert _spans(spark, rows, k=3) == {}


def test_dup_spans_short_docs_skipped(spark):
    """Docs shorter than k tokens emit no windows and never crash."""
    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, "a b c d"), (4, "a b c d")]
    spans = _spans(spark, rows, k=3)
    assert set(spans) == {(3, 0, 4), (4, 0, 4)}


def test_dup_spans_plan_two_uniform_shuffles(spark):
    """The 100-TB shape: exactly two hash exchanges (window-hash count
    + per-doc island merge; the span aggregate reuses the doc_id
    partitioning), no join, no cartesian."""
    import __spark_entry__ as se

    df = se.q_dup_substring_spans(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------- cut_duplicate_spans


def test_cut_spans_exact_reconstruction(spark):
    """The cut rebuilds exactly the uncovered tokens: planted passage
    removed from both docs, unique remainder preserved in order; a doc
    that is ONE duplicated span cuts to the empty string (md5(''))."""
    import hashlib

    from mmkg_rag_spark.operators.textdedup import cut_duplicate_spans

    passage = "the quick brown fox jumps"
    rows = [
        (1, f"alpha beta {passage} gamma delta"),
        (2, f"{passage} epsilon zeta"),
        (3, passage),  # fully duplicated -> empty after cut
        (4, "entirely unique content here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.n_tokens, r.n_kept, r.clean_md5)
        for r in cut_duplicate_spans(docs, k=3).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1] == (9, 4, md5("alpha beta gamma delta"))
    assert out[2] == (7, 2, md5("epsilon zeta"))
    assert out[3] == (5, 0, md5(""))
    assert out[4] == (4, 4, md5("entirely unique content here"))


# ------------------------------------------------ semdedup_survivors


def test_semdedup_min_id_survivor_per_near_dup_group(spark):
    """Two near-identical vectors in the same cluster keep only the
    smaller id; the distant vector and the other cluster survive."""
    from mmkg_rag_spark.operators.ann import semdedup_survivors

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.01]),   # cos(1,2) ≈ 1 → dropped (id 2 > 1)
        (3, [0.0, 1.0]),      # orthogonal to 1/2 → survives
        (4, [-1.0, 0.0]),     # own cluster → survives
    ]
    docs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semdedup_survivors(docs, n_lists=2, kmeans_iters=1, tau=0.9)
    assert {r.vec_id for r in out.collect()} == {1, 3, 4}


def test_semdedup_tau_one_keeps_everything_but_exact_dups(spark):
    """τ just above every pairwise cosine keeps the full corpus."""
    from mmkg_rag_spark.operators.ann import semdedup_survivors

    rows = [(i, [float(i + 1), float((i * 7) % 5)]) for i in range(6)]
    docs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semdedup_survivors(docs, n_lists=2, kmeans_iters=1, tau=1.0000001)
    assert out.count() == 6


def test_spans_and_cut_reconcile_on_random_corpus(spark):
    """Cross-operator invariant on a seeded random corpus engineered to
    be duplicate-heavy (tiny vocab): per doc, the merged spans are
    disjoint, sorted, within bounds, each ≥ k tokens — and the CUT's
    kept count equals n_tokens minus the spans' covered tokens, i.e.
    coverage(union of windows) == union(merged spans), tying the two
    operators together exactly."""
    import random

    from mmkg_rag_spark.operators.textdedup import (
        cut_duplicate_spans,
        duplicate_window_spans,
    )

    rng = random.Random(0)
    vocab = [f"w{i}" for i in range(7)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    k = 3
    spans = duplicate_window_spans(docs, k=k).collect()
    per_doc: dict[int, list] = {}
    for r in spans:
        per_doc.setdefault(r.doc_id, []).append(r)
    n_toks = {i: len(t.split()) for i, t in rows}
    covered = {}
    for doc_id, ss in per_doc.items():
        ss.sort(key=lambda r: r.span_start)
        prev_end = -1
        for r in ss:
            assert 0 <= r.span_start < r.span_end <= n_toks[doc_id]
            assert r.dup_tokens == r.span_end - r.span_start >= k
            assert r.n_windows >= 1
            assert r.span_start > prev_end, "spans must be disjoint, gap ≥ 1"
            prev_end = r.span_end
        covered[doc_id] = sum(r.dup_tokens for r in ss)
    cut = {r.doc_id: r for r in cut_duplicate_spans(docs, k=k).collect()}
    assert set(cut) == set(n_toks)
    for doc_id, r in cut.items():
        assert r.n_tokens == n_toks[doc_id]
        assert r.n_kept == r.n_tokens - covered.get(doc_id, 0)


# ------------------------------------------------ leakage_safe_split


def test_split_duplicates_never_straddle(spark):
    """Byte-identical (post-normalization) duplicates always land in the
    same split, keyed by the min doc_id of the group; split values are
    exhaustive."""
    from mmkg_rag_spark.operators.curation import leakage_safe_split

    rows = [
        (1, "Shared   Text here"),
        (7, "shared text HERE"),   # same fingerprint as 1 (normalized)
        (3, "unique one"),
        (4, "unique two"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.keep_id, r.split) for r in
           leakage_safe_split(docs).collect()}
    assert out[1] == out[7]            # same rep, same split
    assert out[1][0] == 1
    assert {v[1] for v in out.values()} <= {"train", "val", "test"}


def test_split_is_partition_invariant(spark):
    """The assignment is a pure function of (rep, seed): identical under
    a different partitioning of the same input."""
    from mmkg_rag_spark.operators.curation import leakage_safe_split

    rows = [(i, f"doc number {i}") for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {r.doc_id: r.split for r in leakage_safe_split(docs).collect()}
    b = {r.doc_id: r.split for r in
         leakage_safe_split(docs.repartition(17)).collect()}
    assert a == b
    # 98/1/1 ppm thresholds: train dominates on 200 unique docs
    from collections import Counter

    c = Counter(a.values())
    assert c["train"] > 180


# ------------------------------------------- TPC-H completion shapes


def test_q6_single_row_global_aggregate(spark):
    """The Q6 global aggregate returns exactly one row with a
    non-negative count — the no-GROUP-BY shape the SQL-oracle twin
    relies on."""
    import __spark_entry__ as se

    df = se.q_discount_revenue_delta(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].n_items >= 0


def test_q2_every_part_keeps_only_minimum_offers(spark):
    """Per part, every surviving row's best_price equals the part's
    minimum (ties all kept, never arbitrarily broken)."""
    import __spark_entry__ as se

    df = se.q_min_cost_supplier(spark, "/root/testdata/sf0.01")
    bad = (
        df.groupBy("p_partkey")
        .agg(F.min("best_price").alias("mn"), F.max("best_price").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .count()
    )
    assert bad == 0


def test_q20_winners_subset_of_nation_suppliers(spark):
    """Every emitted supplier belongs to the target nation."""
    import __spark_entry__ as se

    df = se.q_promo_part_suppliers(spark, "/root/testdata/sf0.01")
    s = se._t(spark, "/root/testdata/sf0.01", "supplier")
    n = se._t(spark, "/root/testdata/sf0.01", "nation").filter(
        F.col("n_name") == se._Q20_NATION
    )
    nation_supps = {
        r.s_suppkey
        for r in s.join(n, s["s_nationkey"] == n["n_nationkey"]).collect()
    }
    out = {r.s_suppkey for r in df.collect()}
    assert out <= nation_supps
