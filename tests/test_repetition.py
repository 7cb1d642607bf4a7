"""Golden tests for the Gopher-style repetition signals.

The sf testdata has single-line documents, so the line-level signals are
exercised here on planted multi-line fixtures with hand-computed expected
values; the n-gram signals get both hand-computed goldens and a DuckDB
cross-check through tools/check_oracle.py (query ``doc_repetition``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mmkg_rag_spark.functions import repetition as rep


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-rep")


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col(F.col("text")).alias("v")).collect()[0]["v"]


def test_dup_word_frac(spark):
    # 6 words, 4 distinct ("a" x2, "b" x2) -> 2/6
    assert _one(spark, "a b c a b d", rep.dup_word_frac) == pytest.approx(2 / 6)
    assert _one(spark, "x y z", rep.dup_word_frac) == 0.0
    assert _one(spark, "", rep.dup_word_frac) == 0.0


def test_top_ngram_argmax_and_tiebreak(spark):
    # "a b a b a" 2-grams: "a b" x2, "b a" x2 -> tie, lexicographically
    # smallest wins ("a b"), count 2, len 3, text len 9 -> 6/9
    s = _one(spark, "a b a b a", lambda c: rep.ngram_stats(c, 2))
    assert s["best"] == 2 and s["bestg"] == "a b"
    v = _one(spark, "a b a b a", lambda c: rep.top_ngram_char_frac(c, 2))
    assert v == pytest.approx(6 / 9)


def test_top_ngram_overlapping_can_exceed_one(spark):
    # "a a a a": "a a" x3, len 3, text len 7 -> 9/7 > 1 (documented)
    v = _one(spark, "a a a a", lambda c: rep.top_ngram_char_frac(c, 2))
    assert v == pytest.approx(9 / 7)


def test_dup_ngram_char_frac(spark):
    # 2-grams of "a b c a b": ["a b","b c","c a","a b"]; dup grams: "a b" x2
    # -> 2*3=6 chars / len 9
    v = _one(spark, "a b c a b", lambda c: rep.dup_ngram_char_frac(c, 2))
    assert v == pytest.approx(6 / 9)
    # no dups
    assert _one(spark, "a b c d", lambda c: rep.dup_ngram_char_frac(c, 2)) == 0.0


def test_short_doc_has_no_ngrams(spark):
    assert _one(spark, "solo", lambda c: rep.top_ngram_char_frac(c, 2)) == 0.0
    s = _one(spark, "solo", lambda c: rep.ngram_stats(c, 2))
    assert s["best"] == 0 and s["bestg"] == ""


def test_line_signals(spark):
    text = "intro line\nrepeat me\nrepeat me\n\n   \n- bullet one\n1. bullet two\nwait for it...\nrepeat me"
    # non-blank lines: 7 ("intro line", 3x "repeat me", 2 bullets, ellipsis)
    assert _one(spark, text, rep.line_count) == 7
    # dup lines: 7 total, 5 distinct -> 2/7
    assert _one(spark, text, rep.dup_line_frac) == pytest.approx(2 / 7)
    # duplicate chars: "repeat me" (9 chars) counted 3x, distinct once
    total = len("intro line") + 3 * 9 + len("- bullet one") + len("1. bullet two") + len("wait for it...")
    assert _one(spark, text, rep.dup_line_char_frac) == pytest.approx(18 / total)
    assert _one(spark, text, rep.ellipsis_line_frac) == pytest.approx(1 / 7)
    assert _one(spark, text, rep.bullet_line_frac) == pytest.approx(2 / 7)


def test_line_signals_empty(spark):
    for col in (rep.dup_line_frac, rep.dup_line_char_frac,
                rep.ellipsis_line_frac, rep.bullet_line_frac):
        assert _one(spark, "", col) == 0.0


def test_zero_shuffle_plan(spark):
    """The whole signal family must stay one map-side projection."""
    df = spark.createDataFrame([("a b a b",)], "text string")
    out = df.select(
        rep.dup_word_frac(F.col("text")),
        rep.top_ngram_char_frac(F.col("text"), 2),
        rep.dup_ngram_char_frac(F.col("text"), 5),
        rep.dup_line_frac(F.col("text")),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
