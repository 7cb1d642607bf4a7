"""Gopher-style repetition signals — native, zero-shuffle, per-document.

Web-scale training corpora are dominated by boilerplate and machine-generated
repetition; the Gopher corpus filters (Rae et al. 2021, "Scaling Language
Models", Table A1) remove documents whose content is internally repetitive.
The reference repo has no curation stage at all (it assumes curated input
pages, see `/root/reference/src/mmkg_rag/index/extractor.py` reading prepared
markdown) — at 10^12 Common-Crawl pages these signals are the gate that keeps
the KG extractor from burning LLM tokens on spam.

Every signal here is a single *native Catalyst expression* (higher-order
array functions — ``transform`` / ``filter`` / ``aggregate`` — over the
split text), so the whole family costs ONE map-side projection over the
scan: no explode, no groupBy, no Python, no shuffle at any scale. The
within-document n-gram frequency argmax — the part that naively needs an
explode + groupBy(doc, gram) shuffle — is instead computed as a run-length
scan over the *sorted* in-row gram array (O(L log L) per doc, L = gram
count), which keeps 100 TB of documents embarrassingly parallel.

Signal definitions (documented precisely because reimplementations of the
Gopher paper differ; the DuckDB oracle in ``__spark_entry__.py`` mirrors
these exactly):

- ``dup_word_frac``      = 1 - distinct(words)/count(words)
- ``top n-gram char frac`` = occurrences(most frequent word n-gram) *
  length(gram text incl. inner spaces) / length(document). Occurrences may
  overlap, so the value can exceed 1 on degenerate inputs ("a a a ...").
  Ties broken toward the lexicographically smallest gram (deterministic).
- ``dup n-gram char frac`` = sum over distinct n-grams occurring >1 time of
  occurrences * length(gram) / length(document). Overlapping occurrences
  are each counted (chars may be double-counted), matching the cheap
  single-pass variant used by public Gopher reimplementations.
- line signals: lines are ``split(text, '\\n')`` with blank lines dropped.
  ``dup_line_frac``      = 1 - distinct(lines)/count(lines)
  ``dup_line_char_frac`` = 1 - chars(distinct lines)/chars(all lines)
  ``ellipsis_line_frac`` = fraction of lines ending with ``...`` or ``…``
  ``bullet_line_frac``   = fraction of lines starting with a bullet marker
                           (``-``, ``*``, ``•``, or ``<digits>.``/``)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mmkg_rag_spark.functions.textstats import words

ELLIPSIS_RE = r"(\.\.\.|…)\s*$"
BULLET_RE = r"^\s*([-*•]|[0-9]+[.)])"


def word_ngrams(col: Column, n: int) -> Column:
    """Array of space-joined word n-grams (overlapping, document order)."""
    w = words(col)
    return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
    )


def _gram_run_stats(grams: Column) -> Column:
    """struct(best, bestg, dup) from one fold over the sorted gram array.

    best  = occurrence count of the most frequent gram
    bestg = that gram (lexicographically smallest on ties — the scan walks
            the sorted array and only a strictly longer run replaces best)
    dup   = sum of occurrences*length(gram) over grams occurring > once
    """
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
        F.lit("").alias("bestg"),
        F.lit(0).cast("bigint").alias("dup"),
    )

    def merge(acc: Column, x: Column) -> Column:
        newrun = F.when(x == acc["prev"], acc["run"] + F.lit(1).cast("bigint")).otherwise(
            F.lit(1).cast("bigint")
        )
        dup2 = acc["dup"] + F.when(
            (x != acc["prev"]) & (acc["run"] > 1),
            acc["run"] * F.length(acc["prev"]).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        improved = newrun > acc["best"]
        return F.struct(
            x.alias("prev"),
            newrun.alias("run"),
            F.when(improved, newrun).otherwise(acc["best"]).alias("best"),
            F.when(improved, x).otherwise(acc["bestg"]).alias("bestg"),
            dup2.alias("dup"),
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            acc["best"].alias("best"),
            acc["bestg"].alias("bestg"),
            (
                acc["dup"]
                + F.when(
                    acc["run"] > 1, acc["run"] * F.length(acc["prev"]).cast("bigint")
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("dup"),
        )

    return F.aggregate(F.array_sort(grams), zero, merge, finish)


def ngram_stats(col: Column, n: int) -> Column:
    """struct(best, bestg, dup) for word n-grams of ``col`` (see module doc)."""
    return _gram_run_stats(word_ngrams(col, n))


def dup_word_frac(col: Column) -> Column:
    w = words(col)
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        (F.size(w) - F.size(F.array_distinct(w))).cast("double") / F.size(w)
    )


def top_ngram_char_frac(col: Column, n: int) -> Column:
    s = ngram_stats(col, n)
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        (s["best"] * F.length(s["bestg"]).cast("bigint")).cast("double")
        / F.length(col)
    )


def dup_ngram_char_frac(col: Column, n: int) -> Column:
    s = ngram_stats(col, n)
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        s["dup"].cast("double") / F.length(col)
    )


def lines(col: Column) -> Column:
    """Non-blank lines of the document, in order."""
    return F.filter(F.split(col, r"\n"), lambda x: F.length(F.trim(x)) > 0)


def line_count(col: Column) -> Column:
    return F.size(lines(col))


def dup_line_frac(col: Column) -> Column:
    ln = lines(col)
    return F.when(F.size(ln) == 0, F.lit(0.0)).otherwise(
        (F.size(ln) - F.size(F.array_distinct(ln))).cast("double") / F.size(ln)
    )


def _char_sum(arr: Column) -> Column:
    return F.aggregate(
        arr,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.length(x).cast("bigint"),
    )


def dup_line_char_frac(col: Column) -> Column:
    ln = lines(col)
    total = _char_sum(ln)
    uniq = _char_sum(F.array_distinct(ln))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        (total - uniq).cast("double") / total
    )


def _line_match_frac(col: Column, pattern: str) -> Column:
    ln = lines(col)
    hits = F.size(F.filter(ln, lambda x: x.rlike(pattern)))
    return F.when(F.size(ln) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(ln)
    )


def ellipsis_line_frac(col: Column) -> Column:
    return _line_match_frac(col, ELLIPSIS_RE)


def bullet_line_frac(col: Column) -> Column:
    return _line_match_frac(col, BULLET_RE)


# ---------------------------------------------------------------------------
# ANSI-SQL twins (DuckDB oracle). The n-gram argmax side is expressed with
# unnest + GROUP BY in the oracle query (set semantics are easier to audit
# in SQL than a fold); these helpers cover the scalar signals.
# ---------------------------------------------------------------------------

SQL_WORDS = "regexp_split_to_array(trim(lower({col})), '\\s+')"


def sql_word_ngrams(col: str, n: int) -> str:
    w = SQL_WORDS.format(col=col)
    return (
        f"list_transform(range(1, greatest(len({w}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(({w})[i:i+{n - 1}], ' '))"
    )


def sql_dup_word_frac(col: str) -> str:
    w = SQL_WORDS.format(col=col)
    return (
        f"CASE WHEN len({w}) = 0 THEN 0.0 ELSE "
        f"CAST(len({w}) - len(list_distinct({w})) AS DOUBLE) / len({w}) END"
    )


SQL_LINES = (
    "list_filter(string_split({col}, chr(10)), x -> length(trim(x)) > 0)"
)


def sql_line_count(col: str) -> str:
    return f"len({SQL_LINES.format(col=col)})"


def sql_dup_line_frac(col: str) -> str:
    ln = SQL_LINES.format(col=col)
    return (
        f"CASE WHEN len({ln}) = 0 THEN 0.0 ELSE "
        f"CAST(len({ln}) - len(list_distinct({ln})) AS DOUBLE) / len({ln}) END"
    )


def sql_line_match_frac(col: str, pattern_sql: str) -> str:
    ln = SQL_LINES.format(col=col)
    return (
        f"CASE WHEN len({ln}) = 0 THEN 0.0 ELSE "
        f"CAST(len(list_filter({ln}, x -> regexp_matches(x, {pattern_sql}))) "
        f"AS DOUBLE) / len({ln}) END"
    )
