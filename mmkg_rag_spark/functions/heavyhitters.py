"""Misra-Gries heavy hitters: sketch-pass candidates + exact recount.

The frequent-items primitive a corpus pipeline runs to find boilerplate
n-grams, spam hosts, or hub entities WITHOUT shuffling the full vocabulary:
a bounded per-partition summary nominates candidates, then one semi-join
recount confirms them exactly. The reference engine has no sketch layer;
this is a scale-path extension in the spirit of its term statistics
(reference `src/mmkg_rag/index/` builds exact per-corpus tables).

Guarantee used (mergeable Misra-Gries, Agarwal et al., PODS'12): a summary
with ``k`` counters processed over a partition of ``n_p`` tokens retains
every term whose partition count exceeds ``n_p / (k + 1)``. By pigeonhole,
any term with GLOBAL count > N / (k + 1) exceeds that bound in at least one
partition, so the union of per-partition survivors is a superset of the
global heavy hitters. The final answer is an EXACT filter
``cnt * (k + 1) > N`` over a recount of the candidates only, which makes the
operator deterministic and partition-invariant (the sketch can only
over-nominate; it never changes the result).

Scale shape at 100 TB: the sketch pass is map-only with O(k) state per
task; the recount shuffles only rows whose term is in the candidate set
(<= k * n_partitions keys, broadcast), not the full vocabulary; the total
token count rides a 1-row broadcast. The exact-groupBy twin (the oracle)
shuffles every distinct term.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_mg(summary: dict[str, int], batch_counts: pd.Series, k: int) -> dict[str, int]:
    """Mergeable-MG combine: add counts, then subtract the (k+1)-th largest
    and drop non-positive counters. Keeps <= k counters, vectorized per
    Arrow batch (no per-token Python loop)."""
    for term, c in batch_counts.items():
        summary[term] = summary.get(term, 0) + int(c)
    if len(summary) > k:
        cut = sorted(summary.values(), reverse=True)[k]
        summary = {t: c - cut for t, c in summary.items() if c - cut > 0}
    return summary


def misra_gries_candidates(
    tokens: DataFrame, k: int, term_col: str = "term"
) -> DataFrame:
    """Distinct candidate terms from one map-only Misra-Gries pass.

    Each task folds its Arrow batches through the mergeable-MG combine
    (value_counts per batch, so the Python cost is per DISTINCT term per
    batch, not per token) and emits its <= k surviving terms.
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict[str, int] = {}
        for pdf in batches:
            summary = _merge_mg(summary, pdf[term_col].value_counts(), k)
        yield pd.DataFrame({"term": sorted(summary)})

    return (
        tokens.select(F.col(term_col).alias("term"))
        .mapInPandas(mg, "term string")
        .distinct()
    )


def heavy_hitters(
    docs: DataFrame,
    k: int = 31,
    text_col: str = "text",
) -> DataFrame:
    """Exact heavy hitters ``{term : cnt * (k+1) > N}`` via MG nomination.

    Returns (term, cnt, n_tokens, share_ppm) with share_ppm the exact
    integer ``cnt * 1_000_000 / N`` — no float anywhere, so the DuckDB
    twin (plain GROUP BY + HAVING) hash-matches bit-for-bit.
    """
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    cands = misra_gries_candidates(toks, k)
    # Total tokens WITHOUT a second explode: in-row array size per doc.
    arr = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    total = docs.select(F.size(arr).alias("s")).agg(
        F.sum("s").cast("long").alias("n_tokens")
    )
    counts = (
        toks.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (k + 1) > F.col("n_tokens"))
        .select(
            "term",
            "cnt",
            "n_tokens",
            F.expr("cnt * 1000000L DIV n_tokens").alias("share_ppm"),
        )
        .orderBy(F.desc("cnt"), "term")
    )
