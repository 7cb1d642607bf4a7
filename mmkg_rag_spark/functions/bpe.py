"""Byte-pair-encoding tokenizer training and encoding over a Spark corpus.

The tokenizer-training step of an LLM data pipeline, structured the way
production trainers (GPT-2's bpe, HuggingFace tokenizers) actually scale:

1. ONE distributed pass aggregates the corpus to a word-frequency table
   (a single (term)-keyed groupBy — the only operation that ever touches
   the full corpus).
2. The merge loop runs on the BOUNDED word-frequency table. The table is
   capped at ``max_vocab_words`` rows by (count desc, word) — the standard
   practice (rare-word tail contributes ~nothing to pair statistics), and
   per the no-silent-caps rule the dropped tail's word and token counts
   are returned in the stats row. At 100 TB the distinct-word table is
   millions of rows; the capped table is a driver-trivial structure, and
   the loop is pure CPU with zero cluster round-trips (unlike a naive
   per-merge distributed recount, which would be ``n_merges`` shuffles).
3. Encoding is map-only: the learned merge ranks ride a broadcast dict and
   each task applies them per distinct word in its Arrow batches.

Determinism: merge choice ties break (pair_count desc, (left, right) asc),
so the merge table is a pure function of the word-frequency table — which
is itself partition-invariant. The reference engine has no tokenizer; this
extends its text layer (reference `src/mmkg_rag/index/spliter.py` chunks by
characters) with the vocabulary-learning primitive.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END = "</w>"

# no-silent-caps: the most recent train_bpe's cap disclosure
# (words_kept/words_dropped/tokens_dropped/stopped), surfaced by bench.py
# next to the timing numbers so the vocab cap is a stated budget.
LAST_TRAIN_STATS: dict | None = None


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) corpus word-frequency table — the single full-corpus
    shuffle of BPE training (map-side combinable)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(words: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pc: dict[tuple[str, str], int] = {}
    for syms, cnt in words.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] = pc.get((a, b), 0) + cnt
    return pc


def _apply_merge(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    wc: DataFrame,
    n_merges: int = 30,
    min_pair_count: int = 2,
    max_vocab_words: int = 100_000,
) -> tuple[list[tuple[int, str, str, int]], dict[str, int]]:
    """Learn ``n_merges`` BPE merges from a word-frequency DataFrame.

    Returns (merges, stats): merges as (rank, left, right, pair_count)
    with rank 1-based in learn order; stats discloses the cap
    (words_kept / words_dropped / tokens_dropped) and the stop cause.
    """
    top = (
        wc.orderBy(F.desc("cnt"), "word").limit(max_vocab_words).collect()
    )
    totals = wc.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("cnt").cast("long").alias("n_tokens"),
    ).first()
    words: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (END,): int(r["cnt"]) for r in top
    }
    kept_tokens = sum(words.values())
    stats = {
        "words_kept": len(top),
        "words_dropped": int(totals["n_words"]) - len(top),
        "tokens_dropped": int(totals["n_tokens"]) - kept_tokens,
    }
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pc = _pair_counts(words)
        if not pc:
            stats["stopped"] = "exhausted"
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            stats["stopped"] = "min_pair_count"
            break
        merges.append((rank, a, b, cnt))
        words = {_apply_merge(s, (a, b)): c for s, c in words.items()}
    stats.setdefault("stopped", "n_merges")
    global LAST_TRAIN_STATS
    LAST_TRAIN_STATS = dict(stats)
    return merges, stats


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, lowest rank first — the canonical
    BPE encode (same procedure as training, driven by the rank table)."""
    syms = tuple(word) + (END,)
    while len(syms) > 1:
        best = min(
            (
                (ranks[(a, b)], (a, b))
                for a, b in zip(syms, syms[1:])
                if (a, b) in ranks
            ),
            default=None,
        )
        if best is None:
            break
        syms = _apply_merge(syms, best[1])
    return list(syms)


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) per document — map-only encode with the
    merge ranks broadcast; each task memoizes per distinct word so the
    Python cost is per (task, distinct word), not per token."""
    spark = docs.sparkSession
    b_ranks = spark.sparkContext.broadcast(
        {(a, b): r for r, a, b, _ in merges}
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = b_ranks.value
        memo: dict[str, int] = {}

        def n_toks(word: str) -> int:
            if word not in memo:
                memo[word] = len(encode_word(word, ranks))
            return memo[word]

        for pdf in batches:
            words = pdf[text_col].str.split(" ")
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_words": words.map(lambda ws: sum(1 for w in ws if w)),
                    "n_bpe_tokens": words.map(
                        lambda ws: sum(n_toks(w) for w in ws if w)
                    ),
                }
            )

    out = docs.select(id_col, text_col).mapInPandas(
        enc, "id long, n_words long, n_bpe_tokens long"
    )
    return out.withColumnRenamed("id", id_col)
