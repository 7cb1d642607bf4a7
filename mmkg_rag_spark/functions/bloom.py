"""Explicit Bloom-filter build/probe as native DataFrame expressions.

Why explicit (vs ``spark.sql.optimizer.runtime.bloomFilter``, which the
session also enables): the runtime filter is best-effort and join-local;
a *materialized* Bloom table is a reusable, mergeable artifact — build it
once from the benchmark/blocklist side, persist it, and probe any number
of corpora against it map-side. At 10^12 documents the benchmark n-gram
set is ~10^8 strings (gigabytes — unbroadcastable), but its Bloom image
at 10 bits/key is tens of MB: the probe stays a broadcast hash join.

Representation: ``m_bits`` bits packed into ``m_bits/64`` longs —
a DataFrame ``(word_idx: long, bits: long)`` holding only NON-ZERO words
(missing word ⇒ all bits clear). Bit positions come from ``k``
independent ``xxhash64(key, seed)`` draws. Build is one map-side-combined
aggregate over the key set; probe is ``k`` broadcast joins (zero shuffle,
whole-stage codegen'd) — a key is a *candidate* iff all ``k`` bits are
set. Bloom answers are one-sided: no false negatives, so callers that
need exactness verify candidates against the true set afterwards (see
``operators/curation.decontaminate_bloom``) — the filter's job is to
shrink the expensive verify to (true hits + ~m⁻ᵏ-scaled FPs).

Merge rule (not used by the query classes but part of the contract):
two Blooms with equal (m, k) merge by ``bit_or`` per word — day→month→
all rollups never revisit raw keys, same as the CMS/KMV/HLL family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k independent bit positions in [0, m_bits) for a key."""
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_build(
    keys: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Bloom image ``(word_idx, bits)`` of the distinct keys in ``col``.

    One explode(k) projection + one ``bit_or`` aggregate; output is at
    most ``m_bits/64`` rows regardless of key count (the state bound that
    makes this a broadcastable summary, like the sketch family).
    """
    pos = F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("pos")
    return (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            # pyspark's shiftleft() only takes a literal shift count; the
            # SQL function form accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_contains(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 3,
    out: str = "bloom_hit",
) -> DataFrame:
    """``df`` + boolean ``out``: true iff ``col``'s k Bloom bits are all set.

    k broadcast LEFT joins against the word table — map-side hash probes,
    no shuffle, no explode on the (corpus-sized) probe side. A missing
    word row means the whole 64-bit word is zero ⇒ miss.
    """
    res = df
    hit = F.lit(True)
    for i, pos in enumerate(_positions(F.col(col), m_bits, k)):
        w = f"_bw{i}"
        b = bloom.select(
            F.col("word_idx").alias(f"{w}_idx"), F.col("bits").alias(f"{w}_bits")
        )
        res = res.withColumn(f"{w}_pos", pos).join(
            F.broadcast(b),
            (F.col(f"{w}_pos") / 64).cast("long") == F.col(f"{w}_idx"),
            "left",
        )
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({w}_pos % 64 AS INT))")
        hit = hit & (F.coalesce(F.col(f"{w}_bits"), F.lit(0)).bitwiseAND(bit) != 0)
    keep = [c for c in df.columns]
    return res.select(*keep, hit.alias(out))
