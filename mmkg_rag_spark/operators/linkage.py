"""Fellegi-Sunter probabilistic record linkage, Spark-shaped.

The reference pipeline merges entities by fuzzy-similarity grouping
(reference `src/mmkg_rag/index/deduplicate.py` — a single greedy pass over
ratio-scored name pairs). This module generalizes that step into the
classical probabilistic-record-linkage decision model (Fellegi & Sunter
1969, JASA): candidate pairs from blocking, a per-field agreement VECTOR,
log-likelihood-ratio match weights, and an unsupervised EM estimator for
the per-field match/unmatch probabilities — the standard ER stack
(Splink / JedAI / dedupe.io all implement exactly this shape).

100 TB shape, stage by stage:

* **Blocking** — `candidate_pairs` self-joins only within caller-provided
  block keys (one hash shuffle on the block columns). Pair count is
  sum-of-squares of block sizes, never |table|²; skewed blocks are the
  caller's contract (pick keys, or pre-salt, so the largest block fits an
  executor — the same disclosed contract as textdedup's LSH bands).
* **Agreement vectors** — per-field comparisons are native whole-stage
  codegen expressions (equality, banded-integer closeness, token
  overlap); the K bits pack into one BIGINT `pattern`, so downstream
  costs are one column wide.
* **Pattern statistics** — `agreement_patterns` is ONE map-side-combinable
  groupBy producing ≤ 2^K rows. This is the step that makes EM tractable
  at any scale: the likelihood only depends on the pattern frequency
  table, so 10^12 candidate pairs compress to (say) 16 exact BIGINT
  counts before any iteration happens.
* **EM** — `estimate_m_u` runs on that ≤ 2^K-row table DRIVER-SIDE in a
  fixed iteration order (patterns sorted ascending). This is a bounded
  collect by construction (2^K rows for K comparison fields, K ≤ 20ish),
  the same bounded-probe budget as ANN's centroid collect. Deterministic:
  no randomness, fixed rounds, fixed fold order.
* **Scoring** — `fs_score` applies per-field integer MILLI-BIT weights
  (round(1000·log2(m/u)) for agreement, round(1000·log2((1-m)/(1-u)))
  for disagreement). Integer weights make the total score an exact
  BIGINT — engine-portable and hash-stable — while staying within 0.1%
  of the real-valued FS weight, far inside the decision margins.

Reference parity: `deduplicate.py`'s greedy ratio grouping is the
degenerate one-field case (name similarity, single threshold);
`operators/dedup.py` keeps that faithful path, and this module is the
scale path when entities carry multiple evidence fields.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ranks import global_row_numbers

__all__ = [
    "candidate_pairs",
    "sorted_neighborhood_pairs",
    "pack_pattern",
    "agreement_patterns",
    "estimate_m_u",
    "weights_milli",
    "fs_score",
]


def candidate_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    field_cols: list[str],
) -> DataFrame:
    """Blocked self-join: unordered candidate pairs within each block.

    Output columns: ``id_a``, ``id_b`` (id_a < id_b), plus ``a_<f>`` /
    ``b_<f>`` for every field column. ONE shuffle on the block key; the
    a<b predicate halves the within-block square and removes self-pairs.
    """
    sel = [F.col(id_col).alias("_id")] + [F.col(c) for c in block_cols]
    a = df.select(
        *sel, *[F.col(c).alias(f"a_{c}") for c in field_cols]
    ).withColumnRenamed("_id", "id_a")
    b = df.select(
        *sel, *[F.col(c).alias(f"b_{c}") for c in field_cols]
    ).withColumnRenamed("_id", "id_b")
    return a.join(b, block_cols).where(F.col("id_a") < F.col("id_b"))


def pack_pattern(bits: list[Column]) -> Column:
    """Pack agreement booleans into one BIGINT (bits[0] is the high bit)."""
    acc = F.lit(0).cast("long")
    for c in bits:
        acc = acc * 2 + c.cast("int")
    return acc


def agreement_patterns(pairs: DataFrame, pattern: Column) -> DataFrame:
    """(pattern, n_pairs) — the exact pattern-frequency table.

    ≤ 2^K rows; map-side-combinable, so 10^12 pairs reduce before the
    shuffle. This table is sufficient for FS likelihood and EM."""
    return (
        pairs.select(pattern.alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def estimate_m_u(
    pattern_counts: list[tuple[int, int]],
    n_fields: int,
    rounds: int = 30,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.1,
) -> tuple[list[float], list[float], float]:
    """Unsupervised EM for per-field (m, u) and match prevalence λ.

    Operates on the pattern-frequency table (``(pattern, count)`` tuples),
    NOT on pairs — the sufficient statistic — so the iteration cost is
    O(rounds · 2^K) regardless of corpus size. Deterministic: patterns are
    folded in sorted order, fixed round count, no randomness.

    E-step: g(γ) = λ·Π m^γ(1-m)^(1-γ) / (that + (1-λ)·Π u^γ(1-u)^(1-γ)).
    M-step: m_k = Σ n_γ g(γ) γ_k / Σ n_γ g(γ); u_k symmetric; λ = match
    mass / total. Returns (m[], u[], λ) with fields indexed high-bit
    first, matching :func:`pack_pattern`.
    """
    pats = sorted(pattern_counts)
    total = sum(n for _, n in pats)
    if total == 0:
        raise ValueError("empty pattern table")
    m = [init_m] * n_fields
    u = [init_u] * n_fields
    lam = init_lambda
    for _ in range(rounds):
        sum_g = 0.0
        sum_gm = [0.0] * n_fields
        sum_hu = [0.0] * n_fields
        sum_h = 0.0
        for pat, n in pats:
            pm, pu = lam, 1.0 - lam
            for k in range(n_fields):
                bit = (pat >> (n_fields - 1 - k)) & 1
                pm *= m[k] if bit else (1.0 - m[k])
                pu *= u[k] if bit else (1.0 - u[k])
            g = pm / (pm + pu) if (pm + pu) > 0 else 0.0
            sum_g += n * g
            sum_h += n * (1.0 - g)
            for k in range(n_fields):
                bit = (pat >> (n_fields - 1 - k)) & 1
                if bit:
                    sum_gm[k] += n * g
                    sum_hu[k] += n * (1.0 - g)
        if sum_g == 0.0 or sum_h == 0.0:
            break
        m = [min(max(s / sum_g, 1e-6), 1 - 1e-6) for s in sum_gm]
        u = [min(max(s / sum_h, 1e-6), 1 - 1e-6) for s in sum_hu]
        lam = sum_g / total
    return m, u, lam


def weights_milli(
    m: list[float], u: list[float]
) -> list[tuple[int, int]]:
    """(agree, disagree) FS weights in integer milli-bits per field.

    round(1000·log2(m/u)) keeps scores exact BIGINTs — engine-portable —
    at ≤ 0.05% weight error, negligible vs the decision thresholds."""
    return [
        (
            round(1000 * math.log2(mk / uk)),
            round(1000 * math.log2((1 - mk) / (1 - uk))),
        )
        for mk, uk in zip(m, u)
    ]


def fs_score(
    bits: list[Column],
    w_milli: list[tuple[int, int]],
    match_milli: int,
    possible_milli: int,
) -> tuple[Column, Column]:
    """(score_milli, cls) columns from agreement bits and integer weights.

    score = Σ_k (agree_k ? w_agree_k : w_disagree_k), an exact BIGINT sum
    of literals; cls ∈ {'match','possible','nonmatch'} by the two FS
    thresholds."""
    score = F.lit(0).cast("long")
    for bit, (wa, wd) in zip(bits, w_milli):
        score = score + F.when(bit, F.lit(wa)).otherwise(F.lit(wd)).cast(
            "long"
        )
    cls = (
        F.when(score >= F.lit(match_milli), F.lit("match"))
        .when(score >= F.lit(possible_milli), F.lit("possible"))
        .otherwise(F.lit("nonmatch"))
    )
    return score, cls


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_cols: list[str],
    window: int,
    field_cols: list[str] | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking: pairs within ``window`` positions of
    the global (key_cols, id) order (Hernández & Stolfo 1995) — the
    second classic ER blocking family next to hash/LSH blocking.
    Where key blocking misses near-misses that straddle a block boundary,
    the sliding window catches everything whose sort keys land close.

    Scale shape: the sort key ranks come from
    :func:`functions.ranks.global_row_numbers` (ONE parallel range
    shuffle — never an Exchange SinglePartition), and the window join is
    ``window`` co-partitioned equi-joins on ``rank_b = rank_a + k``
    (k = 1..window) unioned together — exact, no boundary-replication
    machinery, and each equi-join shuffles on an integer key with
    perfectly uniform distribution (ranks are a permutation — the one
    join key that CANNOT skew). Pair count is exactly
    window·n − window·(window+1)/2, known in advance — a disclosed,
    linear candidate budget, vs the quadratic worst case of skewed key
    blocking.

    Output: ``id_a``/``id_b`` (order-adjacent, id_a at the smaller rank),
    ``gap`` (rank distance 1..window), plus ``a_<f>``/``b_<f>`` for
    ``field_cols``. (id is appended to the sort key as tiebreaker, so the
    order is total and the pair set engine-deterministic.)
    """
    field_cols = field_cols or []
    ranked = global_row_numbers(
        df.select(id_col, *key_cols, *field_cols),
        [*key_cols, id_col],
    )
    a = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("rank").alias("rank_a"),
        *[F.col(c).alias(f"a_{c}") for c in field_cols],
    )
    b = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col("rank").alias("rank_b"),
        *[F.col(c).alias(f"b_{c}") for c in field_cols],
    )
    out = None
    for k in range(1, window + 1):
        j = a.join(b, F.col("rank_b") == F.col("rank_a") + k).select(
            "id_a",
            "id_b",
            F.lit(k).cast("long").alias("gap"),
            *[f"a_{c}" for c in field_cols],
            *[f"b_{c}" for c in field_cols],
        )
        out = j if out is None else out.unionByName(j)
    return out
