"""Explicit skew-mitigation primitives (salted join / salted aggregation).

The north-rule calls out head-entity skew ("Wikipedia-class hubs") as the
failure mode of the link-scoring self-join: a power-law key sends a whole
hub's rows to ONE reducer, and that straggler sets the stage's wall clock.
AQE's skew-join split only fires for sort-merge joins above partition-size
thresholds and never for aggregations, so the engine also ships the classic
manual remedy, deterministic and oracle-transparent:

- ``salted_join``: replicate the SMALL side ``salts``× (explode on a salt
  column), salt the BIG side by a deterministic hash of a high-cardinality
  column, and join on (key, salt). Each hot key's rows now land on
  ``salts`` reducers instead of one. Inner/left semantics and the result
  set are IDENTICAL to the unsalted join — the salt is internal plumbing —
  so the DuckDB oracle is the plain join.
- ``salted_agg_two_stage``: partial-aggregate on (key, salt), then final
  on key. For algebraic aggregates Spark's hash-agg partials already do
  this map-side; the explicit form exists for holistic aggregates
  (collect_list/set, exact distinct) where the partial CANNOT combine and
  the hot key's whole group otherwise materializes on one reducer.

Used by operators/mmodal.py's auto strategy (salted-blocked relevance
scoring) conceptually; exposed here as reusable, tested primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salts: int = 8,
    big_salt_col: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: ``big ⋈ small`` on ``on`` with the hot keys of
    ``big`` spread across ``salts`` shuffle partitions.

    ``big_salt_col``: a high-cardinality column (or Column expression) of
    ``big`` to derive the deterministic salt from; defaults to hashing all
    of ``big``'s columns (uniform but costs a wider hash). The small side
    explodes ``salts``× — keep it the dimension side.

    Result is column-for-column equal to ``big.join(small, on, how)``.
    """
    if big_salt_col is None:
        salt_src = F.xxhash64(*[F.col(c) for c in big.columns])
    elif isinstance(big_salt_col, str):
        salt_src = F.xxhash64(F.col(big_salt_col))
    else:
        salt_src = F.xxhash64(big_salt_col)
    b = big.withColumn(SALT, F.pmod(salt_src, F.lit(salts)).cast("int"))
    s = small.withColumn(
        SALT,
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(salts - 1).cast("int"))),
    )
    return b.join(s, list(on) + [SALT], how).drop(SALT)


def salted_agg_two_stage(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salts: int = 16,
    salt_src: Column | None = None,
) -> DataFrame:
    """Two-stage aggregation: stage 1 groups on (key, salt) — the hot key
    splits into ``salts`` partial groups, each small — stage 2 combines the
    partials on key alone (``salts`` rows per key, trivially cheap).

    ``partial_aggs`` run against the raw rows; ``final_aggs`` run against
    the stage-1 output and must reference the partials' aliases (e.g.
    partial ``collect_set(x) AS xs`` → final
    ``array_distinct(flatten(collect_list(xs))) AS xs``).
    """
    if salt_src is None:
        salt_src = F.xxhash64(*[F.col(c) for c in df.columns])
    stage1 = (
        df.withColumn(SALT, F.pmod(salt_src, F.lit(salts)).cast("int"))
        .groupBy(*key_cols, SALT)
        .agg(*partial_aggs)
    )
    return stage1.groupBy(*key_cols).agg(*final_aggs)
