"""Temporal relational operators (event-stream side).

``asof_join`` — the operator Spark's DataFrame API lacks: match each left
row to the most recent right row at or before it per key (DuckDB/kdb ASOF
JOIN semantics). Expressed as a union + one keyed shuffle + a running
ignorenulls-last window — never the quadratic per-key theta-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Left as-of join: each left row gets the latest right row with
    right_ts ≤ left_ts within its key group (DuckDB/kdb ASOF JOIN
    semantics, ties inclusive); unmatched left rows keep NULL values.

    Spark has no as-of join operator; the naive theta-join
    (l ⋈ r ON key ∧ r.ts ≤ l.ts → max) explodes quadratically per key.
    This is the scalable formulation: union both sides tagged, ONE shuffle
    on the key, and a running ``last(value, ignorenulls)`` window fills
    each left row from the most recent right row at or before it — cost
    O(n log n) per key group, no join at all. Right rows order before left
    rows at equal timestamps, which makes the match inclusive.
    """
    l_tag = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    r_tag = right.select(
        *key_cols, F.col(right_ts).alias(left_ts), *value_cols
    ).withColumn("_side", F.lit(0))
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(left_ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u
    for c in value_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col("_side") == 1).drop("_side")
