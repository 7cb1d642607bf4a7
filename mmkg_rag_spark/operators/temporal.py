"""Temporal relational operators (event-stream side).

``asof_join`` — the operator Spark's DataFrame API lacks: match each left
row to the most recent right row at or before it per key (DuckDB/kdb ASOF
JOIN semantics). Expressed as a union + one keyed shuffle + a running
ignorenulls-last window — never the quadratic per-key theta-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_VAL = "_asof_vals"


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
    on the key, and a running ``last(..., ignorenulls)`` window fills each
    left row from the most recent right row at or before it — cost
    O(n log n) per key group, no join at all. Right rows order before left
    rows at equal timestamps, which makes the match inclusive.

    All value columns are packed into a single STRUCT on the right side and
    the window fills that one struct: the struct itself is non-null even
    when individual members are NULL, so (a) a matching right row whose
    value is legitimately NULL is honoured (not skipped for an older
    non-null row), and (b) with several value_cols every output value comes
    from the SAME right row — exactly the DuckDB/kdb contract. Right rows
    sharing (key, ts) are ordered by the value struct itself as a
    deterministic tiebreaker, so the matched row is stable across runs and
    partitionings.
    """
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        _VAL,
        F.lit(None).cast(
            "struct<{}>".format(
                ",".join(f"`{c}`:{dict(right.dtypes)[c]}" for c in value_cols)
            )
        ),
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_ts).alias(left_ts),
        F.struct(*value_cols).alias(_VAL),
    ).withColumn("_side", F.lit(0))
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(left_ts, "_side", _VAL)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(_VAL, F.last(_VAL, ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).drop("_side")
    for c in value_cols:
        out = out.withColumn(c, F.col(_VAL)[c])
    return out.drop(_VAL)
