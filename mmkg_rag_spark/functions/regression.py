"""Closed-form per-group simple linear regression (exact OLS components).

Trend detection over grouped time series — "is this nation's order volume
growing?", "is this domain's crawl yield decaying?" — is a per-group OLS
fit of y on x. Spark ships ``regr_slope``/``regr_intercept``, but those
accumulate DOUBLE co-moments whose partial-aggregation order depends on the
partitioning — the exact cross-engine hash trap this repo's DECIMAL-sum
policy exists to avoid (see `graph.degree_assortativity`, the correlation
sibling).

This primitive instead aggregates the five sufficient statistics
(n, Σx, Σy, Σxy, Σx²) as exact DECIMAL(38,0) integers (callers pass integer
x and y — epoch days/months, counts, scaled decimals) and assembles the
closed form

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

exposing the numerators and the shared denominator as EXACT integers next
to the one-IEEE-division doubles, so equality tests and oracles compare
integers and only the final division is float. A vertical/degenerate group
(all x equal → den = 0) yields NULL slope/intercept via try_divide, never
an error. ONE map-side-combinable shuffle on the group key; everything else
is a projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x: Column | str,
    y: Column | str,
) -> DataFrame:
    """Per-group exact OLS of y on x → group_cols + (n_points, slope_num,
    intercept_num, den, slope, intercept)."""
    xc = (F.col(x) if isinstance(x, str) else x).cast(_D38)
    yc = (F.col(y) if isinstance(y, str) else y).cast(_D38)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(_D38).alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(xc * yc).alias("sxy"),
        F.sum(xc * xc).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    icpt_num = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    return agg.select(
        *group_cols,
        F.col("n").cast("long").alias("n_points"),
        slope_num.cast("long").alias("slope_num"),
        icpt_num.cast("long").alias("intercept_num"),
        den.cast("long").alias("den"),
        F.try_divide(slope_num.cast("double"), den.cast("double")).alias(
            "slope"
        ),
        F.try_divide(icpt_num.cast("double"), den.cast("double")).alias(
            "intercept"
        ),
    )
