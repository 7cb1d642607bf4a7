"""Robust per-group outlier statistics (median / MAD / robust z-score).

Mean±k·stddev breaks on exactly the data a web-scale pipeline sees —
heavy-tailed value distributions where the outliers ARE the tail that
inflates the stddev. The robust alternative is the median absolute
deviation: an observation is an outlier when

    |x − median| > z · 1.4826 · MAD,   MAD = median(|x − median|)

(1.4826 = 1/Φ⁻¹(3/4) makes MAD consistent with σ under normality —
Hampel's rule). This is the fence a curation pipeline uses to flag
anomalous document lengths, token ratios, or event values per group
without the fence itself being dragged by the anomalies.

Plan shape: exact medians via ``percentile`` (Spark's exact single-pass
selection aggregate — at group granularity this is a hash aggregate, not
a global sort), group-level stats broadcast back onto the facts (the
group table is dimension-sized by construction), so the whole thing is
two grouped aggregations + two broadcast joins — no window over the raw
facts, no per-group sort of the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_CONSISTENCY = 1.4826


def robust_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Per-group robust dispersion summary + outlier count.

    Output: one row per group —
    ``(group, n, median, mad, n_outliers)`` where ``n_outliers`` counts
    rows with robust |z-score| > ``z``. Medians use linear interpolation
    (percentile_cont semantics — identical in Spark's ``percentile`` and
    DuckDB's ``quantile_cont``), so the numbers are engine-portable.

    A zero-MAD group (≥50% of values identical) has an undefined robust
    z-score; such groups report ``n_outliers`` as the count of values not
    equal to the median — the standard Hampel fallback, deterministic and
    engine-agnostic.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("median"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("median"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr("percentile(_absdev, 0.5)").alias("mad")
    )
    scored = dev.join(F.broadcast(mad), group_col).withColumn(
        "_is_out",
        F.when(
            F.col("mad") > 0,
            F.col("_absdev") > F.lit(z) * F.lit(MAD_CONSISTENCY) * F.col("mad"),
        ).otherwise(F.col("_absdev") > 0),
    )
    return (
        scored.groupBy(group_col)
        .agg(
            F.max("n").alias("n"),
            F.round(F.max("median"), 6).alias("median"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(F.col("_is_out").cast("bigint")).alias("n_outliers"),
        )
        .select(group_col, "n", "median", "mad", "n_outliers")
    )
