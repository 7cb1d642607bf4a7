"""Data-quality profiling — the Deequ-style table health check.

At 10^12 rows nobody eyeballs the data; the pipeline asserts it. A profile
run is the cheapest such assertion surface: per-column row/null/distinct
counts plus value bounds, produced in ONE pass over the table (a single
multi-aggregate — Spark plans the distinct counts via Expand + two-phase
hash aggregation, so the table is scanned once no matter how many columns
are profiled) and emitted LONG-format so downstream constraint checks are
plain filters over (column, metric) rows.

The reference pipeline has no profiling step (it trusts its ~100-page
corpora); a Common-Crawl-scale build cannot — schema drift in a recrawl
(nulled text, language-code explosion, truncated html) must fail the run
before the LLM-extraction stage spends money on garbage. This operator is
the gate's input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bound the min/max witness strings so a profile row is never document-sized
_WITNESS_LEN = 40


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One profile row per column: ``(column, n_rows, n_null, n_distinct,
    min_val, max_val)`` with the bounds cast to (truncated) strings so the
    output schema is column-type-agnostic.

    Single scan, single (tiny) shuffle: all metrics for all columns live in
    one ``agg`` — Catalyst plans the k distinct-counts as ONE Expand
    (k+1-way row replication map-side) feeding a two-phase hash aggregate,
    which at 1000 executors is a scan + a 1-row-per-partition combine, not
    k separate jobs. The wide 1-row result is then unpivoted driver-free
    via ``stack``.

    ``n_distinct`` counts non-null distinct values (COUNT(DISTINCT col)
    semantics — identical in Spark and ANSI SQL). ``min_val``/``max_val``
    order by the NATIVE column type, then render as strings — so numeric
    columns report numeric bounds, not lexicographic ones.
    """
    if cols is None:
        cols = list(df.columns)
    aggs: list = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"_null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
        aggs.append(
            F.substring(F.min(F.col(c)).cast("string"), 1, _WITNESS_LEN).alias(
                f"_min_{c}"
            )
        )
        aggs.append(
            F.substring(F.max(F.col(c)).cast("string"), 1, _WITNESS_LEN).alias(
                f"_max_{c}"
            )
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `_null_{c}`, `_dist_{c}`, `_min_{c}`, `_max_{c}`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_null, n_distinct, min_val, max_val)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def gini_coefficient(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Exact Gini coefficient of a per-key value distribution — the
    inequality/skew diagnostic a partition planner reads before picking
    a shuffle strategy (Gini ≈ 0: uniform keys, plain hash partitioning
    is fine; Gini → 1: a handful of hot keys own the mass — salt or
    isolate them). The same number data curators report for
    domain/author concentration in a crawl.

    Exactness: with values sorted ascending (ties broken by key — a
    total order) and 1-based ranks i, G = (2·Σ i·x_i − (n+1)·Σ x) /
    (n·Σ x). Both sums are exact BIGINTs; the only double is the final
    division of two exact integers, identical cross-engine. Ranks come
    from functions/ranks.global_row_numbers — the two-phase PARALLEL
    range shuffle — so the sort never funnels through one task even at
    10^9 keys.

    Returns ONE row (n_keys, total, gini_num, gini_den, gini).
    """
    from ..functions.ranks import global_row_numbers

    counts = df.select(
        F.col(key_col).alias("_k"), F.col(value_col).cast("long").alias("_x")
    )
    ranked = global_row_numbers(counts, ["_x", "_k"], rank_col="_i")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_x").cast("long").alias("total"),
        (
            2 * F.sum(F.col("_i") * F.col("_x"))
            - (F.count(F.lit(1)) + 1) * F.sum("_x")
        ).cast("long").alias("gini_num"),
        (F.count(F.lit(1)) * F.sum("_x")).cast("long").alias("gini_den"),
    ).select(
        "n_keys",
        "total",
        "gini_num",
        "gini_den",
        F.round(F.col("gini_num") / F.col("gini_den"), 6).alias("gini"),
    )


def lorenz_checkpoints(
    df: DataFrame,
    key_col: str,
    value_col,
) -> DataFrame:
    """Lorenz / concentration curve at log-spaced ranks: with keys
    ranked by value DESCENDING, the cumulative value share held by the
    top 1, 2, 4, … keys (plus the full population) — the "what fraction
    of customers is 80% of revenue" curve, gini_coefficient's
    pictorial twin and the skew evidence a capacity planner reads.

    ``value_col`` must be an exact integer column (cents, counts) — the
    caller owns the fixed-point conversion so shares are exact:
    share_ppm = 10^6·cum // total, integer division.

    Scale shape: ranks from functions/ranks.global_row_numbers (the
    two-phase parallel range shuffle — never a partition-less window);
    cumulative sums come from joining the O(log n) checkpoint table
    (the vocab_growth pattern) instead of a population-length running
    window, so the fan-out per row is |checkpoints| and both final
    aggregates are map-side combinable.

    Returns (ckpt, cum_value, total_value, share_ppm) ordered by ckpt.
    """
    from ..functions.ranks import global_row_numbers

    vals = df.select(
        F.col(key_col).alias("_k"), F.col(value_col).cast("long").alias("_v")
    )
    ranked = global_row_numbers(
        vals.select("_k", (-F.col("_v")).alias("_nv"), "_v"),
        ["_nv", "_k"],
        rank_col="_i",
    ).localCheckpoint()
    tot = ranked.agg(
        F.sum("_v").cast("long").alias("total_value"),
        F.max("_i").cast("long").alias("_n"),
    )
    cps = tot.select(
        "total_value",
        F.explode(
            F.array_union(
                F.expr(
                    "filter(transform(sequence(0, 48),"
                    " i -> shiftleft(cast(1 as bigint), i)),"
                    " p -> p <= _n)"
                ),
                F.array(F.col("_n")),
            )
        ).alias("ckpt"),
    )
    return (
        ranked.join(F.broadcast(cps), F.col("_i") <= F.col("ckpt"))
        .groupBy("ckpt", "total_value")
        .agg(F.sum("_v").cast("long").alias("cum_value"))
        .select(
            "ckpt",
            "cum_value",
            "total_value",
            F.expr("1000000 * cum_value div total_value")
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("ckpt")
    )
