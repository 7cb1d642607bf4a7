"""K-Minimum-Values distinct sketch: set-operation estimates from k hashes.

The theta-sketch-family primitive (Beyer et al., SIGMOD'07; the design
DataSketches' theta sketch industrialized): keep the ``k`` smallest
md5-derived hash values of a key set, and

- distinct estimate  = (k-1) * 2^48 / kth_min   (exact count if |set| < k)
- union sketch       = k smallest of the two signatures' union
- intersection       = |{x in sig(A union B): x in sig(A) and x in sig(B)}|
                       / k_eff  *  est(A union B)

which answers "how many users did event types A and B share" WITHOUT ever
shuffling user sets against each other — the audience-overlap question a
corpus/event pipeline asks per pair of segments, hosts, or crawl
snapshots. Complements [[functions/cms.py]] (frequencies) and the HLL
family (plain distinct counts): KMV is the sketch whose signatures
support set INTERSECTION, which HLL registers do not.

All arithmetic is integer (48-bit hashes, integer DIV for the estimates),
so a DuckDB twin reproduces signatures AND estimates bit-for-bit — the
events_distinct_hll_md5 precedent. Signatures are mergeable (k smallest
of a union of signatures == signature of the union), so they fold across
partitions, days, or stream batches like the other sketch families.

Scale shape at 100 TB: ONE distinct-shuffle on (group, hash) — map-side
combinable — then a per-group top-k that Spark plans as WindowGroupLimit
(per-partition heads, never a global sort). Every downstream table is
bounded at ``k * n_groups`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 48
HASH_SPACE = 1 << HASH_BITS


def kmv_hash(key: Column) -> Column:
    """48-bit md5-derived hash — engine-portable (DuckDB:
    ``CAST('0x' || substr(md5(key || '|kmv'), 1, 12) AS BIGINT)``) and
    small enough that every estimate stays in BIGINT arithmetic."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", key.cast("string"), F.lit("kmv"))), 1, 12),
        16,
        10,
    ).cast("bigint")


def kmv_signatures(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 32
) -> DataFrame:
    """(group..., h) signature rows: the ``k`` smallest distinct key
    hashes per group. One distinct shuffle + a WindowGroupLimit top-k;
    output bounded at ``k`` rows per group."""
    hashed = df.select(
        *group_cols, kmv_hash(F.col(key_col)).alias("h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_estimates(sigs: DataFrame, group_cols: list[str], k: int = 32) -> DataFrame:
    """(group..., n_distinct_est) per group from a signature table:
    exact when the set never filled the signature, else the classic
    (k-1)/kth fraction of the hash space — INTEGER DIV so both engines
    agree bit-for-bit."""
    agg = sigs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sig"), F.max("h").alias("kth")
    )
    scale = (k - 1) * HASH_SPACE
    return agg.select(
        *group_cols,
        F.when(F.col("n_sig") < k, F.col("n_sig"))
        .otherwise(F.expr(f"{scale}L div kth"))
        .cast("long")
        .alias("n_distinct_est"),
    )


def kmv_pair_overlap(sigs: DataFrame, group_col: str, k: int = 32) -> DataFrame:
    """(g_a, g_b, est_union, est_inter) for every unordered group pair.

    Per pair: merge the two signatures (k smallest of their union — the
    mergeability property), estimate the union off the merged signature,
    and count merged hashes present in BOTH signatures — by the KMV
    identity, a hash among the k smallest of A union B belongs to
    A intersect B iff it is in sig(A) AND sig(B). Every table here is
    bounded at ``k * n_groups`` rows; the joins broadcast.
    """
    g = F.col(group_col)
    groups = sigs.select(g.alias("g_a")).distinct()
    pairs = groups.crossJoin(
        sigs.select(g.alias("g_b")).distinct()
    ).filter(F.col("g_a") < F.col("g_b"))
    # Explicit column order before the union: joins pull their key column
    # to the front, so the positional unionAll would otherwise swap
    # g_a/g_b on the B side.
    rows_a = pairs.join(
        F.broadcast(sigs.select(g.alias("g_a"), "h")), "g_a"
    ).select("g_a", "g_b", "h")
    rows_b = pairs.join(
        F.broadcast(sigs.select(g.alias("g_b"), "h")), "g_b"
    ).select("g_a", "g_b", "h")
    merged = (
        rows_a.unionAll(rows_b)
        .groupBy("g_a", "g_b", "h")
        .agg(F.count(F.lit(1)).alias("present_in"))
    )
    w = Window.partitionBy("g_a", "g_b").orderBy("h")
    top = merged.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    scale = (k - 1) * HASH_SPACE
    agg = top.groupBy("g_a", "g_b").agg(
        F.count(F.lit(1)).alias("n_sig"),
        F.max("h").alias("kth"),
        F.sum((F.col("present_in") == 2).cast("long")).alias("n_match"),
    )
    return agg.withColumn(
        "est_union",
        F.when(F.col("n_sig") < k, F.col("n_sig"))
        .otherwise(F.expr(f"{scale}L div kth"))
        .cast("long"),
    ).select(
        "g_a",
        "g_b",
        "est_union",
        F.expr("(n_match * est_union) div n_sig").cast("long").alias("est_inter"),
    )
