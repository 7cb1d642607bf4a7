"""Count-Min Sketch: mergeable register matrix over a Spark key column.

The bounded-memory frequency-estimate primitive (Cormode & Muthukrishnan
2005) a corpus pipeline uses when per-key exact counts are too large to
hold — boilerplate n-gram pressure, per-host request rates, hub-entity
mention load. Complements the exact Misra-Gries path
([[functions/heavyhitters.py]]): MG answers "which keys are frequent",
CMS answers "roughly how frequent is ANY key" in O(depth x width) memory.

Register matrix: ``reg[j][b] = sum of counts of keys with hash_j(key) = b``
for ``depth`` independent md5-derived hash rows. Point estimate =
``min_j reg[j][hash_j(key)]`` — always >= the true count, and within
``e/width * N`` of it with probability ``1 - e^-depth``.

Everything is native Catalyst (md5 / conv / substring / explode) — no
Python in the loop — and all-integer, so a DuckDB twin reproduces the
registers AND the estimates bit-for-bit (the events_distinct_hll_md5
precedent). Registers are MERGEABLE by plain addition: sketch(A union B)
= sketch(A) + sketch(B) register-wise, which is what makes the structure
work across partitions, days, or sources without re-scanning raw keys.

Scale shape at 100 TB: one groupBy whose output is bounded at
``depth * width`` rows per merge group regardless of corpus size; the
estimate join broadcasts the register table (always tiny by
construction). The reference engine has no sketch layer; this extends
its term-statistics side (reference ``src/mmkg_rag/index/``) with the
approximate-counting primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row_j: int, width: int) -> Column:
    """Row-``j`` bucket of ``key``: first 16 bits of md5(key|cms|j) mod
    width. Hex-substring + conv keeps it engine-portable (DuckDB:
    ``CAST('0x' || substr(md5(...), 1, 4) AS BIGINT) % width``)."""
    hexh = F.md5(F.concat_ws("|", key.cast("string"), F.lit("cms"), F.lit(str(row_j))))
    return (F.conv(F.substring(hexh, 1, 4), 16, 10).cast("bigint") % width).cast(
        "int"
    )


def cms_registers(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., row_j, bucket, reg_cnt) register matrix — ONE shuffle
    whose output is bounded at ``depth * width`` rows per group.

    Each input row fans out to ``depth`` (row_j, bucket) cells in-row
    (array + explode, no Python), then a map-side-combinable groupBy
    sums occurrences into the registers.
    """
    group_cols = group_cols or []
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row_j"),
                _bucket(F.col(key_col), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(*group_cols, F.explode(cells).alias("cell"))
        .select(*group_cols, "cell.row_j", "cell.bucket")
        .groupBy(*group_cols, "row_j", "bucket")
        .agg(F.count(F.lit(1)).alias("reg_cnt"))
    )


def cms_merge(registers: DataFrame) -> DataFrame:
    """Collapse a grouped register table to one global sketch by plain
    register-wise addition — the mergeable-sketch property: no raw keys
    are ever revisited."""
    return registers.groupBy("row_j", "bucket").agg(
        F.sum("reg_cnt").cast("long").alias("reg_cnt")
    )


def cms_estimate(
    registers: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, cnt_est) point estimates: min over the ``depth`` register
    cells each key hashes to. The register table is broadcast (bounded at
    depth x width rows by construction), so the probe is map-side."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row_j"),
                _bucket(F.col(key_col), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    probes = keys.select(key_col, F.explode(cells).alias("cell")).select(
        key_col, "cell.row_j", "cell.bucket"
    )
    return (
        probes.join(F.broadcast(registers), ["row_j", "bucket"])
        .groupBy(key_col)
        .agg(F.min("reg_cnt").alias("cnt_est"))
    )
