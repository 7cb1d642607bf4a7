"""Z-order (Morton) clustering for multi-column data skipping.

At 100 TB the scan you never run is the fastest one: parquet/Iceberg prune
files and row groups by per-file min/max stats, but a layout sorted on ONE
column gives selective stats on that column only — a filter on any other
column reads everything. Interleaving the bits of k columns into one sort
key (the Morton curve) makes every file a tight k-dimensional bounding box,
so point/range filters on ANY of the clustered columns skip most files.
This is the same layout primitive Delta/Iceberg expose as ``OPTIMIZE
ZORDER BY``; here it is pure column expressions (shift/mask/OR unrolled per
bit — JVM whole-stage-codegen, no UDF) feeding an ordinary
``repartitionByRange`` write.

Usage::

    z = zvalue(quantize(F.col("user_id"), 0, 10**6), F.col("day_sk"))
    df.repartitionByRange(n_files, z).sortWithinPartitions(z).write...

Scale notes: the z-value is one BIGINT per row (map-only); the range
shuffle is the one the write needs anyway to control file count. Skew in
the clustered columns maps to skew in z-space and is handled by
repartitionByRange's sampling exactly like any range write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int = 20) -> Column:
    """Map a numeric column into the unsigned bucket space [0, 2**bits).

    Values outside [lo, hi) clamp to the edge buckets, so the caller can
    pass approximate bounds (e.g. yesterday's min/max) without risking
    overflow of the bit budget.
    """
    n = 1 << bits
    scaled = F.floor((col - F.lit(lo)) / F.lit(float(hi - lo)) * n)
    return F.greatest(F.lit(0), F.least(scaled, F.lit(n - 1))).cast("long")


def zvalue(*cols: Column, bits: int | None = None) -> Column:
    """Interleave the low ``bits`` bits of each column into one BIGINT.

    Bit b of column i lands at position ``b * k + i`` — the classic Morton
    code. ``bits`` defaults to the largest per-column budget that fits all
    k columns in 63 bits (e.g. 31 for k=2, 21 for k=3). Inputs must already
    be non-negative and < 2**bits (use ``quantize``); the expression is an
    unrolled OR of shift/mask terms that stays inside whole-stage codegen.
    """
    k = len(cols)
    if k == 0:
        raise ValueError("zvalue needs at least one column")
    if bits is None:
        bits = 63 // k
    if bits * k > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed 64-bit key")
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * k + i)
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def cluster_by_zorder(df, cols, num_files: int, bits: int | None = None):
    """Return df re-laid-out along the Morton curve of ``cols`` (already
    quantized/integer columns), targeting ``num_files`` output files. The
    caller writes the result; every file then carries a tight bounding box
    over ALL of ``cols`` in its footer stats."""
    z = zvalue(*[F.col(c) if isinstance(c, str) else c for c in cols], bits=bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
