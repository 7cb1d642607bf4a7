"""Z-order clustering: Morton-code correctness + measured data-skipping
evidence from real parquet footer stats (the min/max boxes Iceberg/parquet
readers prune by)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mmkg_rag_spark.functions.zorder import cluster_by_zorder, quantize, zvalue


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-zorder")


def _morton(vals: list[int], bits: int) -> int:
    out = 0
    k = len(vals)
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * k + i)
    return out


def test_zvalue_matches_reference(spark):
    rows = [(i, (i * 37) % 1024, (i * 101) % 1024) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r.id: r.z
        for r in df.select(
            "id", zvalue(F.col("x"), F.col("y"), bits=10).alias("z")
        ).collect()
    }
    for i, x, y in rows:
        assert got[i] == _morton([x, y], 10), (i, x, y)


def test_zvalue_three_cols_and_budget(spark):
    df = spark.createDataFrame([(5, 9, 3)], "a long, b long, c long")
    z = df.select(zvalue(F.col("a"), F.col("b"), F.col("c"), bits=4).alias("z"))
    assert z.collect()[0].z == _morton([5, 9, 3], 4)
    with pytest.raises(ValueError):
        zvalue(F.col("a"), F.col("b"), bits=40)  # 80 bits > 63


def test_quantize_clamps(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (99.9,), (250.0,)], "v double")
    got = [r.q for r in df.select(quantize(F.col("v"), 0, 100, bits=4).alias("q")).collect()]
    assert got[0] == 0 and got[1] == 0 and got[2] == 15 and got[3] == 15


def _file_extents(path: str, col: str, domain: float) -> list[float]:
    """Per-parquet-file (max-min)/domain for col, from footer stats."""
    import pyarrow.parquet as pq

    extents = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        extents.append((hi - lo) / domain)
    assert len(extents) >= 8, "expected a multi-file layout"
    return extents


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    """The measurable claim: after z-order clustering, a filter on EITHER
    column can skip most files by footer min/max, while a linear sort is
    selective on its sort column only. Metric = mean per-file extent
    (fraction of the domain a file's [min,max] box covers) = expected
    fraction of files a uniform point filter must read."""
    n, dom, files = 200_000, 1 << 10, 16
    base = (
        spark.range(n)
        .select(
            (F.xxhash64("id") % dom).alias("x"),
            (F.xxhash64("id", F.lit(1)) % dom).alias("y"),
        )
        .select(
            (F.abs("x") % dom).alias("x"), (F.abs("y") % dom).alias("y")
        )
    )

    linear = str(tmp_path / "linear")
    base.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(linear)
    zord = str(tmp_path / "zorder")
    cluster_by_zorder(base, ["x", "y"], num_files=files, bits=10).write.parquet(zord)

    lin_y = _file_extents(linear, "y", dom)
    z_x = _file_extents(zord, "x", dom)
    z_y = _file_extents(zord, "y", dom)

    mean = lambda v: sum(v) / len(v)  # noqa: E731
    # linear-by-x layout: every file spans ~the whole y domain
    assert mean(lin_y) > 0.9
    # z-order: BOTH dimensions stay selective — for 16 files on 2 dims the
    # curve tiles ~4x4 boxes, so expected extent ~0.25; allow slack to 0.6
    assert mean(z_x) < 0.6, mean(z_x)
    assert mean(z_y) < 0.6, mean(z_y)
