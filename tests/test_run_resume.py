"""Staged-runner checkpoint/resume semantics (north-rule ops requirements).

Covers: snapshot-fingerprint stage skipping (kill/rerun ⇒ resume), snapshot
catalog manifest atomicity, and per-partition lineage/metrics rows.
"""

from __future__ import annotations

import io
import json
import os
from contextlib import redirect_stdout

import pytest


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-run")


def test_staged_run_resumes(spark, tmp_path_factory):
    from mmkg_rag_spark.run import main

    wh = str(tmp_path_factory.mktemp("wh"))
    args = ["--n-docs", "30", "--warehouse", wh, "--master", "local[4]"]

    out1 = io.StringIO()
    with redirect_stdout(out1):
        assert main(args) == 0
    first = out1.getvalue()
    assert first.count("[run   ]") == 5 and "[resume]" not in first

    out2 = io.StringIO()
    with redirect_stdout(out2):
        assert main(args) == 0
    second = out2.getvalue()
    assert second.count("[resume]") == 5 and "[run   ]" not in second
    # same summary both times
    assert first.splitlines()[-6:] == second.splitlines()[-6:]

    # changed params ⇒ downstream stages recompute, pages stage too (new fp)
    out3 = io.StringIO()
    with redirect_stdout(out3):
        assert main(args + ["--chunk-size", "4000", "--overlap", "200"]) == 0
    third = out3.getvalue()
    assert "[resume] pages" in third  # same input ⇒ reused
    assert "[run   ] mentions" in third  # new chunking params ⇒ recomputed


def test_partial_failure_resumes_midway(spark, tmp_path_factory):
    """Simulate a crash after stage 2: later stages compute, earlier resume."""
    from mmkg_rag_spark.run import main
    from mmkg_rag_spark.sources.catalog import ParquetCatalog

    wh = str(tmp_path_factory.mktemp("wh2"))
    args = ["--n-docs", "20", "--warehouse", wh, "--master", "local[4]"]
    with redirect_stdout(io.StringIO()):
        main(args)

    # wipe the manifest of a mid-pipeline stage ⇒ "crash before stage 3"
    cat = ParquetCatalog(spark, wh)
    nodes_manifest = cat._manifest_path("nodes")
    os.remove(nodes_manifest)

    out = io.StringIO()
    with redirect_stdout(out):
        assert main(args) == 0
    text = out.getvalue()
    assert "[resume] pages" in text and "[resume] mentions" in text
    assert "[run   ] nodes" in text  # recomputed from the surviving inputs

    # the recomputed stage flushed a fresh metrics row, and its rows_in is
    # the surviving mentions snapshot's row count (lineage survives resume)
    from mmkg_rag_spark.metrics import read_metrics

    m = read_metrics(spark, wh).filter("stage = 'nodes'").collect()
    assert len(m) >= 2  # original run + post-crash recompute
    mention_rows = sum(
        r.rows for r in read_metrics(spark, wh).filter("stage = 'mentions'").collect()
    )
    assert any(r.rows_in == mention_rows for r in m)


def test_metrics_lineage_rows(spark, tmp_path_factory):
    from mmkg_rag_spark.metrics import read_metrics
    from mmkg_rag_spark.run import main

    wh = str(tmp_path_factory.mktemp("wh3"))
    with redirect_stdout(io.StringIO()):
        main(["--n-docs", "20", "--warehouse", wh, "--master", "local[4]"])
    m = read_metrics(spark, wh)
    rows = m.collect()
    stages = {r.stage for r in rows}
    assert {"pages", "mentions", "nodes", "edges", "image_edges"} <= stages
    assert all(r.rows >= 0 and r.wall_ms >= 0 and r.file for r in rows)
    # lineage chain: mentions' input snapshot is pages' snapshot
    pages_snap = next(r.snapshot for r in rows if r.stage == "pages")
    assert any(
        r.stage == "mentions" and r.input_snapshot == pages_snap for r in rows
    )
    # rows-in/rows-out accounting: mentions' rows_in equals the pages
    # snapshot's total row count; the source stage reports -1 (no upstream)
    pages_total = sum(r.rows for r in rows if r.stage == "pages")
    assert all(
        r.rows_in == pages_total for r in rows if r.stage == "mentions"
    )
    assert all(r.rows_in == -1 for r in rows if r.stage == "pages")


def test_catalog_manifest_roundtrip(spark, tmp_path_factory):
    from mmkg_rag_spark.sources.catalog import ParquetCatalog, fingerprint

    wh = str(tmp_path_factory.mktemp("wh4"))
    cat = ParquetCatalog(spark, wh)
    df = spark.range(10).withColumnRenamed("id", "x")
    fp = fingerprint("t", 1)
    cat.write(df, "t", fp, meta={"input": "-"})
    assert cat.has_snapshot("t", fp)
    assert not cat.has_snapshot("t", fingerprint("t", 2))
    assert cat.read("t", fp).count() == 10
    assert cat.read("t").count() == 10  # latest
    snaps = cat.snapshots("t")
    assert len(snaps) == 1 and snaps[0]["input"] == "-"
    manifest = json.load(open(os.path.join(wh, "t", "manifest.json")))
    assert manifest[0]["id"] == fp

def test_cli_evaluate_prints_win_rates(spark, tmp_path_factory):
    """--evaluate runs the hermetic evaluation harness over the built graph
    and prints per-metric win-rate statistics plus a JSON summary line."""
    import json

    from mmkg_rag_spark.run import main

    wh = str(tmp_path_factory.mktemp("wh_eval"))
    out = io.StringIO()
    with redirect_stdout(out):
        assert main([
            "--n-docs", "20", "--warehouse", wh, "--master", "local[4]",
            "--evaluate", "A corpus about organizations.", "--eval-n", "1",
        ]) == 0
    text = out.getvalue()
    assert "evaluated 1 questions" in text
    stats = json.loads(
        [ln for ln in text.splitlines() if ln.startswith('{"win_rates"')][-1]
    )["win_rates"]
    assert set(stats) == {
        "Comprehensiveness", "Diversity", "Empowerment", "Directness"
    }
    assert all(sum(c.values()) == 1 for c in stats.values())
