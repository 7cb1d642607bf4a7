"""VERDICT r2 #2: lsh_topk_cosine must defend its candidate volume.

auto_tune_lsh derives n_planes from the fraction/recall trade; the tuning
report measures candidate fraction + recall@k vs brute so a silently
near-brute (or silently lossy) configuration is visible. Two corpus
regimes are pinned:

- clustered (planted neighbors at ~15°): auto-tune picks MORE planes, the
  measured candidate fraction collapses, recall stays ≥ 0.9;
- uniform-random (near-orthogonal neighbors — the adversarial case): the
  recall constraint CAPS the plane count and the report says so
  (fraction_limited_by_recall) with an honestly-large fraction, instead of
  pretending sub-linear work is possible.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mmkg_rag_spark.operators import ann


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-annt")


DIM = 16


def _norm(v):
    return (v / np.linalg.norm(v)).tolist()


def _clustered(n_clusters=20, per_cluster=10, noise=0.05, seed=11):
    """Planted clusters: members sit ~atan(noise·√DIM)≈11° from their base,
    so same-cluster pair angles stay ≲20° — the clustered-regime design
    point the 20° auto-tune targets."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for c in range(n_clusters):
        base = rng.standard_normal(DIM)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            rows.append((vid, c, _norm(base + noise * rng.standard_normal(DIM))))
            vid += 1
    return rows


def _uniform(n=200, seed=13):
    rng = np.random.default_rng(seed)
    return [(i, -1, _norm(rng.standard_normal(DIM))) for i in range(n)]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, v) for i, _, v in rows], "vec_id long, embedding array<double>"
    )


def _queries(spark, rows, n=5):
    return spark.createDataFrame(
        [(i, v) for i, _, v in rows[:n]],
        "query_id long, query_vec array<double>",
    )


def test_auto_tune_defaults_derive_round2_config():
    """At the 45° design point the tuner lands on the r2 default (4 planes ×
    8 tables) — now derived, and flagged as recall-capped."""
    t = ann.auto_tune_lsh(n_tables=8)
    assert t["n_planes"] == 4
    assert t["fraction_limited_by_recall"] is True
    assert 0.35 < t["expected_fraction"] < 0.45  # the documented ~40%
    assert t["expected_recall"] >= 0.9


def test_auto_tune_clustered_regime_shrinks_buckets():
    t = ann.auto_tune_lsh(n_tables=8, target_angle_deg=20.0)
    assert t["n_planes"] == 8  # fraction-optimal, recall constraint slack
    assert t["fraction_limited_by_recall"] is False
    assert t["expected_fraction"] < 0.05
    assert t["expected_recall"] >= 0.9


def test_recall_formula_sanity():
    # more tables → more recall; more planes → less recall at fixed angle
    assert ann.lsh_recall(45, 4, 16) > ann.lsh_recall(45, 4, 8)
    assert ann.lsh_recall(45, 8, 8) < ann.lsh_recall(45, 4, 8)
    # tiny angles ≈ always found
    assert ann.lsh_recall(1, 12, 8) > 0.999


def test_clustered_corpus_high_recall_low_fraction(spark):
    rows = _clustered()
    rep = ann.lsh_tuning_report(
        _df(spark, rows),
        _queries(spark, rows, 5),
        k=4,
        n_tables=8,
        dim=DIM,
        target_angle_deg=20.0,
    )
    assert rep["n_planes"] == 8
    assert rep["recall_at_k"] >= 0.9
    assert rep["candidate_fraction"] <= 0.3  # ≪ brute; clusters concentrate
    assert rep["fraction_limited_by_recall"] is False


def test_uniform_corpus_reports_near_brute_honestly(spark):
    rows = _uniform()
    rep = ann.lsh_tuning_report(
        _df(spark, rows), _queries(spark, rows, 5), k=4, n_tables=8, dim=DIM
    )
    assert rep["n_planes"] == 4  # recall cap bites at the 45° design point
    assert rep["fraction_limited_by_recall"] is True
    # the report makes the near-brute regime VISIBLE, not hidden
    assert rep["candidate_fraction"] > 0.15


def test_multiprobe_dominates_coarse_single_probe():
    """p=8/T=8/m=8 matches p=4/T=8's recall at the 60° (adversarial) design
    point while expecting ~25% candidates instead of ~40% — the analytic
    basis for the pinned driver config."""
    coarse_r = ann.lsh_recall(60, 4, 8)
    fine_r = ann.lsh_recall(60, 8, 8, n_probes=8)
    assert fine_r >= coarse_r - 0.02
    assert ann.lsh_expected_fraction(8, 8, 8) < 0.65 * ann.lsh_expected_fraction(4, 8)
    # auto-tune with probes available picks the finer partition
    t = ann.auto_tune_lsh(n_tables=8, n_probes=8, target_angle_deg=60.0)
    assert t["n_planes"] > 4 and t["n_probes"] == 8


def test_multiprobe_measured_fraction_and_recall(spark):
    """Measured on the uniform (near-orthogonal) corpus: multi-probe at
    p=8/T=8/m=8 keeps recall within noise of coarse p=4/T=8 while cutting
    the measured candidate fraction."""
    rows = _uniform()
    corpus, qs = _df(spark, rows), _queries(spark, rows, 5)
    coarse = ann.lsh_tuning_report(
        corpus, qs, k=4, n_planes=4, n_tables=8, dim=DIM
    )
    fine = ann.lsh_tuning_report(
        corpus, qs, k=4, n_planes=8, n_tables=8, n_probes=8, dim=DIM
    )
    assert fine["candidate_fraction"] < coarse["candidate_fraction"]
    assert fine["recall_at_k"] >= coarse["recall_at_k"] - 0.15


def test_lsh_default_is_auto_tuned(spark):
    """n_planes=None routes through auto_tune_lsh and matches the explicit
    round-2 config — the driver's pinned (n_planes=4, n_tables=8) query is
    unchanged by the new default."""
    rows = _clustered(n_clusters=5, per_cluster=6)
    corpus, qs = _df(spark, rows), _queries(spark, rows, 3)
    auto = {
        (r.query_id, r.nn_id, r.rank)
        for r in ann.lsh_topk_cosine(corpus, qs, k=3, dim=DIM).collect()
    }
    explicit = {
        (r.query_id, r.nn_id, r.rank)
        for r in ann.lsh_topk_cosine(
            corpus, qs, k=3, n_planes=4, n_tables=8, dim=DIM
        ).collect()
    }
    assert auto == explicit and len(auto) > 0


def test_ivf_auto_tune_sqrt_rule():
    t = ann.auto_tune_ivf(10_000, target_fraction=0.25)
    assert t["n_lists"] == 100 and t["n_probe"] == 25
    assert ann.auto_tune_ivf(10)["n_lists"] == 4        # floor
    assert ann.auto_tune_ivf(10**9)["n_lists"] == 4096  # cap


def test_ivf_tuning_report_clustered(spark):
    """Clustered corpus: auto-sized IVF keeps recall high while scanning a
    bounded fraction; the report surfaces both numbers."""
    rows = _clustered(n_clusters=10, per_cluster=12)
    rep = ann.ivf_tuning_report(
        _df(spark, rows), _queries(spark, rows, 4), k=4,
        n_lists=10, n_probe=3,
    )
    assert rep["recall_at_k"] >= 0.8
    assert rep["candidate_fraction"] <= 0.6
    assert rep["expected_fraction"] == 0.3
