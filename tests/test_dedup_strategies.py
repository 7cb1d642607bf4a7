"""Both physical strategies of the D-phase must agree.

The adaptive thresholds (operators/dedup.py, functions/components.py) pick
driver-side union-find / pairwise similarity below a size cutoff and the
distributed MinHash-LSH + iterative min-label loop above it. Forcing each
path on the same input must yield identical canonical entities and mapping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mmkg_rag_spark.functions.components import connected_components, union_find_local
from mmkg_rag_spark.operators.dedup import canonicalize_entities


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-ded")


MENTIONS = [
    # (url, chunk_id, name, label, description, aliases, references)
    ("u1", 1, "Ada Lovelace", "PERSON", "pioneer", ["Ada"], ["r1"]),
    ("u2", 1, "Lovelace Ada", "PERSON", "computing pioneer", [], ["r2"]),
    ("u3", 1, "ADA LOVELACE", "PERSON", "pioneer", [], []),
    ("u4", 1, "Grace Hopper", "PERSON", "compilers", ["Grace"], []),
    ("u5", 1, "Acme Systems", "ORG", "vendor", [], []),
]
SCHEMA = (
    "url string, chunk_id int, name string, label string, description string, "
    "aliases array<string>, references array<string>"
)


@pytest.fixture(scope="module")
def mentions(spark):
    return spark.createDataFrame(MENTIONS, SCHEMA)


def _result_sets(nodes, mapping):
    n = {(r.name, r.label, tuple(sorted(r.aliases or []))) for r in nodes.collect()}
    m = {(r.member, r.canonical) for r in mapping.collect()}
    return n, m


def test_small_and_distributed_paths_agree(mentions):
    fast = canonicalize_entities(mentions)
    slow = canonicalize_entities(
        mentions, pairwise_threshold=0, cc_collect_threshold=0
    )
    assert _result_sets(*fast) == _result_sets(*slow)
    names = {r.name for r in fast[0].collect()}
    # token-sorted fuzzy match merges 'Ada Lovelace'/'Lovelace Ada'/'ADA LOVELACE'
    assert len(names) == 3 and "Grace Hopper" in names and "Acme Systems" in names


def test_connected_components_both_paths(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")],
        "src string, dst string",
    )
    for thr in (0, 10**6):
        comp = {
            (r.id, r.component)
            for r in connected_components(edges, collect_threshold=thr).collect()
        }
        assert {("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d"), ("f", "f")} == comp


def test_union_find_local_transitive():
    comp = union_find_local([(3, 1), (1, 2), (9, 8), (5, 5)])
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[8] == comp[9] == 8
    assert comp[5] == 5
