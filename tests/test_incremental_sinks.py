"""Incremental D8 semantics + W1/W2 sinks.

Gate: indexing the corpus in two batches through incremental_canonicalize
must produce the same canonical graph as one full build (CC is
order-independent and the deterministic merges are associative). This is the
Spark analogue of the reference's incremental pickles (pipe.py:85-87).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mmkg_rag_spark.operators.dedup import canonicalize_entities, remap_and_merge_relations
from mmkg_rag_spark.operators.extract import chunk_pages, extract_mentions, split_mentions
from mmkg_rag_spark.operators.incremental import incremental_canonicalize
from mmkg_rag_spark.sources.pages import gen_pages_df


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-inc")


def _mentions(spark, lo, hi):
    pages = gen_pages_df(spark, hi).filter(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("int") >= lo
    )
    m = extract_mentions(chunk_pages(pages.select("url", "text"))).cache()
    return split_mentions(m)

def _node_set(nodes):
    return {
        (r.name, r.label, r.description, tuple(r.aliases or []))
        for r in nodes.collect()
    }


def _edge_set(edges):
    return {
        (r.source, r.label, r.target, r.description, tuple(r.references or []))
        for r in edges.collect()
    }


def test_incremental_equals_full_build(spark):
    em_all, rm_all = _mentions(spark, 0, 80)
    nodes_full, mapping = canonicalize_entities(em_all)
    edges_full = remap_and_merge_relations(rm_all, mapping)

    em1, rm1 = _mentions(spark, 0, 40)
    n1, _, e1 = incremental_canonicalize(em1, rm1)
    em2, rm2 = _mentions(spark, 40, 80)
    n2, _, e2 = incremental_canonicalize(em2, rm2, prior_nodes=n1, prior_edges=e1)

    assert _node_set(n2) == _node_set(nodes_full)
    assert _edge_set(e2) == _edge_set(edges_full)


def test_incremental_bridging_merge(spark):
    """A later batch's alias can merge two previously-distinct entities."""
    schema = (
        "url string, chunk_id int, name string, label string, description string, "
        "aliases array<string>, references array<string>"
    )
    b1 = spark.createDataFrame(
        [
            ("u1", 1, "IBM", "ORG", "tech company", [], []),
            ("u2", 1, "International Business Machines", "ORG", "hardware maker", [], []),
        ],
        schema,
    )
    rm_empty = spark.createDataFrame(
        [], "url string, chunk_id int, source string, label string, target string, "
        "description string, references array<string>"
    )
    n1, _, e1 = incremental_canonicalize(b1, rm_empty)
    assert n1.count() == 2  # nothing links them yet

    b2 = spark.createDataFrame(
        [("u3", 1, "International Business Machines", "ORG", "hardware maker",
          ["IBM"], [])],
        schema,
    )
    n2, mapping2, _ = incremental_canonicalize(b2, rm_empty, prior_nodes=n1, prior_edges=e1)
    names = {r.name for r in n2.collect()}
    assert names == {"International Business Machines"}
    assert ("IBM", "International Business Machines") in {
        (r.member, r.canonical) for r in mapping2.collect()
    }


def test_sinks_roundtrip_and_eris_schema(spark, tmp_path):
    from mmkg_rag_spark.sinks import export_eris_jsonl, write_graph
    from mmkg_rag_spark.sources.catalog import ParquetCatalog

    em, rm = _mentions(spark, 0, 20)
    nodes, mapping = canonicalize_entities(em)
    edges = remap_and_merge_relations(rm, mapping)

    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    snaps = write_graph(cat, nodes, edges, input_fp="test")
    assert cat.read("nodes", snaps["nodes"]).count() == nodes.count()
    # sorted write: first row is the lexicographically smallest name
    first = cat.read("nodes", snaps["nodes"]).limit(1).collect()[0].name
    assert first == min(r.name for r in nodes.collect())

    out = str(tmp_path / "eris")
    export_eris_jsonl(nodes, edges, out)
    lines = [json.loads(r.value) for r in spark.read.text(out).collect()]
    n_nodes = nodes.count()
    ent_lines = [l for l in lines if "name" in l]
    rel_lines = [l for l in lines if "source" in l]
    assert len(ent_lines) == n_nodes and len(rel_lines) == edges.count()
    # origin_str field ORDER parity (entity.py:40-47 / relation.py:41-48)
    assert list(ent_lines[0].keys()) == [
        "name", "label", "description", "aliases", "references"
    ]
    assert list(rel_lines[0].keys()) == [
        "source", "label", "target", "description", "references"
    ]
