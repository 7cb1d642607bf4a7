"""End-to-end correctness gate: Spark engine vs pure-Python replica oracle.

BASELINE.md targets: triple P/R ≥ 0.95 vs reference-replica output and
byte-identical html→text per url — both asserted here on the deterministic
synthetic pages corpus (sources/pages.py).
"""

from __future__ import annotations

import pytest

from mmkg_rag_spark.kernels.refpipeline import build_graph
from mmkg_rag_spark.sources.pages import (
    gen_pages_df,
    gen_pages_local,
    image_manifest,
)

N_DOCS = 60


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-kg")
    yield s


@pytest.fixture(scope="module")
def engine_result(spark):
    from mmkg_rag_spark.pipeline import build_kg

    manifest = spark.createDataFrame(
        [(p,) for p in image_manifest()], "path string"
    )
    pages = gen_pages_df(spark, N_DOCS).drop("text")  # force html→text path
    res = build_kg(spark, pages, manifest)
    return {
        "nodes": res.nodes.collect(),
        "edges": res.edges.collect(),
        "image_edges": res.image_edges.collect(),
        "images": res.images.collect(),
        "pages_text": {
            r["url"]: r["text"]
            for r in __import__(
                "mmkg_rag_spark.operators.extract", fromlist=["with_text"]
            ).with_text(gen_pages_df(spark, N_DOCS).drop("text"))
            .select("url", "text")
            .collect()
        },
    }


@pytest.fixture(scope="module")
def oracle_result():
    docs = [(r["url"], r["text"]) for r in gen_pages_local(N_DOCS)]
    ents, rels, imgs, irs = build_graph(docs, valid_paths=set(image_manifest()))
    return {"docs": dict(docs), "entities": ents, "relations": rels,
            "images": imgs, "image_relations": irs}


def test_html_to_text_byte_identical(engine_result, oracle_result):
    """North-star invariant: extracted text is byte-identical per url."""
    expected = oracle_result["docs"]
    got = engine_result["pages_text"]
    assert set(got) == set(expected)
    for url, text in expected.items():
        assert got[url] == text, f"text mismatch for {url}"


def test_entity_set_exact(engine_result, oracle_result):
    se = {
        (r["name"], r["label"], r["description"],
         tuple(r["aliases"]), tuple(r["references"]), tuple(r["chunks"]))
        for r in engine_result["nodes"]
    }
    oe = {
        (e.name, e.label, e.description,
         tuple(e.aliases or []), tuple(e.references or []), tuple(e.chunks or []))
        for e in oracle_result["entities"]
    }
    assert se == oe


def _pr(spark_set, oracle_set):
    tp = len(spark_set & oracle_set)
    return tp / max(len(spark_set), 1), tp / max(len(oracle_set), 1)


def test_triple_precision_recall(engine_result, oracle_result):
    sr = {
        (r["source"], r["label"], r["target"], tuple(r["references"]))
        for r in engine_result["edges"]
    }
    orc = {
        (x.source, x.label, x.target, tuple(x.references or []))
        for x in oracle_result["relations"]
    }
    p, r = _pr(sr, orc)
    assert p >= 0.95 and r >= 0.95, f"triple P={p:.3f} R={r:.3f}"


def test_image_edges_precision_recall(engine_result, oracle_result):
    sie = {
        (r["source"], r["label"], r["target"])
        for r in engine_result["image_edges"]
    }
    oie = {
        (x.source, x.label, x.target) for x in oracle_result["image_relations"]
    }
    p, r = _pr(sie, oie)
    assert p >= 0.95 and r >= 0.95, f"image-edge P={p:.3f} R={r:.3f}"


def test_images_match(engine_result, oracle_result):
    assert {r["path"] for r in engine_result["images"]} == {
        i.path for i in oracle_result["images"]
    }


@pytest.mark.parametrize("seed,n", [(7, 40), (1234, 40)])
def test_triple_parity_across_seeds(spark, seed, n):
    """Differential gate at other corpus seeds: engine triples must equal
    the replica's exactly — parity is a property of the pipeline, not of
    the one fixture corpus the main gate uses."""
    from mmkg_rag_spark.pipeline import build_kg

    manifest = spark.createDataFrame([(p,) for p in image_manifest()], "path string")
    res = build_kg(spark, gen_pages_df(spark, n, seed=seed).drop("text"), manifest)
    got = {(r.source, r.label, r.target) for r in res.edges.collect()}

    docs = [(r["url"], r["text"]) for r in gen_pages_local(n, seed=seed)]
    _, rels, _, _ = build_graph(docs, valid_paths=set(image_manifest()))
    want = {(r.source, r.label, r.target) for r in rels}
    assert got == want and len(want) > 0


def test_fused_artifacts_equal_staged(spark):
    """The fused single-pass extraction (extract_page_artifacts) produces
    a graph IDENTICAL to the staged composition (with_text → chunk_pages →
    extract_mentions + extract_image_instances): same nodes, same edges
    (entity and image), same images table. The fusion is purely physical —
    fewer JVM↔Python crossings — never semantic."""
    from mmkg_rag_spark.pipeline import build_kg

    manifest = spark.createDataFrame(
        [(p,) for p in image_manifest()], "path string"
    )
    pages = gen_pages_df(spark, N_DOCS).drop("text")

    def snap(res):
        return {
            "nodes": sorted(
                (r.name, r.label, tuple(sorted(r.aliases or [])))
                for r in res.nodes.collect()
            ),
            "edges": sorted(
                (r.source, r.label, r.target)
                for r in res.all_edges.collect()
            ),
            "images": sorted(
                (r.path, r.caption) for r in res.images.collect()
            ),
        }

    a = snap(build_kg(spark, pages, manifest, fused=True))
    b = snap(build_kg(spark, pages, manifest, fused=False))
    assert a == b and len(a["nodes"]) > 0 and len(a["edges"]) > 0
