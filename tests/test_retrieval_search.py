"""R4 retrieval composition (search_eris) over a small planted graph."""

from __future__ import annotations

import pytest

from mmkg_rag_spark.operators.retrieval import search_eris


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-ret")


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("Ada Lovelace", "PERSON", "pioneer", ["Ada"]),
            ("Analytical Engine", "TECH", "machine", []),
            ("Charles Babbage", "PERSON", "inventor", []),
            ("Zurich Office", "ORG", "site", []),
        ],
        "name string, label string, description string, aliases array<string>",
    )
    edges = spark.createDataFrame(
        [
            ("Ada Lovelace", "worked on", "Analytical Engine", "", []),
            ("Charles Babbage", "designed", "Analytical Engine", "", []),
            ("Zurich Office", "hosts", "Archive", "", []),
            ("Ada Lovelace", "#imagedepicts", "images/ada.png", "", []),
        ],
        "source string, label string, target string, description string, "
        "references array<string>",
    )
    images = spark.createDataFrame(
        [("images/ada.png", "Ada Lovelace portrait", ["a daguerreotype"])],
        "path string, caption string, texts array<string>",
    )
    return nodes, edges, images


def test_search_eris_composition(graph):
    nodes, edges, images = graph
    res = search_eris(
        nodes, edges, images, ["Ada Lovelace"], max_num=1, similarity_threshold=50
    )

    seeds = [r.name for r in res["seed_entities"].orderBy("rank").collect()]
    assert seeds[0] == "Ada Lovelace"

    related = {r.name for r in res["related_entities"].collect()}
    assert "Analytical Engine" in related
    assert "Ada Lovelace" not in related  # seeds subtracted (search.py:309-310)
    assert "Zurich Office" not in related  # disconnected

    trips = {(r.source, r.target) for r in res["related_edges"].collect()}
    assert ("Ada Lovelace", "Analytical Engine") in trips
    assert ("Zurich Office", "Archive") not in trips

    imgs = [r.path for r in res["seed_images"].collect()]
    assert imgs == ["images/ada.png"]
    img_edges = {(r.source, r.target) for r in res["image_edges"].collect()}
    assert ("Ada Lovelace", "images/ada.png") in img_edges


def test_search_eris_2hop(graph):
    nodes, edges, images = graph
    res = search_eris(nodes, edges, images, ["Ada"], max_num=1, hop=2)
    related = {r.name for r in res["related_entities"].collect()}
    # hop1: Analytical Engine; hop2: Charles Babbage via the engine
    assert {"Analytical Engine", "Charles Babbage"} <= related


def test_assemble_context(graph):
    from mmkg_rag_spark.operators.retrieval import assemble_context

    nodes, edges, images = graph
    res = search_eris(
        nodes, edges, images, ["Ada Lovelace"], max_num=1, similarity_threshold=50
    )
    ctx = assemble_context(
        res["seed_entities"], res["related_entities"], res["related_edges"], nodes
    )
    assert "- Ada Lovelace, ['Ada'], pioneer" in ctx
    assert "- Ada Lovelace, Analytical Engine, worked on," in ctx
    assert ctx.index("Entities:") < ctx.index("Relations:")
    assert "Zurich Office" not in ctx  # disconnected entity excluded


def test_khop_large_frontier_unhinted_path(spark):
    """VERDICT r1 #3: frontiers above the broadcast threshold fall back to an
    unhinted join; both physical paths must agree on a graph whose hop-1
    frontier is large (star: one seed fans out to 500 neighbors, each with a
    hop-2 pendant)."""
    from mmkg_rag_spark.operators.retrieval import khop_neighbors

    rows = []
    for i in range(500):
        rows.append(("hub", f"n{i}"))
        rows.append((f"n{i}", f"leaf{i}"))
    edges = spark.createDataFrame(rows, "source string, target string")
    seeds = spark.createDataFrame([("hub",)], "name string")

    broad = khop_neighbors(edges, seeds, hops=2)
    forced = khop_neighbors(edges, seeds, hops=2, broadcast_frontier_max=10)
    b = {(r.name, r.hop) for r in broad.collect()}
    f = {(r.name, r.hop) for r in forced.collect()}
    assert f == b
    assert ("n7", 1) in b and ("leaf7", 2) in b and ("hub", 0) in b
    assert len(b) == 1001
