"""Extractor abstraction: mock-injected path ≡ default path; endpoint client.

Mirrors the reference's LLM-client test layer (tests/llm_test.py: mocked
AsyncOpenAI) — the endpoint client is exercised with an injected transport,
never the network.
"""

from __future__ import annotations

import json

import pytest

from mmkg_rag_spark.llm import EndpointExtractor, MockExtractor
from mmkg_rag_spark.operators.extract import chunk_pages, extract_mentions
from mmkg_rag_spark.sources.pages import gen_pages_df


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-llm")


def test_injected_mock_extractor_equals_default(spark):
    chunks = chunk_pages(gen_pages_df(spark, 20).select("url", "text")).cache()

    def norm(rows):
        return sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in rows
        )

    default = norm(extract_mentions(chunks).collect())
    injected = norm(
        extract_mentions(chunks, extractor_factory=MockExtractor).collect()
    )
    assert injected == default and len(default) > 0


def test_endpoint_extractor_request_and_parse():
    calls = []

    def transport(payload):
        calls.append(payload)
        # an OpenAI-style extractor reply in the parsers' contract
        return (
            '{"name": "Ada Lovelace", "label": "PERSON", '
            '"description": "pioneer", "aliases": [], "references": []}'
        )

    ex = EndpointExtractor(
        base_url="http://example.invalid/v1", model="test-model",
        transport=transport,
    )
    out = ex.index(["Some page text"])
    assert len(out) == 1 and "Ada Lovelace" in out[0]
    payload = calls[0]
    assert payload["model"] == "test-model"
    assert payload["max_tokens"] == 8192  # utils/llm.py:75-86 parity
    assert payload["messages"][1]["content"].endswith("Some page text")

    from mmkg_rag_spark.kernels.parsers import parse_er

    ents, rels = parse_er(out[0])
    assert ents[0].name == "Ada Lovelace" and rels == []

    # alias + describe calls use the same transport
    ex.alias(["text"], [["Ada Lovelace"]])
    ex.describe_image(["img/x.png"], ["context"])
    assert len(calls) == 3
    assert "img/x.png" in calls[2]["messages"][1]["content"]


def test_endpoint_extractor_is_picklable_as_factory():
    """partial() factories survive stdlib pickle (Spark's cloudpickle also
    handles lambdas/closures — this pins the stricter contract)."""
    import functools
    import pickle

    factory = functools.partial(
        EndpointExtractor, base_url="http://h/v1", api_key="k"
    )
    f2 = pickle.loads(pickle.dumps(factory))
    ex = f2()
    assert ex.base_url == "http://h/v1" and ex.api_key == "k"
