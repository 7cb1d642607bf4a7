"""R1/R6 drivers: classify, decomposition, multi-agent QA (mocked LLM).

Mirrors the reference's retrieval front end (classify.py:17-82,
agents.py:11-115) with scripted EndpointExtractor transports and the
hermetic MockExtractor — never the network.
"""

from __future__ import annotations

import json

import pytest

from mmkg_rag_spark.kernels.parsers import parse_agent_defines
from mmkg_rag_spark.llm import (
    CLASSIFY_SYSTEM_PROMPT,
    DECOMPOSE_SYSTEM_PROMPT,
    EXTRACT_KEYWORDS_PROMPT,
    FUSION_SYSTEM_PROMPT,
    GENERATE_SYSTEM_PROMPT,
    EndpointExtractor,
)
from mmkg_rag_spark.qa import (
    agent_response,
    generate_answer,
    query_dismantle,
    question_decomposition,
)


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-qa")


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("Ada Lovelace", "PERSON", "pioneer", ["Ada"]),
            ("Analytical Engine", "TECH", "machine", []),
            ("Charles Babbage", "PERSON", "inventor", []),
        ],
        "name string, label string, description string, aliases array<string>",
    )
    edges = spark.createDataFrame(
        [
            ("Ada Lovelace", "worked on", "Analytical Engine", "", []),
            ("Charles Babbage", "designed", "Analytical Engine", "", []),
            ("Ada Lovelace", "#imagedepicts", "images/ada.png", "depicted", []),
        ],
        "source string, label string, target string, description string, "
        "references array<string>",
    )
    images = spark.createDataFrame(
        [("images/ada.png", "Ada Lovelace portrait", ["a daguerreotype"], "portrait")],
        "path string, caption string, texts array<string>, description string",
    )
    return nodes, edges, images


def _scripted(script):
    """EndpointExtractor whose transport dispatches on the system prompt."""
    def transport(payload):
        system = payload["messages"][0]["content"]
        user = payload["messages"][-1]["content"]
        return script(system, user)

    return EndpointExtractor(base_url="http://example.invalid/v1", transport=transport)


# --- R1: query_dismantle ---------------------------------------------------

def test_dismantle_direct():
    ex = _scripted(
        lambda s, u: '{"classification": "direct", "response": "42"}'
    )
    out = query_dismantle("What is 6x7?", ex)
    assert out == {"classification": "direct", "response": "42"}


def test_dismantle_retrieval_and_scalar_keyword_wrap():
    ex = _scripted(
        lambda s, u: '{"classification": "retrieval", "keywords": "Ada"}'
    )
    # non-list keywords are wrapped (classify.py:76-79)
    assert query_dismantle("Who is Ada?", ex)["keywords"] == ["Ada"]


def test_dismantle_empty_query_and_force_retrieval():
    assert query_dismantle("") is None
    seen = []

    def script(system, user):
        seen.append(system)
        return '{"classification": "retrieval", "keywords": ["K"]}'

    query_dismantle("q", _scripted(script), force_retrieval=True)
    assert seen == [EXTRACT_KEYWORDS_PROMPT]  # classify.py:38-44


def test_dismantle_parse_fallback():
    ex = _scripted(lambda s, u: "no json here")
    assert query_dismantle("q", ex) == {"classification": "retrieval", "keywords": []}


# --- R6 parser parity ------------------------------------------------------

def test_parse_agent_defines_parity():
    ok = parse_agent_defines('x {"agents": [{"name": "a", "task": "t"}]} y')
    assert ok == [{"name": "a", "task": "t"}]
    assert parse_agent_defines("no json") == []
    assert parse_agent_defines("{broken") == []          # JSONDecodeError → []
    assert parse_agent_defines('{"other": 1}') is None   # KeyError → None (ref bug)


def test_question_decomposition_raises_on_unparseable():
    ex = _scripted(lambda s, u: "garbage")
    with pytest.raises(ValueError):
        question_decomposition("q", ex)


# --- R5/R6 end-to-end with scripted model ----------------------------------

def test_generate_answer_includes_knowledge(graph):
    nodes, edges, images = graph
    captured = {}

    def script(system, user):
        assert system == GENERATE_SYSTEM_PROMPT
        captured["prompt"] = user
        return "Ada worked on the Analytical Engine."

    ans = generate_answer(
        ["Ada Lovelace"], "What did Ada work on?", nodes, edges, images,
        _scripted(script), max_num=1, similarity_threshold=50,
    )
    assert ans == "Ada worked on the Analytical Engine."
    p = captured["prompt"]
    assert "- Ada Lovelace, ['Ada'], pioneer" in p          # text knowledge half
    assert "- images/ada.png, Ada Lovelace portrait" in p   # image knowledge half
    assert "---Question---\nWhat did Ada work on?" in p
    with pytest.raises(ValueError):
        generate_answer([], "q", nodes, edges, images)       # generate.py:80-81


def test_agent_response_full_flow(graph):
    nodes, edges, images = graph
    calls = []

    def script(system, user):
        calls.append(system)
        if system == DECOMPOSE_SYSTEM_PROMPT:
            return json.dumps(
                {
                    "agents": [
                        {"name": "a1", "task": "What did Ada Lovelace build?"},
                        {"name": "a2", "task": "Trivia", "suggestions": []},
                    ]
                }
            )
        if system == CLASSIFY_SYSTEM_PROMPT:
            if "Trivia" in user:
                return '{"classification": "direct", "response": "direct-ans"}'
            return '{"classification": "retrieval", "keywords": ["Ada Lovelace"]}'
        if system == GENERATE_SYSTEM_PROMPT:
            return "kg-answer"
        if system == FUSION_SYSTEM_PROMPT:
            # bug-for-bug (agents.py:104-110): joined LAST response chars
            assert user.startswith("Question: Q?\nAnswers: \n")
            assert user.endswith("\n".join("direct-ans"))
            return "fused"
        raise AssertionError(f"unexpected system prompt: {system}")

    out = agent_response(
        "Q?", nodes, edges, images, _scripted(script),
        max_num=1, similarity_threshold=50,
    )
    assert out == "fused"
    # decompose → classify ×2 → generate (retrieval agent only) → fusion
    assert calls.count(DECOMPOSE_SYSTEM_PROMPT) == 1
    assert calls.count(CLASSIFY_SYSTEM_PROMPT) == 2
    assert calls.count(GENERATE_SYSTEM_PROMPT) == 1
    assert calls.count(FUSION_SYSTEM_PROMPT) == 1


def test_mock_extractor_qa_is_hermetic(graph):
    """The default MockExtractor path runs end-to-end with no endpoint."""
    nodes, edges, images = graph
    out = agent_response(
        "What did Ada Lovelace work on?", nodes, edges, images,
        max_num=1, similarity_threshold=50,
    )
    assert isinstance(out, str) and out
