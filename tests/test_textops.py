"""Text-op kernel tests: image scans, reference completion, scalar helpers.

The extract_images assertions mirror the reference's golden test
(/root/reference/tests/index_test.py:9-38) against its fixture when the
read-only reference checkout is present.
"""

import os

import pytest

from mmkg_rag_spark.kernels.textops import (
    extract_image_links,
    extract_images_with_context,
    find_complete_text,
    md5,
    promote_canonical_name,
    relation_pair_key,
    shorten_string,
)

REF_FIXTURE = "/root/reference/tests/assets/mmodaltest.md"


def test_md5_known_digests():
    # helper_test.py:6-19
    assert md5("hello") == "5d41402abc4b2a76b9719d911017c592"
    assert md5("") == "d41d8cd98f00b204e9800998ecf8427e"


def test_shorten_string():
    assert shorten_string("short", 10, 10) == "short"
    assert shorten_string("a" * 30, 5, 5) == "aaaaa...aaaaa"


def test_extract_image_links_md_and_html():
    text = 'intro ![alt](a.png) mid <img src="b.jpg"> ![x](a.png)'
    assert extract_image_links(text) == ["a.png", "b.jpg"]


def test_extract_images_context_window():
    text = "Start sentence. " + "x" * 300 + ". Before img. ![cap](img.png) After img. " + "y" * 300 + ". End."
    images = extract_images_with_context(text)
    assert len(images) == 1
    path, context = images[0]
    assert path == "img.png"
    assert len(context) <= 430  # ±200 window + tag length
    assert "![cap](img.png)" in context
    # trimmed to sentence boundaries on both sides
    assert not context.startswith("x")
    assert context.endswith(".")


def test_extract_images_no_truncation_when_short():
    text = "A pic ![c](p.png) here."
    images = extract_images_with_context(text)
    assert images == [("p.png", text.strip())]


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="reference checkout absent")
def test_extract_images_reference_fixture():
    # parity assertions from /root/reference/tests/index_test.py:9-38
    with open(REF_FIXTURE, encoding="utf-8") as f:
        text = f.read()
    images = extract_images_with_context(text)
    assert len(images) == 5
    for _path, context in images:
        assert len(context) <= 420
        assert isinstance(context, str)


def test_find_complete_text_shortest_span():
    full = "alpha beta gamma. alpha x beta gamma."
    # two candidate spans starting with "alpha" ending with "gamma."; shortest wins
    assert find_complete_text("alpha...gamma.", full) == "alpha beta gamma."


def test_find_complete_text_passthrough():
    assert find_complete_text("no ellipsis", "whatever") == "no ellipsis"
    assert find_complete_text("a...b...c", "whatever") == "a...b...c"
    assert find_complete_text("zz...qq", "no match here") == "zz...qq"


def test_promote_canonical_name_longest_wins():
    # text.py:39-51: longest of [name]+aliases becomes the name
    name, aliases = promote_canonical_name("NLP", ["Natural Language Processing"])
    assert name == "Natural Language Processing"
    assert aliases == ["NLP"]
    # name already longest → unchanged
    name, aliases = promote_canonical_name("Natural Language Processing", ["NLP"])
    assert name == "Natural Language Processing"
    assert aliases == ["NLP"]


def test_relation_pair_key_unordered():
    # deduplicate.py:237-243
    assert relation_pair_key("John", "Someone") == relation_pair_key("Someone", "John")
    assert relation_pair_key("a", "B") == ("B", "A")
