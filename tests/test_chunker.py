"""Chunker invariants: size bound, coverage, determinism, id numbering."""

from hypothesis import given, settings
from hypothesis import strategies as st

from mmkg_rag_spark.kernels.chunker import split_markdown, split_text_to_chunks

MD_DOC = (
    "# Title\n\n"
    "Intro paragraph with some prose that runs along for a while. " * 5
    + "\n\n## Section A\n\n"
    + "Body of section A. " * 40
    + "\n\n## Section B\n\n"
    + "Body of section B with an image ![cap](images/x.png) inline. " * 30
    + "\n\n### Subsection\n\nFinal words."
)


def test_chunks_respect_size_bound():
    for size, overlap in [(200, 40), (500, 100), (8000, 400)]:
        for c in split_markdown(MD_DOC, size, overlap):
            assert len(c) <= size


def test_chunks_cover_all_content_words():
    chunks = split_markdown(MD_DOC, 300, 60)
    joined = " ".join(chunks)
    for token in ["Title", "Section A", "Section B", "Subsection", "Final words."]:
        assert token in joined


def test_small_doc_single_chunk():
    assert split_markdown("tiny doc", 4000, 200) == ["tiny doc"]


def test_empty_doc():
    assert split_markdown("", 4000, 200) == []


def test_deterministic():
    a = split_markdown(MD_DOC, 250, 50)
    b = split_markdown(MD_DOC, 250, 50)
    assert a == b


def test_chunk_ids_one_based_in_order():
    # pipe.py:40-43: ids 1..N
    chunks = split_text_to_chunks(MD_DOC, 300, 60)
    assert [c.id for c in chunks] == list(range(1, len(chunks) + 1))


def test_chunk_images_extracted():
    chunks = split_text_to_chunks(MD_DOC, 8000, 400)
    assert any("images/x.png" in (c.images or []) for c in chunks)


def test_heading_priority_split():
    doc = "## A\n" + "a" * 150 + "\n## B\n" + "b" * 150
    chunks = split_markdown(doc, 200, 20)
    # split should fall on the heading boundary, not mid-run
    assert any(c.startswith("## B") for c in chunks)


@given(st.text(alphabet=" abc\n#.", min_size=0, max_size=500), st.integers(50, 200))
@settings(max_examples=80, deadline=None)
def test_property_size_bound_and_nonempty(text, size):
    chunks = split_markdown(text, size, size // 5)
    for c in chunks:
        assert 0 < len(c) <= size or len(c.split()) == 1  # single oversized token passes through
    if text.strip():
        assert chunks
