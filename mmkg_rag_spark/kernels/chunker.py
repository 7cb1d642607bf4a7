"""Deterministic Markdown-aware recursive chunker.

The reference splits documents with langchain's ``MarkdownTextSplitter``
(index/pipe.py:38-43, callers pass chunk_size=8000 / overlap=400,
pipe.py:49-50). langchain is not available here, so this module reimplements
the same public algorithm — a recursive character splitter over the Markdown
separator hierarchy with greedy merge + sliding overlap — from its documented
behavior. Chunk ids are 1-based in document order (pipe.py:40-43).

This is a pure function of (text, chunk_size, overlap): the Spark chunking UDF
(operators/extract.py) and the reference-replica oracle both call it, so chunk
boundaries agree byte-for-byte between engine and oracle.
"""

from __future__ import annotations

import re

from .records import Chunk
from .textops import extract_image_links

# Markdown separator hierarchy (langchain Language.MARKDOWN, regex mode).
MARKDOWN_SEPARATORS = [
    "\n#{1,6} ",
    "```\n",
    "\n\\*\\*\\*+\n",
    "\n---+\n",
    "\n___+\n",
    "\n\n",
    "\n",
    " ",
    "",
]


def _regex_split_keep(text: str, sep_pattern: str) -> list[str]:
    """Split on a regex, re-attaching each separator to the following piece."""
    if sep_pattern == "":
        return [c for c in text]
    pieces = re.split(f"({sep_pattern})", text)
    glued = [pieces[i] + pieces[i + 1] for i in range(1, len(pieces), 2)]
    if len(pieces) % 2 == 0:
        glued += pieces[-1:]
    return [s for s in ([pieces[0]] + glued) if s != ""]


def _join(parts: list[str], sep: str) -> str | None:
    text = sep.join(parts).strip()
    return text if text else None


def _merge(parts: list[str], sep: str, chunk_size: int, overlap: int) -> list[str]:
    """Greedy accumulate parts into ≤chunk_size windows with trailing overlap."""
    sep_len = len(sep)
    docs: list[str] = []
    window: list[str] = []
    total = 0
    for part in parts:
        plen = len(part)
        if total + plen + (sep_len if window else 0) > chunk_size:
            if window:
                joined = _join(window, sep)
                if joined is not None:
                    docs.append(joined)
                while total > overlap or (
                    total + plen + (sep_len if len(window) > 1 else 0) > chunk_size
                    and total > 0
                ):
                    total -= len(window[0]) + (sep_len if len(window) > 1 else 0)
                    window = window[1:]
        window.append(part)
        total += plen + (sep_len if len(window) > 1 else 0)
    joined = _join(window, sep)
    if joined is not None:
        docs.append(joined)
    return docs


def _split_recursive(
    text: str, separators: list[str], chunk_size: int, overlap: int
) -> list[str]:
    final: list[str] = []
    # pick the first separator that occurs in the text (last = "" always works)
    sep = separators[-1]
    remaining: list[str] = []
    for i, candidate in enumerate(separators):
        if candidate == "":
            sep = candidate
            break
        if re.search(candidate, text):
            sep = candidate
            remaining = separators[i + 1 :]
            break
    pieces = _regex_split_keep(text, sep)
    pending: list[str] = []
    for piece in pieces:
        if len(piece) < chunk_size:
            pending.append(piece)
        else:
            if pending:
                final.extend(_merge(pending, "", chunk_size, overlap))
                pending = []
            if not remaining:
                final.append(piece)
            else:
                final.extend(_split_recursive(piece, remaining, chunk_size, overlap))
    if pending:
        final.extend(_merge(pending, "", chunk_size, overlap))
    return final


def split_markdown(text: str, chunk_size: int = 8000, overlap: int = 400) -> list[str]:
    """Split markdown text into overlapping chunks (langchain-compatible)."""
    return _split_recursive(text, MARKDOWN_SEPARATORS, chunk_size, overlap)


def split_text_to_chunks(
    text: str, chunk_size: int = 8000, overlap: int = 400
) -> list[Chunk]:
    """Chunk records with 1-based ids and per-chunk image links (pipe.py:38-43)."""
    return [
        Chunk(id=i + 1, text=c, images=extract_image_links(c))
        for i, c in enumerate(split_markdown(text, chunk_size, overlap))
    ]
