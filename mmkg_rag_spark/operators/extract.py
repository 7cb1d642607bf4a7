"""Map-side extraction stages: html→text, chunking, ER mention extraction.

Pipeline position (SURVEY.md §3.1 steps 2-4): all three stages are
shuffle-free — pure ``mapInPandas`` / ``pandas_udf`` over the pages scan, so
they scale linearly with input partitions and stay inside one stage.

- ``with_text``     : html binary → text, byte-identical per url
                      (north-star invariant; reference pipe.py:35-36).
- ``chunk_pages``   : markdown-aware recursive split, 1-based ids
                      (reference split_text, pipe.py:23-44).
- ``extract_mentions``: per-chunk LLM (mock) extraction + alias promotion +
                      reference completion (reference text.py:63-198) in ONE
                      model pass, emitting a union mention table split into
                      entity/relation views by the caller.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.chunker import split_markdown
from ..kernels.refpipeline import extract_chunk
from ..kernels.records import Chunk
from ..kernels.textops import extract_images_with_context
from ..sources.pages import html_to_text

CHUNK_SCHEMA = "url string, chunk_id int, text string"

MENTION_SCHEMA = (
    "kind string, url string, chunk_id int, name string, label string, "
    "description string, target string, aliases array<string>, "
    "references array<string>"
)

MENTION_COLS = [
    "kind", "url", "chunk_id", "name", "label", "description",
    "target", "aliases", "references",
]


def with_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Replace/add the ``text`` column extracted from html (byte-identical)."""

    @F.pandas_udf("string")
    def _extract(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(html_to_text)

    return pages.withColumn("text", _extract(F.col(html_col)))


def chunk_pages(
    pages: DataFrame, chunk_size: int = 8000, overlap: int = 400
) -> DataFrame:
    """pages(url, text, …) → chunks(url, chunk_id, text); map-only."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, ids, texts = [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                for i, c in enumerate(split_markdown(text, chunk_size, overlap)):
                    urls.append(url)
                    ids.append(i + 1)  # 1-based (pipe.py:40-43)
                    texts.append(c)
            yield pd.DataFrame({"url": urls, "chunk_id": ids, "text": texts})

    return pages.select("url", "text").mapInPandas(gen, schema=CHUNK_SCHEMA)


def extract_mentions(
    chunks: DataFrame, extractor_factory=None, loop: int = 1
) -> DataFrame:
    """chunks → union mention table (kind 'E' | 'R'); map-only, one model pass.

    Mirrors extract_er_from_chunk + find_alias + complete_reference
    (text.py:63-198): each chunk's entity/relation mentions are emitted with
    provenance (url, chunk_id). Alias promotion and endpoint remap happen
    chunk-locally here; corpus-global canonicalization is operators/dedup.py.

    ``extractor_factory``: picklable zero-arg callable building an
    ``mmkg_rag_spark.llm`` Extractor per python worker (e.g.
    ``lambda: EndpointExtractor(base_url=..., ...)``). Default None = the
    deterministic mock kernel path (hermetic, fastest).

    ``loop``: gleaning rounds (reference text.py:97-130, default 1 = none).
    Each extra round re-prompts with the conversation history, extends the
    findings with the additions, then asks the YES/NO continuation question
    — a chunk whose answer contains NO drops out of later rounds. Stays
    map-side: the loop runs per python worker inside this one stage.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extractor = extractor_factory() if extractor_factory is not None else None
        for pdf in batches:
            rows: list[tuple] = []
            chunk_objs = [
                Chunk(id=int(cid), text=t)
                for cid, t in zip(pdf["chunk_id"], pdf["text"])
            ]
            if extractor is not None:
                from ..kernels.parsers import parse_er as _parse_er
                from ..kernels.refpipeline import extract_chunk_from_responses
                from ..llm import INDEX_PROMPT, LOOP_PROMPT

                texts = [c.text for c in chunk_objs]
                index_texts = extractor.index(texts)
                responses: list[list[str]] = [[ix] for ix in index_texts]
                if loop > 1:
                    histories = [
                        [
                            {"role": "user", "content": INDEX_PROMPT + t},
                            {"role": "assistant", "content": ix},
                        ]
                        for t, ix in zip(texts, index_texts)
                    ]
                    active = list(range(len(chunk_objs)))
                    for _ in range(loop - 1):
                        if not active:
                            break
                        gleaned = extractor.glean([histories[i] for i in active])
                        for i, g in zip(active, gleaned):
                            responses[i].append(g)
                            histories[i].extend(
                                [
                                    {"role": "user", "content": LOOP_PROMPT},
                                    {"role": "assistant", "content": g},
                                ]
                            )
                        cont = extractor.should_continue(
                            [histories[i] for i in active]
                        )
                        # reference text.py:129: break when "NO" in answer
                        active = [
                            i for i, c in zip(active, cont) if "NO" not in c.upper()
                        ]
                names = [
                    [e.name for resp in rs for e in _parse_er(resp)[0]]
                    for rs in responses
                ]
                alias_texts = extractor.alias(texts, names)
                results = [
                    extract_chunk_from_responses(c, rs, al)
                    for c, rs, al in zip(chunk_objs, responses, alias_texts)
                ]
            else:
                results = [extract_chunk(c) for c in chunk_objs]
            for url, c, (ents, rels) in zip(pdf["url"], chunk_objs, results):
                chunk_id = c.id
                for e in ents:
                    rows.append((
                        "E", url, int(chunk_id), e.name, e.label,
                        e.description, None, e.aliases or [], e.references or [],
                    ))
                for r in rels:
                    rows.append((
                        "R", url, int(chunk_id), r.source, r.label,
                        r.description, r.target, None, r.references or [],
                    ))
            yield pd.DataFrame(rows, columns=MENTION_COLS)

    return chunks.mapInPandas(gen, schema=MENTION_SCHEMA)


def split_mentions(mentions: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Union mention table → (entity_mentions, relation_mentions) views."""
    entity_mentions = mentions.filter(F.col("kind") == "E").select(
        "url", "chunk_id", "name", "label", "description", "aliases", "references"
    )
    relation_mentions = mentions.filter(F.col("kind") == "R").select(
        "url", "chunk_id",
        F.col("name").alias("source"), "label", "target",
        "description", "references",
    )
    return entity_mentions, relation_mentions


NORMALIZED_SCHEMA = (
    "url string, text string, renames array<struct<old:string, new:string>>"
)


def normalize_image_refs(pages: DataFrame) -> DataFrame:
    """Ingestion-time image-ref normalization (helper.py:150-183, §2.7).

    Rewrites markdown image refs to ``<md5(url)>_<i>.<ext>`` per document and
    carries the (old,new) rename plan as data — downstream the plan joins
    against the assets manifest instead of renaming files imperatively.
    Map-only; deterministic per url.
    """
    from ..kernels.textops import md5 as _md5
    from ..kernels.textops import rename_markdown_images_text

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, texts, plans = [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                new_text, plan = rename_markdown_images_text(text, _md5(url)[:12])
                urls.append(url)
                texts.append(new_text)
                plans.append([{"old": o, "new": n} for o, n in plan])
            yield pd.DataFrame({"url": urls, "text": texts, "renames": plans})

    return pages.select("url", "text").mapInPandas(gen, schema=NORMALIZED_SCHEMA)


def extract_page_artifacts(
    pages: DataFrame,
    chunk_size: int = 8000,
    overlap: int = 400,
    *,
    use_html: bool = True,
    html_col: str = "html",
) -> DataFrame:
    """Fused S2+S3+E1+M1: html→text, chunking, mention extraction and the
    image-instance scan in ONE ``mapInPandas`` pass (mock-extractor path —
    the hermetic default ``build_kg`` runs; a remote-LLM extractor keeps
    the staged composition, whose per-stage batching it needs).

    Why fuse: the staged composition moves the full page text across the
    JVM↔Python Arrow boundary three times (html→text UDF out, chunk rows
    out of the chunker, chunk rows back INTO the extractor) plus a
    pages-wide ``.cache()`` so the image branch can rescan it. At the
    DRAM-bandwidth-bound high-core level those crossings are pure memory
    traffic — each is a serialize+copy of ~corpus bytes. Fused, the page
    payload crosses ONCE (into the pass) and only mention/instance rows —
    orders of magnitude smaller — ever return. Same kernels, same rows:
    equality with the staged composition is pinned by
    tests/test_spark_pipeline.py::test_fused_artifacts_equal_staged.

    Output: the union MENTION_SCHEMA with a third kind — 'I' rows carry
    image instances as (name=path, description=context) with chunk_id 0.
    ``split_mentions`` reads E/R; ``split_image_instances`` recovers the
    (url, path, context) table M2 filters.
    """
    src_col = html_col if use_html else "text"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for url, payload in zip(pdf["url"], pdf[src_col]):
                text = html_to_text(payload) if use_html else payload
                for path, ctx in extract_images_with_context(text):
                    rows.append(
                        ("I", url, 0, path, None, ctx, None, None, None)
                    )
                for i, ck in enumerate(
                    split_markdown(text, chunk_size, overlap)
                ):
                    ents, rels = extract_chunk(Chunk(id=i + 1, text=ck))
                    for e in ents:
                        rows.append((
                            "E", url, i + 1, e.name, e.label, e.description,
                            None, e.aliases or [], e.references or [],
                        ))
                    for r in rels:
                        rows.append((
                            "R", url, i + 1, r.source, r.label,
                            r.description, r.target, None,
                            r.references or [],
                        ))
            yield pd.DataFrame(rows, columns=MENTION_COLS)

    cols = [pages["url"], pages[src_col]]
    return pages.select(*cols).mapInPandas(gen, schema=MENTION_SCHEMA)


def split_image_instances(artifacts: DataFrame) -> DataFrame:
    """kind 'I' artifact rows → the (url, path, context) instance table
    (M1's output shape, ready for filter_valid_images)."""
    return (
        artifacts.filter(F.col("kind") == "I")
        .select(
            "url",
            F.col("name").alias("path"),
            F.col("description").alias("context"),
        )
        .dropDuplicates(["url", "path", "context"])
    )
