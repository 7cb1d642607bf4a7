"""Reference-replica pipeline (pure Python, single process, LLM mocked).

Semantics-faithful replay of the reference's construction flow
(index/pipe.py:47-111 ``index_graph`` / text.py:63-145
``extract_er_from_chunk`` / deduplicate.py:19-65 / mmodal.py:21-77) with the
deterministic mock model (kernels/mockllm.py) and the deterministic merge
policy (kernels/canonicalize.py). This is the CORRECTNESS ORACLE: the Spark
engine's output is compared against this replica's output for the triple
P/R ≥ 0.95 gate (BASELINE.md). Only ever run at test scale.
"""

from __future__ import annotations

from .canonicalize import deduplicate_sync
from .chunker import split_text_to_chunks
from .mockllm import (
    alias_response,
    describe_image_response,
    index_response,
    link_response,
)
from .parsers import (
    parse_alias,
    parse_er,
    parse_image_description,
    parse_json_list,
)
from .records import Chunk, Entity, Image, Relation
from .similarity import image_entity_relevance
from .textops import (
    VALID_IMAGE_SUFFIXES,
    complete_references,
    extract_images_with_context,
    promote_canonical_name,
)

IMAGE_CANDIDATE_CAP = 8  # mmodal.py:69-71
IMAGE_MIN_RELEVANCE = 0.1  # mmodal.py:223


def extract_chunk(chunk: Chunk) -> tuple[list[Entity], list[Relation]]:
    """Replay of ``extract_er_from_chunk`` (text.py:63-145), loop=1, mocked LLM."""
    index_text = index_response(chunk.text)
    entities, _ = parse_er(index_text)
    alias_text = alias_response(chunk.text, [e.name for e in entities])
    return extract_chunk_from_responses(chunk, index_text, alias_text)


def extract_chunk_from_responses(
    chunk: Chunk, index_text: str | list[str], alias_text: str
) -> tuple[list[Entity], list[Relation]]:
    """Post-model half of extract_er_from_chunk: parse → alias → complete.

    Separated from the model call so ANY Extractor (mock or endpoint,
    mmkg_rag_spark/llm.py) feeds the same parsing/promotion path.

    ``index_text`` may be a list of responses — the initial INDEX answer plus
    gleaning-round additions (text.py:97-122): each is parsed and the
    findings extended in order, exactly as the reference extends
    entities/relations across loop rounds before alias promotion.
    """
    responses = [index_text] if isinstance(index_text, str) else list(index_text)
    entities, relations = [], []
    for resp in responses:
        es, rs = parse_er(resp)
        entities.extend(es)
        relations.extend(rs)
    for e in entities:
        e.chunks = [chunk.id]
    for r in relations:
        r.chunks = [chunk.id]

    # find_alias (text.py:16-60): promote longest name, remap relation endpoints
    aliases = parse_alias(alias_text)
    name_mapping: dict[str, str] = {}
    for entity_name, alias_list in aliases:
        entity = next((e for e in entities if e.name == entity_name), None)
        if entity is None:
            continue
        full_name, others = promote_canonical_name(entity_name, alias_list)
        name_mapping[entity.name] = full_name
        entity.name = full_name
        entity.aliases = others
    for r in relations:
        r.source = name_mapping.get(r.source, r.source)
        r.target = name_mapping.get(r.target, r.target)

    # complete_reference (text.py:148-198)
    for e in entities:
        e.references = complete_references(e.references, chunk.text)
    for r in relations:
        r.references = complete_references(r.references, chunk.text)
    return entities, relations


def mmodal_index(
    text: str, entities: list[Entity], valid_paths: set[str]
) -> tuple[list[Relation], list[Image]]:
    """Replay of ``mmodal_index`` (mmodal.py:21-77) with mock VLM.

    The filesystem existence check (mmodal.py:48-49) becomes membership in the
    generator's asset manifest ``valid_paths``.
    """
    found = extract_images_with_context(text)
    confirmed = [
        (path, ctx)
        for path, ctx in found
        if path in valid_paths and path.rsplit(".", 1)[-1] in VALID_IMAGE_SUFFIXES
    ]
    images: list[Image] = []
    seen: set[tuple[str, str]] = set()
    for path, ctx in confirmed:
        if (path, ctx) in seen:  # lru_cache dedup of identical calls (mmodal.py:123)
            continue
        seen.add((path, ctx))
        caption, texts, description = parse_image_description(
            describe_image_response(path, ctx)
        )
        images.append(
            Image(path=path, caption=caption, texts=texts, description=description)
        )

    relations: list[Relation] = []
    for img in images:
        if not img.texts and not img.caption:
            continue
        scored = [
            (e, image_entity_relevance([e.name] + (e.aliases or []), img.caption, img.texts or []))
            for e in entities
        ]
        # reference sorts by score only (mmodal.py:223-226); its tie order is
        # the arbitrary entity-list order, so we fix ties by name — the engine
        # window (operators/mmodal.py) uses the same (score desc, name) rule
        ranked = [
            (e.name, s)
            for e, s in sorted(scored, key=lambda x: (-x[1], x[0].name))
            if s >= IMAGE_MIN_RELEVANCE
        ][:IMAGE_CANDIDATE_CAP]
        raw = link_response(ranked, img)
        for d in parse_json_list(raw, fields=["entity", "label", "references", "description"]):
            relations.append(
                Relation(
                    source=d["entity"],
                    target=img.path,
                    label="#image" + d["label"],  # mmodal.py:297
                    references=d["references"],
                    description=d["description"],
                )
            )
    return relations, images


def build_graph(
    docs: list[tuple[str, str]],
    valid_paths: set[str] | None = None,
    chunk_size: int = 8000,
    overlap: int = 400,
) -> tuple[list[Entity], list[Relation], list[Image], list[Relation]]:
    """Corpus-level replica: (url, text) docs → (entities, relations, images, image_relations).

    Mirrors ``index_graph`` (pipe.py:47-111) applied to the whole corpus as one
    batch (the engine processes the corpus the same way), with the final sorts
    of pipe.py:98-100.
    """
    valid_paths = valid_paths or set()
    entities: list[Entity] = []
    relations: list[Relation] = []
    for _url, text in docs:
        for chunk in split_text_to_chunks(text, chunk_size, overlap):
            es, rs = extract_chunk(chunk)
            entities.extend(es)
            relations.extend(rs)

    entities, relations = deduplicate_sync(entities, relations)

    image_relations: list[Relation] = []
    images: list[Image] = []
    seen_paths: set[str] = set()
    for _url, text in docs:
        irs, imgs = mmodal_index(text, entities, valid_paths)
        image_relations.extend(irs)
        for img in imgs:  # dedupe by path (search.py:303-305 semantics)
            if img.path not in seen_paths:
                seen_paths.add(img.path)
                images.append(img)

    entities.sort(key=lambda e: e.name)
    relations.sort(key=lambda r: r.source + r.target)
    image_relations.sort(key=lambda r: r.source + r.target)
    return entities, relations, images, image_relations
