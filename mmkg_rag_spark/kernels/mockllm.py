"""Deterministic mock LLM/VLM for hermetic extraction parity testing.

The reference drives extraction with OpenAI-compatible chat calls
(utils/llm.py:29-73) and parses the responses (index/text.py:63-145,
index/mmodal.py:123-160,233-303). For hermetic correctness testing we replace
the model with a deterministic function of the prompt inputs: the synthetic
page generator (sources/pages.py) plants mentions in a fixed surface grammar,
and this module emits exactly the response *strings* a well-behaved LLM would
return for them. The real reference parsers (kernels/parsers.py) then parse
those strings — so the full parse path is exercised, and engine vs replica
comparisons are meaningful.

Both the Spark UDFs (operators/extract.py, operators/mmodal.py) and the pure
reference replica (kernels/refpipeline.py) call these functions; a production
deployment swaps this module for a batched endpoint client with the same
response contract.

Surface grammar planted by the generator:
  entity:    **Name** is a <label phrase> that <description>.
  alias:     **Name** (also known as A1; A2) ...
  relation:  **Source** <verb phrase> **Target**.
  image:     ![caption](path)
References are emitted in the truncated ``"head...tail"`` form to exercise
reference completion (text.py:148-198).
"""

from __future__ import annotations

import json
import re

from .records import Image
from .textops import shorten_string

# label phrase ↔ entity label (subset of the `general` taxonomy, lables.py)
LABEL_PHRASES: dict[str, str] = {
    "person": "PERSON",
    "organization": "ORG",
    "city": "GPE",
    "location": "LOC",
    "product": "PRODUCT",
    "event": "EVENT",
    "work of art": "WORK_OF_ART",
    "law": "LAW",
    "language": "LANGUAGE",
}

# verb phrase ↔ relation label (subset of the `general` taxonomy)
RELATION_PHRASES: dict[str, str] = {
    "collaborates with": "PER-SOC",
    "is part of": "PART-WHOLE",
    "works for": "ORG-AFF",
    "is located in": "PHYS",
    "acquired": "ORG-ORG",
    "founded": "PER-ORG",
}

_LABEL_ALT = "|".join(sorted(LABEL_PHRASES, key=len, reverse=True))
_VERB_ALT = "|".join(
    re.escape(v) for v in sorted(RELATION_PHRASES, key=len, reverse=True)
)

ENTITY_SENT = re.compile(
    rf"\*\*([^*\n]+)\*\*(?: \(also known as ([^)]+)\))? is (?:a|an) ({_LABEL_ALT}) "
    rf"that ([^.!?\n]+)\."
)
RELATION_SENT = re.compile(rf"\*\*([^*\n]+)\*\* ({_VERB_ALT}) \*\*([^*\n]+)\*\*\.")


def _ref_of(sentence: str) -> str:
    """Truncated provenance reference, head...tail (helper.py:39-45 shape)."""
    return shorten_string(sentence.strip(), 10, 10)


def index_response(chunk_text: str) -> str:
    """The INDEX-prompt response: flat JSON objects, one per mention.

    Matches the response schema parse_er expects (parser.py:100-135):
    entities {name,label,description,aliases,references}, relations
    {source,label,target,description,references}.
    """
    blocks: list[str] = []
    for m in ENTITY_SENT.finditer(chunk_text):
        name, _alias_blob, phrase, desc = m.groups()
        blocks.append(
            json.dumps(
                {
                    "name": name.strip(),
                    "label": LABEL_PHRASES[phrase],
                    "description": desc.strip(),
                    "aliases": [],
                    "references": [_ref_of(m.group(0))],
                },
                ensure_ascii=False,
            )
        )
    for m in RELATION_SENT.finditer(chunk_text):
        src, verb, dst = m.groups()
        blocks.append(
            json.dumps(
                {
                    "source": src.strip(),
                    "label": RELATION_PHRASES[verb],
                    "target": dst.strip(),
                    "description": f"{src.strip()} {verb} {dst.strip()}",
                    "references": [_ref_of(m.group(0))],
                },
                ensure_ascii=False,
            )
        )
    return "\n".join(blocks)


def alias_response(chunk_text: str, entity_names: list[str]) -> str:
    """The ALIAS-prompt response: ``<NAME, ["A1", ...]>`` lines.

    Only entities listed in the prompt get alias lines (text.py:24-27), and
    only when the chunk carries an `(also known as ...)` marker for them.
    """
    wanted = set(entity_names)
    lines = []
    for m in ENTITY_SENT.finditer(chunk_text):
        name, alias_blob = m.group(1).strip(), m.group(2)
        if not alias_blob or name not in wanted:
            continue
        aliases = [a.strip() for a in alias_blob.split(";") if a.strip()]
        if aliases:
            alias_json = "[" + ", ".join(json.dumps(a) for a in aliases) + "]"
            lines.append(f"<{name}, {alias_json}>")
    return "\n".join(lines)


_IMG_IN_CONTEXT = re.compile(r"!\[([^\]]*)\]\(([^)]+)\)")
_BOLD_NAME = re.compile(r"\*\*([^*\n]+)\*\*")


def describe_image_response(path: str, context: str) -> str:
    """The DESCRIBE_IMAGE-prompt response: JSON {caption, text_snippets, description}.

    Deterministic stand-in for the VLM (mmodal.py:123-160): caption = the
    markdown alt text for this path found in the context; text_snippets = the
    bold entity surface forms visible in the context.
    """
    caption = ""
    for m in _IMG_IN_CONTEXT.finditer(context):
        if m.group(2) == path:
            caption = m.group(1)
            break
    snippets = sorted({m.group(1).strip() for m in _BOLD_NAME.finditer(context)})
    return json.dumps(
        {
            "caption": caption,
            "text_snippets": snippets,
            "description": f"Deterministic description of {path}: {caption}",
        },
        ensure_ascii=False,
    )


LINK_MIN_SCORE = 0.3  # mock EI_LINK acceptance threshold (deterministic)


def link_response(candidates: list[tuple[str, float]], image: Image) -> str:
    """The EI_LINK-prompt response: JSON list of {entity,label,references,description}.

    Deterministic stand-in for the linking LLM (mmodal.py:233-303): accept
    candidates whose relevance score ≥ LINK_MIN_SCORE; label "depicts".
    ``candidates`` carries (entity_name, relevance_score) for the top-8 set.
    """
    items = [
        {
            "entity": name,
            "label": "depicts",
            "references": [image.caption] if image.caption else [],
            "description": f"{name} appears in {image.path}",
        }
        for name, score in candidates
        if score >= LINK_MIN_SCORE
    ]
    return json.dumps(items, ensure_ascii=False)
