"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Authoritative input shape (BASELINE.json ``input_hint``):
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Every row is a pure function of ``(seed, doc_id)`` — hash-based PRNG, no
mutable state — so the table is generated *distributed* (``spark.range`` →
``mapInPandas``) at any scale and the single-process oracle
(kernels/refpipeline.py) sees byte-identical text for the same ids.

The text plants mentions in the mock-LLM surface grammar
(kernels/mockllm.py): entity sentences (sometimes with ``(also known as …)``
alias markers and sometimes with scrambled token order — exercising the fuzzy
token_sort_ratio dedup path), relation sentences, and markdown image refs
(valid, bad-suffix, and missing-from-manifest — exercising the M2 filter).
One head entity appears in ~10% of docs (skew for the salted join). ~8% of
docs are long enough to split into multiple chunks at the reference's
8000/400 chunking.

``render_html`` / ``html_to_text`` are exact inverses; the pytest gate
asserts ``html_to_text(render_html(text)) == text`` byte-identically per url
(north-star invariant).
"""

from __future__ import annotations

import datetime as dt
import hashlib

FIRST = ["Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald", "John", "Margaret",
         "Tim", "Vint", "Radia", "Leslie", "Ken", "Dennis", "Bjarne", "Guido"]
LAST = ["Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Knuth", "McCarthy",
        "Hamilton", "Berners-Lee", "Cerf", "Perlman", "Lamport", "Thompson",
        "Ritchie", "Stroustrup", "Rossum"]
ORG_A = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Cyberdyne",
         "Tyrell", "Aperture", "Vault", "Hooli", "Pied", "Wonka", "Oscorp"]
ORG_B = ["Systems", "Industries", "Laboratories", "Analytics", "Dynamics",
         "Computing", "Networks", "Robotics", "Research", "Holdings"]
CITY = ["Zurich", "Osaka", "Porto", "Tallinn", "Quito", "Lagos", "Perth",
        "Vilnius", "Cusco", "Bergen", "Sapporo", "Windhoek"]

HEAD_ENTITY = ("Global Web Consortium", "organization",
               "coordinates open web standards worldwide")
HEAD_ALIASES = ["GWC", "The Consortium"]

LANGS = ["en", "de", "es", "fr", "zh"]
VERBS = ["collaborates with", "is part of", "works for", "is located in",
         "acquired", "founded"]

FILLER = ("The quarterly report covers infrastructure spending and archive "
          "crawls across mirrored data centers. Operators reviewed caching, "
          "indexing and storage budgets without reaching a final decision.")


def _h(*parts) -> int:
    """Deterministic 64-bit hash of the parts — the per-row PRNG."""
    raw = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")


def catalog_entities(seed: int = 42) -> list[dict]:
    """The seeded global entity catalog: name, kind phrase, description, aliases."""
    ents: list[dict] = []
    for i, (f, l) in enumerate(zip(FIRST, LAST)):
        name = f"{f} {l}"
        ents.append({
            "name": name, "kind": "person",
            "desc": f"contributed foundational work in computing field {i}",
            "aliases": [f, f"{f[0]}. {l}"],
        })
    for i in range(len(ORG_A)):
        a = ORG_A[(i * 7 + seed) % len(ORG_A)]
        b = ORG_B[(i * 5 + seed) % len(ORG_B)]
        name = f"{a} {b}"
        ents.append({
            "name": name, "kind": "organization",
            "desc": f"operates commercial platforms in sector {i}",
            "aliases": [a],
        })
    for i, c in enumerate(CITY):
        ents.append({
            "name": f"{c} Metropolitan Area", "kind": "city",
            "desc": f"hosts regional data infrastructure hub {i}",
            "aliases": [c],
        })
    ents.append({
        "name": HEAD_ENTITY[0], "kind": HEAD_ENTITY[1],
        "desc": HEAD_ENTITY[2], "aliases": list(HEAD_ALIASES),
    })
    return ents


def image_manifest(n_images: int = 40) -> list[str]:
    """Valid asset paths (the M2 existence check's manifest table)."""
    return [f"images/img_{k}.png" for k in range(n_images)]


def _entity_sentence(ent: dict, rng: int, variant: int) -> str:
    """One planted entity mention in the mock-LLM grammar."""
    name = ent["name"]
    if variant % 5 == 3 and " " in name and "." not in name:
        toks = name.split(" ")
        name = " ".join(toks[::-1])  # scrambled order → fuzzy (not exact) dedup path
    article = "an" if ent["kind"][0] in "aeiou" else "a"
    alias_marker = ""
    if variant % 3 == 0 and ent["aliases"]:
        alias_marker = " (also known as " + "; ".join(ent["aliases"]) + ")"
    return f"**{name}**{alias_marker} is {article} {ent['kind']} that {ent['desc']}."


def page_record(doc_id: int, seed: int = 42) -> dict:
    """Pure generator for one page row (no html; see render_html)."""
    ents = catalog_entities(seed)
    n_cat = len(ents) - 1  # last = head entity
    rng = _h(seed, doc_id)

    paras: list[str] = [f"# Crawl digest {doc_id}", FILLER]
    k_ents = 2 + rng % 4
    chosen = []
    for j in range(k_ents):
        idx = _h(seed, doc_id, "e", j) % n_cat
        ent = ents[idx]
        if ent["name"] not in [c["name"] for c in chosen]:
            chosen.append(ent)
    if rng % 10 == 0:  # head entity in ~10% of docs → skew
        chosen.append(ents[-1])
    for j, ent in enumerate(chosen):
        paras.append(_entity_sentence(ent, rng, _h(seed, doc_id, "v", j)))

    if len(chosen) >= 2:
        k_rel = 1 + _h(seed, doc_id, "r") % min(3, len(chosen) - 1)
        for j in range(k_rel):
            a = chosen[_h(seed, doc_id, "ra", j) % len(chosen)]
            b = chosen[_h(seed, doc_id, "rb", j) % len(chosen)]
            if a["name"] == b["name"]:
                continue
            verb = VERBS[_h(seed, doc_id, "rv", j) % len(VERBS)]
            paras.append(f"**{a['name']}** {verb} **{b['name']}**.")

    img_roll = _h(seed, doc_id, "img") % 10
    if img_roll < 3:  # valid image
        k = _h(seed, doc_id, "imgk") % 40
        cap = chosen[0]["name"] if chosen else "archive chart"
        paras.append(f"Figure below. ![{cap} overview](images/img_{k}.png) "
                     f"The figure summarizes activity.")
    elif img_roll == 3:  # invalid suffix (M2 drop)
        paras.append(f"Scan attached. ![raw scan](images/bad_{doc_id % 7}.tiff) End.")
    elif img_roll == 4:  # not in manifest (M2 drop)
        paras.append(f"See also. ![lost plot](images/missing_{doc_id % 5}.png) End.")

    if _h(seed, doc_id, "long") % 12 == 0:  # ~8% long docs → multi-chunk
        for p in range(48):
            paras.append(f"## Section {p}\n" + FILLER + f" Batch {p} of digest {doc_id}.")

    text = "\n\n".join(paras)
    ts = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=int(_h(seed, doc_id, "ts") % (180 * 86400))
    )
    return {
        "url": f"https://ex{doc_id % 97}.test/doc/{doc_id}",
        "warc_ts": ts,
        "text": text,
        "lang": LANGS[_h(seed, doc_id, "lang") % len(LANGS)],
    }


# --- html <-> text: exact inverse pair ------------------------------------

def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _unesc(s: str) -> str:
    return s.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")


def render_html(url: str, text: str) -> bytes:
    """Deterministic html wrapper of `text` (paragraphs → <p>, newlines → <br>)."""
    paras = text.split("\n\n")
    body = "\n".join(
        "<p>" + _esc(p).replace("\n", "<br>") + "</p>" for p in paras
    )
    doc = (
        "<!DOCTYPE html>\n<html>\n<head>\n<meta charset=\"utf-8\">\n"
        f"<title>{_esc(url)}</title>\n</head>\n<body>\n{body}\n</body>\n</html>\n"
    )
    return doc.encode("utf-8")


def html_to_text(html: bytes) -> str:
    """Inverse of render_html — the byte-identical extraction kernel.

    Stands in for the reference's file-content production (pdf_2_md /
    file read, utils/helper.py:119-147, pipe.py:35-36): the engine's one and
    only text producer (SURVEY.md §7.3).
    """
    s = html.decode("utf-8")
    start = s.index("<body>\n") + len("<body>\n")
    end = s.rindex("\n</body>")
    body = s[start:end]
    paras = [
        _unesc(p[3:-4].replace("<br>", "\n"))
        for p in body.split("\n")
    ]
    return "\n\n".join(paras)


def gen_pages_local(n_docs: int, seed: int = 42) -> list[dict]:
    """Driver-side generation (tests / oracle only — never at scale)."""
    rows = []
    for d in range(n_docs):
        r = page_record(d, seed)
        r["html"] = render_html(r["url"], r["text"])
        rows.append(r)
    return rows


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def gen_pages_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed pages table: spark.range → mapInPandas, scales linearly.

    Each task generates its id-slice independently (pure function of id), so
    there is no driver bottleneck and no shuffle.
    """
    import pandas as pd

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches):
        for pdf in batches:
            recs = []
            for doc_id in pdf["id"]:
                r = page_record(int(doc_id), seed)
                r["html"] = render_html(r["url"], r["text"])
                recs.append(r)
            out = pd.DataFrame(
                recs, columns=["url", "warc_ts", "html", "text", "lang"]
            )
            yield out

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
