"""Gazetteer mention detection and context-overlap entity linking.

The reference pipeline detects entity mentions with an LLM prompt pass
(/root/reference/src/mmkg_rag/index/text.py:32-80) and links images to
entities by caption/alt-text token overlap
(/root/reference/src/mmkg_rag/index/mmodal.py:190-228).  This module is
the classic pre-LLM stage of the same KG-construction stack — the one
every production pipeline runs FIRST because it is ~free at corpus
scale: dictionary (gazetteer) mention spotting and coherence-based
disambiguation of ambiguous surface forms (the Mihalcea-Csomai /
"wikification" shape: candidate set from an alias dictionary, winner by
context-term overlap).

Scale design (10^12 docs):

- The gazetteer and the candidate/context tables are DIMENSIONS —
  thousands to low millions of rows against 10^12 docs — so every join
  here is an explicit ``F.broadcast``; the fact side never shuffles for
  a join.
- Mention spotting never runs substring search per (doc × surface):
  docs are tokenized ONCE into unigram + adjacent-bigram streams
  (``posexplode``-free: two array ``slice``s and a ``zip_with``, all
  whole-stage-codegen expressions), then a single broadcast-hash join
  against the surface dictionary filters the stream map-side.  The only
  shuffle in the whole operator is the final (doc_id, surface) count
  aggregation, which combines map-side.
- Linking scores are count aggregates per (doc_id, surface, entity) —
  again one map-side-combinable shuffle keyed by doc, so head entities
  ("Wikipedia-class hubs" in the north star) cannot skew a partition:
  the key space is doc-sided, not entity-sided.
- The winner-per-mention step is a window over (doc_id, surface) whose
  partitions are bounded by the candidate fan-out of ONE surface form
  (≤ tens), the cheapest possible window.

Counting contract (documented, oracle-mirrored): every gazetteer
surface is counted independently on its own n-gram stream — "hash join"
the bigram and "hash"/"join" unigrams (if they were in the gazetteer)
would each count.  Longest-match-only suppression is a policy layer on
top, not part of the detection operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Published gazetteer over the synthetic webtext vocabulary (TESTDATA.md
# documents.text) — fixed constants, same role as the published m/u
# weights in operators/linkage.py: they make the query a pure function
# of the corpus that an independent SQL oracle can replay.
GAZETTEER: list[str] = [
    "big table",
    "customer",
    "fast sort",
    "hash join",
    "merge join",
    "sort key",
    "stream",
    "stream batch",
    "table scan",
    "window",
]

# (surface, entity_id): the alias dictionary.  "window" and "stream"
# are deliberately AMBIGUOUS (two candidate entities each) — they are
# what the linking step exists for.
CANDIDATES: list[tuple[str, str]] = [
    ("big table", "ds:big_table"),
    ("customer", "ds:customer_dim"),
    ("fast sort", "op:fast_sort"),
    ("hash join", "op:hash_join"),
    ("merge join", "op:merge_join"),
    ("sort key", "op:sort_key"),
    ("stream", "ds:stream_table"),
    ("stream", "rt:stream_runtime"),
    ("stream batch", "rt:stream_batch"),
    ("table scan", "op:table_scan"),
    ("window", "fn:window_func"),
    ("window", "op:window_agg"),
]

# (entity_id, context term): each candidate's coherence profile.  Score
# of a candidate in a doc = total occurrences of its context terms in
# that doc's token stream.
CONTEXTS: list[tuple[str, str]] = [
    ("op:window_agg", "group"),
    ("op:window_agg", "agg"),
    ("op:window_agg", "sort"),
    ("fn:window_func", "query"),
    ("fn:window_func", "value"),
    ("fn:window_func", "row"),
    ("rt:stream_runtime", "batch"),
    ("rt:stream_runtime", "fast"),
    ("rt:stream_runtime", "spark"),
    ("ds:stream_table", "table"),
    ("ds:stream_table", "scan"),
    ("ds:stream_table", "data"),
]


def doc_token_array(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, ts: array<string>) — whitespace tokens, empties dropped.

    Single-space split + empty filter is the engine/oracle-portable
    tokenization (Spark ``split`` and DuckDB ``string_split`` agree on
    it exactly; regex splitters differ at boundaries).
    """
    ts = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return docs.select(F.col(id_col).alias("doc_id"), ts.alias("ts"))


def doc_grams(docs: DataFrame, **kw) -> DataFrame:
    """(doc_id, gram) — every unigram and adjacent bigram, with
    multiplicity.  Pure array expressions, no UDF:  bigrams are
    ``zip_with(ts[:-1], ts[1:], concat-with-space)``.
    """
    t = doc_token_array(docs, **kw)
    n = F.size("ts")
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice("ts", 1, n - 1),
            F.slice("ts", 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return t.select(
        "doc_id", F.explode(F.concat(F.col("ts"), bi)).alias("gram")
    )


def gazetteer_mentions(
    docs: DataFrame,
    surfaces: list[str] | None = None,
    **kw,
) -> DataFrame:
    """(doc_id, surface, n_mentions) — occurrence counts of each
    gazetteer surface form per document.  One broadcast join + one
    map-side-combinable groupBy; nothing else shuffles."""
    spark = docs.sparkSession
    dict_df = spark.createDataFrame(
        [(s,) for s in (surfaces if surfaces is not None else GAZETTEER)],
        "surface string",
    )
    grams = doc_grams(docs, **kw)
    return (
        grams.join(
            F.broadcast(dict_df), grams["gram"] == dict_df["surface"], "inner"
        )
        .groupBy("doc_id", "surface")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


def mention_spans(
    docs: DataFrame,
    surfaces: list[str] | None = None,
    **kw,
) -> DataFrame:
    """(doc_id, surface, n_mentions, first_idx, last_idx) — mention
    counts WITH span anchors: 1-based token index of the first and last
    occurrence (for a bigram surface, the index of its first token).

    Real mention tables carry offsets (they feed context windows and
    entity-image proximity scoring — the reference's ±200-char context
    scan, src/mmkg_rag/index/mmodal.py:45-70, is exactly a span
    consumer). Positions ride along free: the unigram stream keeps its
    ``posexplode`` index, the bigram stream's gram i starts at token i,
    and the aggregate adds a min/max to the same single shuffle that
    computes the counts.
    """
    spark = docs.sparkSession
    dict_df = spark.createDataFrame(
        [(s,) for s in (surfaces if surfaces is not None else GAZETTEER)],
        "surface string",
    )
    t = doc_token_array(docs, **kw)
    n = F.size("ts")
    bi_arr = F.when(
        n >= 2,
        F.zip_with(
            F.slice("ts", 1, n - 1),
            F.slice("ts", 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    uni = t.select(
        "doc_id", F.posexplode("ts").alias("p", "gram")
    ).select("doc_id", "gram", (F.col("p") + 1).cast("long").alias("idx"))
    bi = t.select(
        "doc_id", F.posexplode(bi_arr).alias("p", "gram")
    ).select("doc_id", "gram", (F.col("p") + 1).cast("long").alias("idx"))
    grams = uni.unionByName(bi)
    return (
        grams.join(
            F.broadcast(dict_df), grams["gram"] == dict_df["surface"], "inner"
        )
        .groupBy("doc_id", "surface")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.min("idx").alias("first_idx"),
            F.max("idx").alias("last_idx"),
        )
    )


def surface_cooccurrence(
    docs: DataFrame,
    surfaces: list[str] | None = None,
    **kw,
) -> DataFrame:
    """(surface_a, surface_b, n_docs, w_min) with surface_a < surface_b —
    the co-mention EDGE BUILDER: which dictionary entities occur in the
    same documents, how often (n_docs = co-mentioning documents, w_min =
    Σ_docs min(count_a, count_b), the standard co-occurrence mass that
    caps a doc's contribution at its rarer mention).

    This is the step that turns mention detection into a graph — the
    co-occurrence network GraphRAG-style pipelines build communities
    over, and the direct generalization of the reference's
    entities-sharing-a-chunk relation candidates
    (/root/reference/src/mmkg_rag/index/text.py:81-118).

    Scale shape: the self-join is keyed by doc_id and each side is the
    per-doc MENTION table (≤ |gazetteer| rows per doc, typically a
    handful), so the pair fan-out per doc is C(k, 2) of a small k —
    bounded by the dictionary, not the corpus; the output key space is
    (surface, surface), at most |gazetteer|² rows. One count shuffle +
    one doc-keyed self-join + one pair-keyed groupBy.
    """
    m = gazetteer_mentions(docs, surfaces, **kw)
    a = m.select(
        "doc_id",
        F.col("surface").alias("surface_a"),
        F.col("n_mentions").alias("na"),
    )
    b = m.select(
        "doc_id",
        F.col("surface").alias("surface_b"),
        F.col("n_mentions").alias("nb"),
    )
    return (
        a.join(b, "doc_id")
        .where(F.col("surface_a") < F.col("surface_b"))
        .groupBy("surface_a", "surface_b")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.least("na", "nb")).cast("long").alias("w_min"),
        )
    )


def link_mentions(
    docs: DataFrame,
    candidates: list[tuple[str, str]] | None = None,
    contexts: list[tuple[str, str]] | None = None,
    *,
    ambiguous_only: bool = True,
    **kw,
) -> DataFrame:
    """(doc_id, surface, entity_id, score, n_mentions) — the winning
    candidate entity for each detected mention, by context-term overlap.

    Winner = argmax over the surface's candidates of (occurrences of the
    candidate's context terms in the doc), ties to the lexicographically
    smallest entity_id — a total order, so the result is a pure function
    of (corpus, dictionary).  Candidates with no context hits score 0
    and can still win (every mention gets a link; abstention is a
    downstream threshold policy).
    """
    spark = docs.sparkSession
    cand = candidates if candidates is not None else CANDIDATES
    ctx = contexts if contexts is not None else CONTEXTS
    if ambiguous_only:
        from collections import Counter

        fan = Counter(s for s, _ in cand)
        cand = [(s, e) for s, e in cand if fan[s] > 1]
    cand_df = spark.createDataFrame(cand, "surface string, entity_id string")
    ctx_df = spark.createDataFrame(ctx, "entity_id string, term string")

    mentions = gazetteer_mentions(
        docs, sorted({s for s, _ in cand}), **kw
    )

    toks = doc_token_array(docs, **kw).select(
        "doc_id", F.explode("ts").alias("tok")
    )
    scores = (
        toks.join(F.broadcast(ctx_df), toks["tok"] == ctx_df["term"], "inner")
        .groupBy("doc_id", "entity_id")
        .agg(F.count(F.lit(1)).alias("score"))
    )

    grid = mentions.join(F.broadcast(cand_df), "surface")
    scored = grid.join(scores, ["doc_id", "entity_id"], "left").withColumn(
        "score", F.coalesce("score", F.lit(0)).cast("long")
    )
    w = Window.partitionBy("doc_id", "surface").orderBy(
        F.desc("score"), F.asc("entity_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "surface", "entity_id", "score", "n_mentions")
    )


def _floor_log2_ratio(num_col: str, den_col: str):
    """floor(log2(num/den)) for positive BIGINT columns, exactly.

    e = bits(num) − bits(den) brackets the answer to {e−1, e}; one
    integer shift-compare settles it (shiftleft takes a column shift
    only in SQL-expression form, hence F.expr). Shifts are bounded by
    the operand bit widths (≤ ~60), so nothing overflows. The same
    arithmetic runs verbatim in the DuckDB twin (length(bin(x)) and
    <<)."""
    e = f"CAST(length(bin({num_col})) - length(bin({den_col})) AS BIGINT)"
    return F.expr(
        f"""CASE WHEN {e} >= 0 THEN
      (CASE WHEN {num_col} >= {den_col}
                 * shiftleft(CAST(1 AS BIGINT), CAST({e} AS INT))
            THEN {e} ELSE {e} - 1 END)
    ELSE
      (CASE WHEN {num_col}
                 * shiftleft(CAST(1 AS BIGINT), CAST(-({e}) AS INT))
                 >= {den_col}
            THEN {e} ELSE {e} - 1 END) END"""
    )


def surface_pmi(
    docs: DataFrame,
    surfaces: list[str] | None = None,
    **kw,
) -> DataFrame:
    """PMI-weighted co-mention edges: pointwise mutual information of
    each surface pair at document level, in EXACT whole bits — the
    edge-salience weighting GraphRAG-style pipelines apply before
    community detection (raw co-counts make stopword-like ubiquitous
    entities the heaviest edges; PMI divides that ubiquity out).

    PMI(a,b) = log2(P(a,b) / (P(a)P(b))) = log2(n_ab·N / (n_a·n_b)),
    doc-level presence counts, N = corpus size. The exact rational
    n_ab·N / (n_a·n_b) ships as (pmi_num, pmi_den) and its floor-log2
    as ``pmi_bits`` via a bits-difference + one shift-compare — no
    float log ever (cross-engine log2 rounding is not contractual;
    integer shifts are). Negative bits = anti-associated.

    Scale shape: presence sets ride the same per-doc mention table as
    surface_cooccurrence (pair fan-out bounded by the dictionary);
    per-surface doc counts are a |gazetteer|-row broadcast; N is a
    1-row broadcast. Everything else is map-side arithmetic.

    Returns (surface_a, surface_b, n_ab, n_a, n_b, n_corpus,
    pmi_num, pmi_den, pmi_bits).
    """
    m = gazetteer_mentions(docs, surfaces, **kw).select("doc_id", "surface")
    per = m.groupBy("surface").agg(F.count(F.lit(1)).cast("long").alias("_nd"))
    n_row = docs.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    a = m.select("doc_id", F.col("surface").alias("surface_a"))
    b = m.select("doc_id", F.col("surface").alias("surface_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("surface_a") < F.col("surface_b"))
        .groupBy("surface_a", "surface_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    pa = per.select(F.col("surface").alias("surface_a"), F.col("_nd").alias("n_a"))
    pb = per.select(F.col("surface").alias("surface_b"), F.col("_nd").alias("n_b"))
    j = (
        pairs.join(F.broadcast(pa), "surface_a")
        .join(F.broadcast(pb), "surface_b")
        .crossJoin(F.broadcast(n_row))
        .withColumn("pmi_num", F.col("n_ab") * F.col("n_corpus"))
        .withColumn("pmi_den", F.col("n_a") * F.col("n_b"))
    )
    return j.select(
        "surface_a",
        "surface_b",
        "n_ab",
        "n_a",
        "n_b",
        "n_corpus",
        "pmi_num",
        "pmi_den",
        _floor_log2_ratio("pmi_num", "pmi_den").cast("long").alias("pmi_bits"),
    )
