"""Lexical relevance operators: TF-IDF, BM25, inverted index.

The retrieval side of the reference ranks KG rows by fuzzy string
similarity (`/root/reference/src/mmkg_rag/retrieval/search.py:96-141`);
a corpus-scale engine additionally needs the classic lexical-relevance
family over the *document* side — keyword extraction (TF-IDF), free-text
ranking (BM25), and the posting-list index retrieval systems build at
scale. All three are pure native-expression dataflows:

- one `split` + `explode` produces the token stream (no Python, stays in
  whole-stage codegen);
- term statistics are map-side-combinable `groupBy` aggregates keyed by
  term (the natural shuffle key — high cardinality, no hot key since
  stop-like terms are bounded by vocabulary, and partial aggregation
  collapses them before the exchange);
- corpus-level scalars (N, avgdl) are 1-row aggregates attached with a
  broadcast cross-join, never a driver collect.

At 100 TB: the token explode is map-only; the per-(doc,term) TF aggregate
shuffles once on (doc_id, term); the DF aggregate reuses the term key.
Nothing is all-pairs, no global sort except the final bounded top-k
(`TakeOrderedAndProject`).

Determinism: ties in top-k are broken lexicographically on term so output
is stable across partitionings; IDF doubles are rounded by callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokenize(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, term) token stream: split on single spaces, drop empties.

    Deliberately the simplest reproducible tokenizer (the synthetic corpus
    is space-separated); swap the delimiter regex for real web text.
    """
    return (
        docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .filter(F.col("term") != "")
    )


def doc_lengths(tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, dl) document lengths in tokens."""
    return tokens.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))


def term_freq(tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, term, tf) — one shuffle on (id, term), map-side partials."""
    return tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def doc_freq(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, df) from the TF table (already distinct per doc)."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def _corpus_size(docs: DataFrame, id_col: str) -> DataFrame:
    """1-row (n_docs) aggregate — attached by broadcast cross-join so the
    plan has no driver-side collect (resilient to re-runs / streaming)."""
    return docs.agg(F.count(F.lit(1)).alias("n_docs"))


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document: (id, term, tf, tfidf, rank).

    idf = ln((N + 1) / (df + 1)) + 1 (smoothed; never negative, never
    divides by zero). Rank ties break on term ascending — deterministic.

    Plan shape: tokens (map-only) → TF groupBy (doc,term) → DF groupBy
    (term) → TF ⋈ DF on term (both sides term-partitioned — AQE plans the
    small DF side broadcast at test scale, sort-merge at corpus scale) →
    per-doc window top-k. The window partitions by doc_id: bounded rows
    per partition, no global sort.
    """
    toks = tokenize(docs, text_col, id_col)
    tf = term_freq(toks, id_col)
    df = doc_freq(tf, id_col)
    n = _corpus_size(docs, id_col)
    idf = F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.col("tf") * idf)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", F.round("tfidf", 6).alias("tfidf"), "rank")
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k documents for a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with the standard non-negative idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    The query-term filter lands BEFORE the TF aggregate (a literal IN over
    the token stream, inside the scan's codegen stage), so the wide
    (doc, term) shuffle carries only |query| terms — the full-vocabulary
    aggregate exists solely for document lengths, which are a per-doc
    count. avgdl and N are 1-row broadcast aggregates (the planner
    attaches them as 1-row broadcast nested-loops — O(n) scalar attach).
    One bounded top-k at the end.
    """
    toks = tokenize(docs, text_col, id_col)
    qtoks = toks.filter(F.col("term").isin(query_terms))
    tf = term_freq(qtoks, id_col)
    dl = doc_lengths(toks, id_col)
    qtf = tf
    df = doc_freq(tf, id_col)
    n = _corpus_size(docs, id_col)
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        qtf.join(F.broadcast(df), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(avgdl))
        .withColumn("_s", idf * tf_part)
    )
    # decimal aggregation: double addition is order-dependent and Spark's
    # partial-agg order is nondeterministic — DECIMAL(28,12) addition is
    # exact/associative, so the score is identical across partitionings
    # (and matches the DuckDB oracle bit-for-bit)
    return (
        scored.groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("_s").cast("decimal(28,12)")).cast("double"), 6
            ).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Posting lists: (term, df, postings) with postings a sorted id list.

    The build is the TF aggregate reshuffled once on term; postings are
    `sort_array(collect_list(...))` — per-term lists, bounded by document
    frequency. At corpus scale the hot terms (stopwords) produce long
    postings; callers cap them with ``min_df``/stoplists or store
    `slice`d heads — the operator keeps the full list since the synthetic
    vocabulary is bounded.
    """
    tf = term_freq(tokenize(docs, text_col, id_col), id_col)
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level word n-gram counts (language-model count tables):
    (ngram, n_occurrences), optionally top-k with lexicographic tiebreak.

    The n-grams are built IN-ROW from the token array (a zip of n shifted
    slices — whole-stage codegen, no window shuffle over (doc, position)
    like the lag-based formulation; NOT element_at lookahead inside the
    lambda, which would re-evaluate the split per gram — see
    functions/minhash.word_shingles), then one map-side-combinable
    groupBy on the n-gram. That single term-keyed exchange is the only
    shuffle; top-k is a bounded TakeOrderedAndProject, not a global sort.
    """
    arr = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    glen = F.greatest(F.size(arr) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(arr, j + 1, glen).alias(f"w{j}") for j in range(n)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(n)])
    )
    out = (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    if k is not None:
        out = out.orderBy(F.desc("n_occurrences"), F.asc("ngram")).limit(k)
    return out


def rare_ngram_score(
    docs: DataFrame,
    n: int = 2,
    rare_max: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-LM document scoring: per doc, the fraction of its n-gram
    instances that are RARE in the whole corpus (count ≤ ``rare_max``)
    plus the mean corpus frequency of its n-grams — the KenLM-style
    gibberish/quality filter of production data pipelines, expressed in
    pure integer arithmetic (no float log-prob sums whose order could
    flake cross-engine parity; one rounded division per output row).

    Plan: n-gram instances built in-row (same zip-of-slices as
    ``ngram_counts``); corpus counts are one map-side-combinable groupBy;
    instances re-join the count table on the n-gram key (the standard LM
    count-table join — both sides partitioned by ngram); one final
    groupBy(doc). Three term/doc-keyed exchanges total, all uniform keys.
    """
    arr = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    glen = F.greatest(F.size(arr) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(arr, j + 1, glen).alias(f"w{j}") for j in range(n)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(n)])
    )
    inst = docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("ngram"))
    counts = inst.groupBy("ngram").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        inst.join(counts, "ngram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("cnt") <= rare_max, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("n_rare"),
            F.sum("cnt").alias("sum_freq"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_ngrams",
            "n_rare",
            F.round(F.col("n_rare") / F.col("n_ngrams"), 4).alias("rare_frac"),
            F.round(F.col("sum_freq") / F.col("n_ngrams"), 4).alias("avg_freq"),
        )
    )


def doc_surprisal_bits(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, surprisal_bits) — per-document unigram
    cross-entropy against the corpus's OWN unigram distribution, in
    whole bits: Σ_tokens floor(log2(N div cnt(token))), where N is the
    corpus token count. The CCNet/Gopher "perplexity vs in-domain LM"
    quality signal, with the log made ENGINE-EXACT instead of IEEE:
    floor(log2(x)) for integer x ≥ 1 is length(bin(x)) − 1 — a string
    length both Spark and DuckDB compute identically on the identical
    integer (integer ``div`` first, also identical for positives). The
    whole score is BIGINT arithmetic end to end; no float ever enters,
    so the oracle hash cannot flake on summation order.

    Plan: the unigram count table is vocab-sized → built by one
    map-side-combinable groupBy, its total attached by broadcast
    cross-join (no driver collect), and the per-token surprisal column
    derived there once; the token stream then broadcast-joins that
    dictionary (vocab ≪ corpus at any scale — web-scale vocabs are
    ~10^8 terms vs 10^14 tokens, still the broadcast side) and one
    final doc-keyed groupBy emits the score. Two scans of the fact, one
    doc-keyed shuffle.
    """
    toks = tokenize(docs, text_col, id_col).select(
        F.col(id_col).alias("id"), "term"
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.sum(F.lit(1)).cast("long").alias("n_total"))
    dic = counts.crossJoin(F.broadcast(total)).select(
        "term",
        (
            F.length(F.bin(F.expr("n_total div cnt"))) - F.lit(1)
        ).cast("long").alias("bits"),
    )
    return (
        toks.join(F.broadcast(dic), "term")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("bits").cast("long").alias("surprisal_bits"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "surprisal_bits")
    )


def rrf_fusion(
    docs: DataFrame,
    terms: list[str],
    *,
    k_rrf: int = 60,
    topk: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two lexical
    rankings — the hybrid-search combiner every production RAG stack
    runs when it has more than one retriever. Output: top-``topk``
    (doc_id, rank_tf, rank_idf, rrf_milli).

    RRF is ranking-agnostic: score(d) = Σ_r 1/(k + rank_r(d)). Here the
    two fused rankings are EXACT-INTEGER lexical scores over the same
    candidate set (docs containing ≥ 1 query term): raw query-term
    frequency, and surprisal-weighted frequency Σ tf·bits(term) with
    the same engine-exact floor-log2 weights as doc_surprisal_bits (an
    IDF-style reweighting). Integer scores make the rank permutations
    — and therefore the fused score — bit-reproducible cross-engine;
    swapping in BM25/ANN rankings is the same plan with different
    score columns. The fused score itself is the integer
    ``rrf_milli = Σ 1_000_000 // (k + rank)`` (documented integer RRF;
    monotone-identical to the real-valued one for any fixed k).

    Scale shape: candidate scores are one broadcast term join + one
    doc-keyed groupBy; each ranking is ONE parallel range shuffle via
    functions/ranks.global_row_numbers (never Exchange
    SinglePartition); the final top-k is a TakeOrdered. Ranks are a
    permutation — the one join key that cannot skew.
    """
    from ..functions.ranks import global_row_numbers

    spark = docs.sparkSession
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    toks = tokenize(docs, text_col, id_col).select(
        F.col(id_col).alias("id"), "term"
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.sum(F.lit(1)).cast("long").alias("n_total"))
    bits = (
        counts.join(F.broadcast(tdf), "term")
        .crossJoin(F.broadcast(total))
        .select(
            "term",
            (
                F.length(F.bin(F.expr("n_total div cnt"))) - F.lit(1)
            ).cast("long").alias("bits"),
        )
    )
    scored = (
        toks.join(F.broadcast(bits), "term")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("s_tf"),
            F.sum("bits").cast("long").alias("s_idf"),
        )
    )
    r1 = global_row_numbers(
        scored.withColumn("_neg", -F.col("s_tf")),
        ["_neg", "id"],
        rank_col="rank_tf",
    ).select("id", "s_idf", "rank_tf")
    r2 = global_row_numbers(
        r1.withColumn("_neg", -F.col("s_idf")),
        ["_neg", "id"],
        rank_col="rank_idf",
    ).select("id", "rank_tf", "rank_idf")
    return (
        r2.select(
            F.col("id").alias(id_col),
            "rank_tf",
            "rank_idf",
            (
                F.expr(f"1000000 div ({k_rrf} + rank_tf)")
                + F.expr(f"1000000 div ({k_rrf} + rank_idf)")
            ).cast("long").alias("rrf_milli"),
        )
        .orderBy(F.desc("rrf_milli"), id_col)
        .limit(topk)
    )


def term_lift(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` DISTINCTIVE terms per group by smoothed log-odds lift —
    Monroe/Colaresi/Quinn's "Fightin' Words" statistic with a flat +1
    prior:

        δ(t, g) = ln( (c_tg + 1) / (n_g − c_tg + 1) )
                − ln( (c_t\\g + 1) / (n_\\g − c_t\\g + 1) )

    where c_tg is term t's count inside group g and c_t\\g its count in
    the REST of the corpus. Unlike raw TF-IDF this contrasts a group
    against everything else, which is the question corpus curation
    actually asks ("what does this crawl source over-represent?" —
    boilerplate, spam vocab, language drift per host).

    Plan: one token explode (map-only) → one (group, term) groupBy with
    map-side partials → term-keyed join of the per-group counts against
    the global term counts (both term-keyed; no broadcast needed, vocab
    can be arbitrarily large) → group totals attached broadcast
    (|groups| rows) → per-group top-k window (WindowGroupLimit pushdown).
    All counts integer until the two final ln() calls per surviving row;
    ties broken lexicographically on term.
    """
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    per_group = toks.groupBy("g", "term").agg(F.count(F.lit(1)).alias("c_tg"))
    per_term = per_group.groupBy("term").agg(F.sum("c_tg").alias("c_t"))
    group_tot = per_group.groupBy("g").agg(F.sum("c_tg").alias("n_g"))
    total = group_tot.agg(F.sum("n_g").alias("n"))
    scored = (
        per_group.join(per_term, "term")
        .join(F.broadcast(group_tot), "g")
        .crossJoin(F.broadcast(total))
        .withColumn("c_rest", F.col("c_t") - F.col("c_tg"))
        .withColumn("n_rest", F.col("n") - F.col("n_g"))
        .withColumn(
            "lift",
            F.log(
                (F.col("c_tg") + 1).cast("double")
                / (F.col("n_g") - F.col("c_tg") + 1).cast("double")
            )
            - F.log(
                (F.col("c_rest") + 1).cast("double")
                / (F.col("n_rest") - F.col("c_rest") + 1).cast("double")
            ),
        )
    )
    w = Window.partitionBy("g").orderBy(F.col("lift").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("g").alias(group_col),
            "term",
            "c_tg",
            "c_t",
            F.round("lift", 6).alias("lift"),
            "rk",
        )
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information —
    the classic collocation detector (Church & Hanks 1990) phrase-mining
    step a web-corpus vocabulary pipeline runs before tokenizer training
    ("new york", "machine learning" fuse into units).

    PMI(x,y) = ln( P(xy) / (P(x)·P(y)) ). Because ln is monotone, the
    RANKING is fully determined by the lift ratio

        lift = (c_xy · N_u · N_u) / (N_b · c_x · c_y)

    which this operator computes in IEEE double with a FIXED operand
    association — ((c_xy·N_u)·N_u) / (((N_b·c_x)·c_y)) — written
    identically in the DuckDB oracle, so both engines produce
    bit-identical doubles from exact integer counts (no engine-ordered
    float SUM anywhere; the only float op is this one expression per
    surviving pair). No ln() is emitted at all: the monotone transform
    is dropped rather than rounded.

    Plan: in-row bigram build (shifted-slice zip, same shape as
    ngram_counts — no (doc, position) window shuffle) → one bigram-keyed
    groupBy → unigram counts joined on each side (term-keyed shuffle
    joins; vocab can be arbitrarily large, no broadcast assumed) →
    corpus totals attached as broadcast 1-row scalars → min-count filter
    → bounded TakeOrdered top-k with (left, right) tiebreak so the cut
    is deterministic under lift ties.
    """
    arr = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    glen = F.greatest(F.size(arr) - F.lit(1), F.lit(0))
    zipped = F.arrays_zip(
        F.slice(arr, 1, glen).alias("lt"), F.slice(arr, 2, glen).alias("rt")
    )
    bg = docs.select(F.explode(zipped).alias("z")).select(
        F.col("z.lt").alias("lt"), F.col("z.rt").alias("rt")
    )
    pair_cnt = bg.groupBy("lt", "rt").agg(F.count(F.lit(1)).alias("pair_cnt"))
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_bi = pair_cnt.agg(F.sum("pair_cnt").alias("n_bi"))
    lift = (
        (F.col("pair_cnt").cast("double") * F.col("n_uni").cast("double"))
        * F.col("n_uni").cast("double")
    ) / (
        (F.col("n_bi").cast("double") * F.col("left_cnt").cast("double"))
        * F.col("right_cnt").cast("double")
    )
    return (
        pair_cnt.join(
            uni.select(F.col("term").alias("lt"), F.col("c").alias("left_cnt")),
            "lt",
        )
        .join(
            uni.select(F.col("term").alias("rt"), F.col("c").alias("right_cnt")),
            "rt",
        )
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .filter(F.col("pair_cnt") >= min_count)
        .select(
            "lt",
            "rt",
            "pair_cnt",
            "left_cnt",
            "right_cnt",
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), "lt", "rt")
        .limit(k)
    )


def rake_keyphrases(
    docs: DataFrame,
    *,
    n_breakers: int = 8,
    max_words: int = 4,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAKE-style corpus keyphrase extraction → top-``k``
    (phrase, n_words, n_occ, score).

    The candidate-term-mining step of KG construction: multi-word phrases
    that co-occur as contiguous runs are exactly the mention-candidate
    surface forms the extraction stage (operators/extract) scores — RAKE
    (Rose et al. 2010) mines them with nothing but delimiter statistics,
    no model. Since the synthetic corpus has no punctuation, the breaker
    set is DATA-DRIVEN: the ``n_breakers`` most frequent corpus tokens
    (ties broken lexicographically) play the stopword/delimiter role —
    the standard adaptation when no stopword list exists for the domain.

    Candidate phrases are maximal runs of non-breaker tokens (classic
    gaps-and-islands: token position minus its rank among the document's
    kept tokens), capped at ``max_words`` (longer runs are discarded
    everywhere — output AND statistics — a declared semantic mirrored in
    the oracle, not a silent cap). Scoring is the integer RAKE variant:
    word degree deg(w) = Σ over occurrences of w in candidate phrases of
    that phrase's word count (each occurrence "sees" its co-members,
    itself included), and phrase score = Σ deg(w) over the phrase's
    DISTINCT member words. The classic deg/freq ratio sums
    order-dependent doubles (a cross-engine hash trap); the degree-sum
    variant ranks near-identically on short phrases and is exact BIGINT
    arithmetic — bit-identical on any partitioning or engine.

    Scale shape: one posexplode (map-only, whole-stage codegen), one
    vocabulary-keyed aggregate for the breaker stats (map-side
    combinable; the breaker table is n_breakers rows, broadcast
    everywhere), ONE doc-keyed window for the island ids (the only
    doc-wide shuffle), one (doc, run) aggregate to assemble phrases, then
    vocabulary-sized degree joins. The final top-k is a bounded
    TakeOrderedAndProject. No self-joins, nothing quadratic; the phrase
    table is strictly smaller than the token stream.
    """
    toks = (
        docs.select(
            id_col,
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
        )
        .filter(F.col("tok") != "")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    breakers = (
        freq.orderBy(F.desc("freq"), "tok").limit(n_breakers).select("tok")
    )
    kept = toks.join(F.broadcast(breakers), "tok", "anti")
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = kept.withColumn("run", F.col("pos") - F.row_number().over(w))
    phrases = (
        runs.groupBy(id_col, "run")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .filter(F.col("n_words") <= max_words)
    )
    wdeg = (
        phrases.select(
            F.explode(F.split("phrase", " ")).alias("tok"), "n_words"
        )
        .groupBy("tok")
        .agg(F.sum("n_words").alias("degree"))
    )
    pstats = phrases.groupBy("phrase", "n_words").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    scored = (
        pstats.select(
            "phrase",
            "n_words",
            "n_occ",
            F.explode(F.array_distinct(F.split("phrase", " "))).alias("tok"),
        )
        .join(wdeg, "tok")
        .groupBy("phrase", "n_words", "n_occ")
        .agg(F.sum("degree").alias("score"))
    )
    return (
        scored.select(
            "phrase",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_occ").cast("long").alias("n_occ"),
            F.col("score").cast("long").alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(k)
    )


def vocab_growth(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Heaps'-law vocabulary growth curve per source: cumulative distinct
    vocabulary vs cumulative tokens at log-spaced document checkpoints
    (ranks 1, 2, 4, … and the last doc, in deterministic doc_id order).
    The saturation diagnostic of corpus curation — a source whose curve
    flattens early is re-crawling the same material; the greedy cover's
    (curation.greedy_source_cover) marginal-gain signal over time.

    Scale shape (100 TB): per-source doc ranks come from
    functions/ranks.global_row_numbers — the two-phase PARALLEL range
    shuffle, never Window.orderBy's SinglePartition funnel — localized
    per source by subtracting the source's min global rank (a
    |sources|-row broadcast). First-occurrence ranks are one
    (source, term) min-aggregate. The cumulative counts are computed by
    joining against the checkpoint table instead of running a
    corpus-length window: the fan-out is bounded by |checkpoints| =
    O(log n_docs) per row, every join side beyond the facts is
    broadcast-sized, and both final aggregates are map-side
    combinable. Exact BIGINT throughout.

    Returns (source, ckpt, tokens_cum, vocab_cum) ordered.
    """
    from ..functions.ranks import global_row_numbers

    arr = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    base = docs.select(
        F.col(group_col).alias("_src"),
        F.col(id_col).alias("_doc"),
        arr.alias("_ts"),
    )
    per_doc = base.select(
        "_src", "_doc", F.size("_ts").cast("long").alias("_ntoks")
    )
    ranked = global_row_numbers(
        per_doc, ["_src", "_doc"], rank_col="_grank"
    ).localCheckpoint()
    smin = ranked.groupBy("_src").agg(
        F.min("_grank").alias("_r0"),
        F.count(F.lit(1)).cast("long").alias("_ndocs"),
    )
    d = ranked.join(F.broadcast(smin), "_src").select(
        "_src",
        "_doc",
        "_ntoks",
        (F.col("_grank") - F.col("_r0") + 1).cast("long").alias("_drank"),
    )
    cps = (
        smin.select(
            "_src",
            F.explode(
                F.array_union(
                    F.expr(
                        "filter(transform(sequence(0, 48),"
                        " i -> shiftleft(cast(1 as bigint), i)),"
                        " p -> p <= _ndocs)"
                    ),
                    F.array(F.col("_ndocs")),
                )
            ).alias("ckpt"),
        )
    )
    fu = (
        base.select("_src", "_doc", F.explode("_ts").alias("_term"))
        .join(d.select("_src", "_doc", "_drank"), ["_src", "_doc"])
        .groupBy("_src", "_term")
        .agg(F.min("_drank").alias("_frank"))
    )
    vocab = (
        fu.join(F.broadcast(cps), "_src")
        .where(F.col("_frank") <= F.col("ckpt"))
        .groupBy("_src", "ckpt")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab_cum"))
    )
    toks_cum = (
        d.join(F.broadcast(cps), "_src")
        .where(F.col("_drank") <= F.col("ckpt"))
        .groupBy("_src", "ckpt")
        .agg(F.sum("_ntoks").cast("long").alias("tokens_cum"))
    )
    return (
        toks_cum.join(vocab, ["_src", "ckpt"], "left")
        .select(
            F.col("_src").alias("source"),
            "ckpt",
            "tokens_cum",
            F.coalesce("vocab_cum", F.lit(0).cast("long")).alias("vocab_cum"),
        )
        .orderBy("source", "ckpt")
    )


def doc_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty against everything that came before
    it (doc_id order): how many of a doc's distinct n-grams first
    appear in THIS doc vs in an earlier one — the doc-granular novelty
    signal of training-data analysis (a crawl that stops producing
    novel n-grams is re-reading the web; the doc-level complement of
    vocab_growth's source curves, and the corpus-side view of
    decontaminate's seen-before test).

    Semantics: distinct n-grams per doc; a gram is novel in the doc
    with the smallest doc_id containing it. Exact integers.

    Scale shape (100 TB): grams are built IN-ROW from the token array
    (slices + zip, no per-position shuffle — the ngram_counts
    pattern); the corpus-wide first-occurrence is ONE
    map-side-combinable (gram) min-aggregate on the uniform 128-bit
    gram hash; charging novelty back is ONE join on the same key
    partitioning; the per-doc rollup keys by doc_id. No windows, no
    driver state — three uniform-key exchanges end to end.

    Returns (doc_id, n_grams, n_novel) — n_grams counts DISTINCT
    grams; repeat = n_grams − n_novel.
    """
    arr = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    glen = F.greatest(F.size(arr) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(arr, j + 1, glen).alias(f"w{j}") for j in range(n)]
    )
    grams = F.transform(
        zipped,
        lambda s: F.md5(F.concat_ws(" ", *[s[f"w{j}"] for j in range(n)])),
    )
    dg = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("g"))
        .distinct()
    )
    first = dg.groupBy("g").agg(F.min("doc_id").alias("_first"))
    return (
        dg.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                (F.col("_first") == F.col("doc_id")).cast("long")
            ).cast("long").alias("n_novel"),
        )
    )
