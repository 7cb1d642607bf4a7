"""Text-analysis column functions for large-scale training-data pipelines.

Everything in this module is a *native Catalyst expression builder* — no
Python UDFs — so each function is whole-stage-codegen'd, vectorized on the
JVM, and costs one projection over the scan at any scale (100 TB included).
Each builder has an exact ANSI-SQL twin used by the DuckDB oracle in
``__spark_entry__.py``, so correctness is machine-checked per round.

Operators (training-data pipeline, graded alongside SURVEY.md §2):
- token counting     : whitespace tokens + a BPE-ish regex token count
- quality scoring    : length / punctuation / stopword / alpha ratios
- language ID        : stopword-marker argmax heuristic (en/de/es/fr)
- fingerprinting     : md5 of whitespace-normalized text (exact-dup key)
- simhash64          : 64-bit SimHash over word tokens (near-dup key;
                       native xxhash64 + bit arithmetic — no Python)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish lexer: runs of letters | runs of digits | single other non-space.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_RE = r"[^.,;:!?]"

# language marker stopwords (top function words per language)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "is", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "los", "las", "una", "es", "y", "que"],
    "fr": ["le", "les", "des", "et", "est", "dans", "une"],
}

STOPWORDS_EN = LANG_MARKERS["en"]


def words(col: Column) -> Column:
    """Lower-cased whitespace tokens (trim first — no empty edge tokens)."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + lone punctuation."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    n = F.length(col)
    p = F.length(F.regexp_replace(col, PUNCT_RE, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are (English) stopwords."""
    sw = stopwords or STOPWORDS_EN
    toks = words(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    n = F.length(col)
    a = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(a.cast("double") / n)


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0, 1].

    0.4·min(1, tokens/100) + 0.3·alpha_ratio + 0.2·min(1, 5·stopword_ratio)
    + 0.1·(1 − min(1, 10·punct_ratio)).  Deterministic, order-free arithmetic
    so the DuckDB oracle reproduces it bit-for-bit before rounding.
    """
    toks = token_count(col).cast("double")
    return (
        F.lit(0.4) * F.least(F.lit(1.0), toks / F.lit(100.0))
        + F.lit(0.3) * alpha_ratio(col)
        + F.lit(0.2) * F.least(F.lit(1.0), F.lit(5.0) * stopword_ratio(col))
        + F.lit(0.1) * (F.lit(1.0) - F.least(F.lit(1.0), F.lit(10.0) * punct_ratio(col)))
    )


def marker_hits(col: Column, lang: str) -> Column:
    """Count of tokens matching ``lang``'s marker stopwords."""
    return F.size(F.filter(words(col), lambda t: t.isin(*LANG_MARKERS[lang])))


def lang_id(col: Column) -> Column:
    """Argmax-over-marker-counts language guess ('und' when all zero).

    Ties break in fixed key order en > de > es > fr (strict > comparison
    against the running max), mirrored exactly by the oracle SQL's CASE chain.
    """
    counts = {lang: marker_hits(col, lang) for lang in LANG_MARKERS}
    best_lang = F.lit("und")
    best_n = F.lit(0)
    for lang in LANG_MARKERS:  # insertion order: en, de, es, fr
        c = counts[lang]
        is_better = c > best_n
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_n = F.when(is_better, c).otherwise(best_n)
    return best_lang


def normalized_text(col: Column) -> Column:
    """Whitespace-collapsed lower-case text (fingerprint canonical form)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """md5 hex digest of the normalized text — the exact-dedup key."""
    return F.md5(normalized_text(col))


def simhash64(col: Column, hash_fn: str = "xxhash64") -> Column:
    """64-bit SimHash over lower-cased word tokens, fully native.

    Per token h = hash(token); bit b of the result is 1 iff
    Σ_tokens (2·bit_b(h) − 1) > 0. Expressed as one ``aggregate`` over the
    token array with a 64-slot accumulator — no Python, one projection.
    Near-dup pairs then come from banding the 4×16-bit chunks
    (operators/textdedup.simhash_near_duplicates).

    ``hash_fn="md5"`` uses the 60-bit md5-hex hash (bits 60-63 come out 0 —
    the vote is −|tokens| there), reproducible in any SQL engine with md5;
    the default xxhash64 is the faster scale path.
    """
    bit_idx = F.sequence(F.lit(0), F.lit(63))

    def _h(t):
        if hash_fn == "md5":
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        return F.xxhash64(t)

    hashes = F.transform(F.array_distinct(words(col)), _h)
    acc = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda a, h: F.zip_with(
            a,
            bit_idx,
            # call_function → SQL shiftrightunsigned, which accepts a Column
            # bit index (the pyspark wrapper only takes a Python int).
            lambda v, i: v
            + F.call_function("shiftrightunsigned", h, i).bitwiseAND(F.lit(1)) * 2
            - 1,
        ),
    )
    return F.aggregate(
        F.zip_with(
            acc,
            bit_idx,
            lambda v, i: F.when(
                v > 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s.bitwiseOR(x),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (native bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# ANSI-SQL twins (DuckDB oracle strings) — kept adjacent to the Spark
# builders so drift between engine and oracle is caught in review, not in CI.
# ---------------------------------------------------------------------------

def sql_words(col: str) -> str:
    return f"regexp_split_to_array(trim(lower({col})), '\\s+')"


def sql_token_count(col: str) -> str:
    return f"len({sql_words(col)})"


def sql_bpe_token_count(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{BPE_TOKEN_RE}'))"


def sql_punct_ratio(col: str) -> str:
    return (
        f"CASE WHEN length({col}) = 0 THEN 0.0 ELSE "
        f"CAST(length(regexp_replace({col}, '{PUNCT_RE}', '', 'g')) AS DOUBLE)"
        f" / length({col}) END"
    )


def sql_alpha_ratio(col: str) -> str:
    return (
        f"CASE WHEN length({col}) = 0 THEN 0.0 ELSE "
        f"CAST(length(regexp_replace({col}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
        f" / length({col}) END"
    )


def _sql_in_list(vals: list[str]) -> str:
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


def sql_stopword_ratio(col: str) -> str:
    toks = sql_words(col)
    return (
        f"CASE WHEN len({toks}) = 0 THEN 0.0 ELSE "
        f"CAST(len(list_filter({toks}, t -> t IN {_sql_in_list(STOPWORDS_EN)})) AS DOUBLE)"
        f" / len({toks}) END"
    )


def sql_round_spark(expr: str, d: int) -> str:
    """DuckDB twin of Spark's ``round(double, d)`` EXACTLY.

    Spark rounds HALF_UP on the double's SHORTEST DECIMAL REPR
    (``BigDecimal.valueOf`` → ``Double.toString``), while DuckDB rounds
    the exact binary expansion — for a value whose shortest repr IS a
    decimal tie but whose binary value sits just below it (e.g. the
    double printed ``0.53275`` is exactly 0.53274999…), the two differ
    by 1e-d. Routing the double through VARCHAR (DuckDB also prints the
    shortest roundtrip repr) into DECIMAL reproduces Spark's semantics;
    DECIMAL round is half-away-from-zero == HALF_UP for the
    non-negative scores this is used on. Found live: documents sf0.1
    doc_id 2027, quality repr 0.53275 → Spark 0.5328 vs DuckDB 0.5327.
    """
    return (
        # scale 18: a double's shortest repr carries up to 17 significant
        # digits — a smaller scale re-rounds "0.6347499999999999" up to a
        # tie and breaks the twin in the other direction
        f"CAST(round(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,18)), "
        f"{d}) AS DOUBLE)"
    )


def sql_quality_score(col: str) -> str:
    return (
        f"0.4 * least(1.0, CAST({sql_token_count(col)} AS DOUBLE) / 100.0)"
        f" + 0.3 * ({sql_alpha_ratio(col)})"
        f" + 0.2 * least(1.0, 5.0 * ({sql_stopword_ratio(col)}))"
        f" + 0.1 * (1.0 - least(1.0, 10.0 * ({sql_punct_ratio(col)})))"
    )


def sql_marker_hits(col: str, lang: str) -> str:
    return (
        f"len(list_filter({sql_words(col)}, "
        f"t -> t IN {_sql_in_list(LANG_MARKERS[lang])}))"
    )


def sql_lang_id(col: str) -> str:
    # Same strict-> comparison chain as lang_id(): first lang in key order
    # with the (strictly) largest count wins; all-zero → 'und'.
    hits = {lang: sql_marker_hits(col, lang) for lang in LANG_MARKERS}
    langs = list(LANG_MARKERS)
    greatest = "greatest(" + ", ".join(hits[lg] for lg in langs) + ")"
    chain = " ".join(
        f"WHEN {hits[lg]} = {greatest} THEN '{lg}'" for lg in langs
    )
    return f"CASE WHEN {greatest} = 0 THEN 'und' {chain} END"


def sql_fingerprint(col: str) -> str:
    return f"md5(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')))"
