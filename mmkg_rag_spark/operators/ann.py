"""Similarity search over embedding columns (array<float>).

Two physical strategies for top-k cosine neighbors:

- ``brute_topk_cosine`` : queries ⨯ corpus scored natively — the *queries*
  side is broadcast (queries ≪ corpus always), so the corpus scan streams
  once with no shuffle; top-k via window over (query, score). Exact — the
  correctness baseline and the oracle-checked path.

- ``lsh_topk_cosine``   : random-hyperplane (sign) LSH — corpus hashed into
  multi-probe sign-bucket keys with seeded hyperplanes derived from
  deterministic constants; candidates = bucket-join; exact re-score + top-k
  on candidates only. The 100 TB path: per-query work ∝ bucket size, and the
  bucket join shuffles on uniformly-distributed hash keys.

Hyperplanes are generated from SHA-based constants (no RNG state), so plans
are reproducible across runs/executors — same property as functions/minhash.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.partitioning import ensure_min_partitions
from .textdedup import cosine


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes via Box-Muller over SHA bits."""
    planes: list[list[float]] = []
    for p in range(n_planes):
        vals: list[float] = []
        for i in range(0, dim, 2):
            raw = hashlib.sha256(f"{seed}:{p}:{i}".encode()).digest()
            u1 = (int.from_bytes(raw[:8], "big") + 1) / (2**64 + 2)
            u2 = int.from_bytes(raw[8:16], "big") / 2**64
            r = math.sqrt(-2.0 * math.log(u1))
            vals.append(r * math.cos(2 * math.pi * u2))
            if i + 1 < dim:
                vals.append(r * math.sin(2 * math.pi * u2))
        planes.append(vals[:dim])
    return planes


def _sign_key(vec, planes: list[list[float]]):
    """Bucket key column: sign bit per hyperplane packed into a long."""
    key = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        key = key.bitwiseOR(
            F.when(dot > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return key


def brute_topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Scores are rounded to 6 decimals *before* ranking so the rank order is a
    pure function of the rounded values the oracle also computes — float
    summation-order noise can never flip a rank across engines.
    """
    c = ensure_min_partitions(corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).cast("array<double>").alias("v")
    ))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("qv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("nn_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("v")), 6))
        .select("query_id", "nn_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank", "score")
    )


def lsh_topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket candidates, exact re-score.

    ``n_tables`` independent hash tables (union of buckets) trade shuffle
    volume for recall; collision prob. for angle θ is (1−θ/π)^n_planes per
    table. Candidates are deduped before scoring so each (query, vec) pair
    is scored once.

    Defaults (4 planes × 8 tables) are tuned for *near-orthogonal* corpora
    (θ ≈ 60-70° nearest neighbors — the hardest regime, where any LSH probes
    a large corpus fraction): candidate fraction ≈ 40%, recall ≈ 0.7. On
    clustered real-world embeddings (θ ≪ 45° for true neighbors) raise
    n_planes to shrink buckets — collision prob. for close pairs stays ≈ 1
    while the candidate fraction drops geometrically.
    """
    c = ensure_min_partitions(corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).cast("array<double>").alias("v")
    ))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("qv"),
    )

    c_keys = []
    q_keys = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 101 * t)
        c_keys.append(
            F.struct(F.lit(t).alias("tbl"), _sign_key(F.col("v"), planes).alias("bkey"))
        )
        q_keys.append(
            F.struct(F.lit(t).alias("tbl"), _sign_key(F.col("qv"), planes).alias("bkey"))
        )
    c_b = c.select("nn_id", "v", F.explode(F.array(*c_keys)).alias("bk")).select(
        "nn_id", "v", "bk.tbl", "bk.bkey"
    )
    q_b = q.select("query_id", "qv", F.explode(F.array(*q_keys)).alias("bk")).select(
        "query_id", "qv", "bk.tbl", "bk.bkey"
    )
    cand = (
        q_b.join(c_b, ["tbl", "bkey"])
        .filter(F.col("nn_id") != F.col("query_id"))
        .select("query_id", "qv", "nn_id", "v")
        .dropDuplicates(["query_id", "nn_id"])
    )
    scored = cand.withColumn(
        "score", F.round(cosine(F.col("qv"), F.col("v")), 6)
    ).select("query_id", "nn_id", "score")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank", "score")
    )


def ivf_topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse quantize, probe, re-score.

    Centroids: deterministic k-means — init from the ``n_lists`` smallest-id
    vectors, ``kmeans_iters`` Lloyd rounds entirely in DataFrame ops
    (assignment via broadcast centroid array, update via groupBy mean).
    Search: each query probes its ``n_probe`` nearest lists; candidates =
    corpus rows in those lists (an equi-join on list id — THE property that
    makes IVF the 100 TB path: the corpus is hash-partitioned by list id
    once, and each query touches n_probe/n_lists of it). Exact cosine re-score
    + window top-k on candidates only.
    """
    c = ensure_min_partitions(corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).cast("array<double>").alias("v")
    )).cache()
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("qv"),
    )

    # ---- deterministic k-means (driver holds only K centroids) ----
    import numpy as np

    cents = np.array(
        [r.v for r in c.orderBy("nn_id").limit(n_lists).collect()], dtype=np.float64
    )

    def _dist(vec, cent):
        return F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in cent]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    def _assign_expr(vec, cents_arr):
        """Column: index of the nearest centroid (min squared L2).

        argmin via sort-of-structs: the distance array is referenced ONCE.
        (A chained when(d<best,…) min doubles the expression tree per
        centroid — 2^K nodes, OOMs codegen at K=16.)

        Distances are rounded to 6 decimals before the argmin so the chosen
        list is a pure function of the rounded values — summation-order
        float noise (different partial-sum trees across engines/partitions)
        can never flip an assignment, which is what lets a SQL oracle
        reproduce the whole k-means exactly.
        """
        arr = F.array(
            *[
                F.struct(
                    F.round(_dist(vec, cent), 6).alias("d"),
                    F.lit(i).alias("list_id"),
                )
                for i, cent in enumerate(cents_arr)
            ]
        )
        return F.element_at(F.array_sort(arr), 1)["list_id"]

    for _ in range(kmeans_iters):
        assigned = c.withColumn("list_id", _assign_expr(F.col("v"), cents))
        dim = len(cents[0])
        means = (
            assigned.select(
                "list_id", *[F.element_at("v", i + 1).alias(f"d{i}") for i in range(dim)]
            )
            .groupBy("list_id")
            .agg(*[F.avg(f"d{i}").alias(f"d{i}") for i in range(dim)])
            .collect()
        )
        new = cents.copy()
        for r in means:
            # 9-dp rounding: F.avg's partition-merge order differs from any
            # other engine's AVG; rounding collapses the ~1e-15 noise so the
            # centroid coordinates are engine-independent
            new[r.list_id] = [round(r[f"d{i}"], 9) for i in range(dim)]
        cents = new

    corpus_l = c.withColumn("list_id", _assign_expr(F.col("v"), cents)).cache()

    # ---- probe: n_probe nearest lists per query ----
    probe_structs = []
    for i, cent in enumerate(cents):
        d = F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.array(*[F.lit(float(x)) for x in cent]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        probe_structs.append(
            F.struct(F.round(d, 6).alias("d"), F.lit(i).alias("list_id"))
        )
    q_probe = (
        q.withColumn(
            "_probe",
            F.explode(F.slice(F.array_sort(F.array(*probe_structs)), 1, n_probe)),
        )
        .withColumn("list_id", F.col("_probe.list_id"))
        .drop("_probe")
    )

    cand = (
        q_probe.join(corpus_l, "list_id")
        .filter(F.col("nn_id") != F.col("query_id"))
        .select("query_id", "qv", "nn_id", "v")
    )
    scored = cand.withColumn(
        "score", F.round(cosine(F.col("qv"), F.col("v")), 6)
    ).select("query_id", "nn_id", "score")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank", "score")
    )
