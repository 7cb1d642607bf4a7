"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline end-to-end on
pages derived from ``sf0.001`` and returns the degree summary.

``queries()``/``oracle_sql()`` cover, per SURVEY.md §2 / §2.8:
- relational operator classes the KG engine is built from (agg with
  map-side partials, broadcast dim join, window top-k, k-hop expansion,
  anti-join, unordered-pair grouping, set ops, scalar string funcs, regex
  scan) — oracle-checked on the TPC-H-ish tables;
- training-data pipeline operators (token/quality/lang/fingerprint stats,
  exact + n-gram-Jaccard + embedding-cosine dedup, the full ANN family
  brute/sign-LSH/IVF — the LSH via deterministic-literal hyperplanes, the
  IVF by reproducing the rounded k-means in SQL — plus decontamination,
  shard packing, PII scrub) — oracle-checked on ``documents``/``embeddings``;
- non-SQL-expressible ops (xxhash64-mode MinHash/SimHash — their md5-mode
  twins ARE oracle-checked, rapidfuzz fuzzy top-k, the full KG pipeline
  with iterative connected components) — rows-only entries with pytest
  goldens (tests/test_goldens.py), exercised at sf0.01 either way.

Float policy for oracle parity: all cross-engine doubles are produced by
identical expression trees (same op order ⇒ identical IEEE results) or exact
DECIMAL aggregation cast to double at the end; every emitted double is
round()ed. Counts are BIGINT on both sides. One residual trap: even on
BIT-IDENTICAL doubles, Spark's round() (HALF_UP on the shortest decimal
repr) and DuckDB's round() (exact binary value) disagree when the repr is a
decimal tie whose binary value sits below it — use
``textstats.sql_round_spark`` in the oracle when a rounded double is a
free-form ratio/score (found live: doc_quality at sf0.1; decimal-sourced
doubles whose scale ≤ the round digits can never tie and are safe).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mmkg_rag_spark.functions import textstats as ts  # noqa: E402
from mmkg_rag_spark.operators import ann, curation, retrieval, textdedup  # noqa: E402

DEFAULT_SF = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parallelism-guarded table read for CPU-heavy per-row queries.

    The sf test parquets are single-row-group files (one scan partition);
    expression-dense per-row work (lang-id marker scans, quality ratios,
    BPE-ish regex counts) would run on one core. No-op on healthy layouts.
    """
    from mmkg_rag_spark.functions.partitioning import ensure_min_partitions

    return ensure_min_partitions(_t(spark, sf_dir, name))


_KG_CACHE: dict[str, object] = {}


def _build_kg(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir) the KG over documents-derived pages.

    Four driver queries (kg_nodes/kg_edges/kg_degree_topk/kg_search_eris)
    consume the same deterministic build — materialize it eagerly once
    instead of re-running the ~100-job pipeline per query.
    """
    if sf_dir in _KG_CACHE:
        return _KG_CACHE[sf_dir]
    from mmkg_rag_spark.pipeline import KGResult, aqe_size_coalesce, build_kg
    from mmkg_rag_spark.sources.docpages import manifest_df, pages_from_documents

    with aqe_size_coalesce(spark):
        pages = pages_from_documents(spark, sf_dir)
        res = build_kg(spark, pages, manifest=manifest_df(spark))
        nodes = res.nodes.localCheckpoint()
        edges = res.edges.localCheckpoint()
        image_edges = res.image_edges.localCheckpoint()
        images = res.images.localCheckpoint()
    # all_edges is a cheap lazy union of the two checkpointed edge tables —
    # its own eager checkpoint would be a 4th serial materialization job
    # re-writing the same rows (VERDICT r2 #1: serial small-job floor)
    cols = ["source", "label", "target", "description", "references"]
    all_edges = edges.select(cols).unionByName(image_edges.select(cols))
    # persist the graph bucketed once (VERDICT r2 #7): kg_degree_topk /
    # kg_search_eris then read co-located name=source layouts — the
    # node-table join strategy for graphs too big to broadcast
    from mmkg_rag_spark.sinks import write_bucketed_graph

    db = "kg_" + sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    with aqe_size_coalesce(spark):
        nt, et = write_bucketed_graph(spark, nodes, all_edges, db=db, n_buckets=8)
    res = KGResult(
        nodes=nodes,
        edges=edges,
        image_edges=image_edges,
        images=images,
        all_edges=all_edges,
        nodes_table=nt,
        edges_table=et,
    )
    _KG_CACHE[sf_dir] = res
    return res


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction on sf0.001-derived pages → degree top-50."""
    from mmkg_rag_spark.pipeline import degree_summary

    return degree_summary(_build_kg(spark, DEFAULT_SF)).limit(50)


# ---------------------------------------------------------------------------
# oracle-checked queries
# ---------------------------------------------------------------------------

def q_agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dq = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    dp = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    ddp = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dq.alias("_dq"),
            dp.alias("_dp"),
            ddp.alias("_ddp"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("_dq").cast("double"), 2).alias("sum_qty"),
            F.round(F.col("_dp").cast("double"), 2).alias("sum_base_price"),
            F.round(F.col("_ddp").cast("double"), 2).alias("sum_disc_price"),
            F.round(F.col("_dq").cast("double") / F.col("count_order"), 4).alias("avg_qty"),
            "count_order",
        )
    )


SQL_AGG_PRICING = """
SELECT l_returnflag, l_linestatus,
  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_disc_price,
  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers_per_segment(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("c_mktsegment", "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"), "rank")
    )


SQL_TOP_CUSTOMERS = """
SELECT c_mktsegment, c_custkey, c_name, round(c_acctbal, 2) AS acctbal, rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
  ) AS rank FROM customer
) WHERE rank <= 5
"""


def q_dim_remap_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_sp"),
        )
        .select(
            "c_mktsegment",
            "n_orders",
            F.round(F.col("_sp").cast("double"), 2).alias("sum_price"),
        )
    )


SQL_DIM_REMAP = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_khop_suppliers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    e1 = o.select(
        F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("source"),
        F.concat(F.lit("O"), F.col("o_orderkey").cast("string")).alias("target"),
    )
    e2 = li.select(
        F.concat(F.lit("O"), F.col("l_orderkey").cast("string")).alias("source"),
        F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("target"),
    )
    seeds = c.filter(F.col("c_custkey") <= 20).select(
        F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("name")
    )
    return retrieval.khop_neighbors(e1.unionAll(e2), seeds, hops=2)


SQL_KHOP = """
SELECT 'C' || c_custkey AS name, 0 AS hop FROM customer WHERE c_custkey <= 20
UNION ALL
SELECT DISTINCT 'O' || o_orderkey AS name, 1 AS hop FROM orders WHERE o_custkey <= 20
UNION ALL
SELECT DISTINCT 'S' || l_suppkey AS name, 2 AS hop
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_custkey <= 20
"""


def q_anti_join_inactive(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.join(big, "c_custkey", "left_anti")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000
)
"""


def q_unordered_pair_merge(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.least("l_partkey", "l_suppkey").alias("pair_lo"),
            F.greatest("l_partkey", "l_suppkey").alias("pair_hi"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"),
        )
        .select("pair_lo", "pair_hi", "n", F.round(F.col("_q").cast("double"), 2).alias("sum_qty"))
    )


SQL_UNORDERED_PAIR = """
SELECT least(l_partkey, l_suppkey) AS pair_lo,
       greatest(l_partkey, l_suppkey) AS pair_hi,
       COUNT(*) AS n,
       round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
FROM lineitem
GROUP BY 1, 2
"""


def q_set_ops_nations(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    only_cust = (
        c.filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey")).distinct()
        .exceptAll(
            s.filter(F.col("s_acctbal") > 9000)
            .select(F.col("s_nationkey").alias("nationkey")).distinct()
        )
    )
    return only_cust.join(
        n.select(F.col("n_nationkey").alias("nationkey"), "n_name"), "nationkey"
    ).select("nationkey", "n_name")


SQL_SET_OPS = """
SELECT nationkey, n_name
FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
  EXCEPT
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
) x JOIN nation ON n_nationkey = nationkey
"""


def q_scalar_string_ops(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    # shorten_string(s, 10, 10) semantics: helper.py:39-45
    short = F.when(
        F.length("p_name") > 23,
        F.concat(
            F.expr("substr(p_name, 1, 10)"),
            F.lit("..."),
            F.expr("substr(p_name, length(p_name)-9, 10)"),
        ),
    ).otherwise(F.col("p_name"))
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        short.alias("name_short"),
        F.upper("p_name").alias("name_upper"),
    )


SQL_SCALAR_STRING = """
SELECT p_partkey, md5(p_name) AS name_md5,
  CASE WHEN length(p_name) > 23
       THEN substr(p_name, 1, 10) || '...' || substr(p_name, length(p_name)-9, 10)
       ELSE p_name END AS name_short,
  upper(p_name) AS name_upper
FROM part
"""


def q_regex_scan(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(
            F.array_sort(
                F.array_distinct(
                    F.regexp_extract_all(F.col("text"), F.lit(r"\b(?:qu|sc)[a-z]+"), 0)
                )
            )
        ).alias("token"),
    )


SQL_REGEX_SCAN = r"""
SELECT doc_id, unnest(list_sort(list_distinct(
  regexp_extract_all(text, '\b(?:qu|sc)[a-z]+')))) AS token
FROM documents
"""


def q_doc_token_stats(spark, sf_dir):
    d = _tp(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ts.token_count(F.col("text")).cast("long").alias("n_tokens"),
        ts.bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


SQL_DOC_TOKEN_STATS = f"""
SELECT doc_id,
  {ts.sql_token_count('text')} AS n_tokens,
  {ts.sql_bpe_token_count('text')} AS n_bpe_tokens,
  length(text) AS n_chars
FROM documents
"""


def q_doc_quality(spark, sf_dir):
    d = _tp(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(ts.quality_score(F.col("text")), 4).alias("quality"),
        F.round(ts.alpha_ratio(F.col("text")), 4).alias("alpha_ratio"),
        F.round(ts.stopword_ratio(F.col("text")), 4).alias("stopword_ratio"),
        F.round(ts.punct_ratio(F.col("text")), 4).alias("punct_ratio"),
    )


SQL_DOC_QUALITY = f"""
SELECT doc_id,
  {ts.sql_round_spark(ts.sql_quality_score('text'), 4)} AS quality,
  {ts.sql_round_spark(ts.sql_alpha_ratio('text'), 4)} AS alpha_ratio,
  {ts.sql_round_spark(ts.sql_stopword_ratio('text'), 4)} AS stopword_ratio,
  {ts.sql_round_spark(ts.sql_punct_ratio('text'), 4)} AS punct_ratio
FROM documents
"""


def q_doc_lang_id(spark, sf_dir):
    d = _tp(spark, sf_dir, "documents")
    return (
        d.select(ts.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SQL_DOC_LANG_ID = f"""
SELECT {ts.sql_lang_id('text')} AS lang_pred, COUNT(*) AS n_docs
FROM documents GROUP BY 1
"""


def q_doc_fingerprint(spark, sf_dir):
    d = _tp(spark, sf_dir, "documents")
    return (
        d.select("source", ts.fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct_fp"),
        )
    )


SQL_DOC_FINGERPRINT = f"""
SELECT source, COUNT(*) AS n_docs,
  COUNT(DISTINCT {ts.sql_fingerprint('text')}) AS n_distinct_fp
FROM documents GROUP BY source
"""


def q_doc_repetition(spark, sf_dir):
    """Gopher-style repetition signals (functions/repetition.py).

    One zero-shuffle projection: the within-doc n-gram argmax that naively
    needs explode+groupBy is a run-length fold over the sorted in-row gram
    array. The DuckDB oracle computes the same signals the set-theoretic
    way (unnest + GROUP BY + ROW_NUMBER) — two independent formulations
    agreeing on every doc is the strongest per-row check in the suite.
    """
    from mmkg_rag_spark.functions import repetition as rep

    d = _tp(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        ts.token_count(t).cast("long").alias("n_words"),
        F.round(rep.dup_word_frac(t), 4).alias("dup_word_frac"),
        F.round(rep.top_ngram_char_frac(t, 2), 4).alias("top2_frac"),
        rep.ngram_stats(t, 2)["bestg"].alias("top2_gram"),
        F.round(rep.top_ngram_char_frac(t, 3), 4).alias("top3_frac"),
        F.round(rep.dup_ngram_char_frac(t, 5), 4).alias("dup5_frac"),
        rep.line_count(t).cast("long").alias("n_lines"),
        F.round(rep.dup_line_frac(t), 4).alias("dup_line_frac"),
        F.round(rep.ellipsis_line_frac(t), 4).alias("ellipsis_frac"),
        F.round(rep.bullet_line_frac(t), 4).alias("bullet_frac"),
    )


def _sql_doc_repetition() -> str:
    from mmkg_rag_spark.functions import repetition as rep

    def topn(n: int) -> str:
        return f"""
g{n} AS (SELECT doc_id, unnest({rep.sql_word_ngrams('text', n)}) AS gram
        FROM documents),
c{n} AS (SELECT doc_id, gram, COUNT(*) AS c FROM g{n} GROUP BY 1, 2),
t{n} AS (SELECT doc_id, c AS best, gram AS bestg FROM (
          SELECT doc_id, c, gram,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY c DESC, gram ASC) AS rn
          FROM c{n}) WHERE rn = 1)"""

    ell = rep.ELLIPSIS_RE.replace("\\", "\\\\")
    bul = rep.BULLET_RE.replace("\\", "\\\\")
    return f"""
WITH {topn(2)},
{topn(3)},
g5 AS (SELECT doc_id, unnest({rep.sql_word_ngrams('text', 5)}) AS gram
       FROM documents),
c5 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g5 GROUP BY 1, 2),
d5 AS (SELECT doc_id,
              SUM(CASE WHEN c > 1 THEN c * length(gram) ELSE 0 END) AS dup
       FROM c5 GROUP BY 1)
SELECT b.doc_id,
  {ts.sql_token_count('b.text')} AS n_words,
  round({rep.sql_dup_word_frac('b.text')}, 4) AS dup_word_frac,
  round(CASE WHEN t2.best IS NULL OR length(b.text) = 0 THEN 0.0
        ELSE CAST(t2.best * length(t2.bestg) AS DOUBLE) / length(b.text)
        END, 4) AS top2_frac,
  COALESCE(t2.bestg, '') AS top2_gram,
  round(CASE WHEN t3.best IS NULL OR length(b.text) = 0 THEN 0.0
        ELSE CAST(t3.best * length(t3.bestg) AS DOUBLE) / length(b.text)
        END, 4) AS top3_frac,
  round(CASE WHEN d5.dup IS NULL OR length(b.text) = 0 THEN 0.0
        ELSE CAST(d5.dup AS DOUBLE) / length(b.text) END, 4) AS dup5_frac,
  {rep.sql_line_count('b.text')} AS n_lines,
  round({rep.sql_dup_line_frac('b.text')}, 4) AS dup_line_frac,
  round({rep.sql_line_match_frac('b.text', "'" + ell + "'")}, 4)
    AS ellipsis_frac,
  round({rep.sql_line_match_frac('b.text', "'" + bul + "'")}, 4)
    AS bullet_frac
FROM documents b
LEFT JOIN t2 ON b.doc_id = t2.doc_id
LEFT JOIN t3 ON b.doc_id = t3.doc_id
LEFT JOIN d5 ON b.doc_id = d5.doc_id
"""


def q_exact_dedup(spark, sf_dir):
    return textdedup.exact_duplicates(_t(spark, sf_dir, "documents"))


SQL_EXACT_DEDUP = f"""
SELECT {ts.sql_fingerprint('text')} AS fp, MIN(doc_id) AS keep_id,
  COUNT(*) AS dup_count
FROM documents GROUP BY 1
"""


# pair graph shared between ngram_jaccard_pairs and near_dup_survivors:
# both run per bench/driver session, and the shingle self-join is the
# expensive part — checkpoint it once per sf_dir (VERDICT r1 #7)
_NGRAM_PAIRS_MEMO: dict[str, object] = {}
# no-silent-caps disclosure: sf_dir → out_info dict whose lazy over-cap
# branch counts the shingles dropped from pair evidence (textdedup item 7)
_NGRAM_CAP_INFO: dict[str, dict] = {}


def _ngram_pairs(spark, sf_dir):
    key = sf_dir
    if key not in _NGRAM_PAIRS_MEMO:
        info: dict = {}
        _NGRAM_PAIRS_MEMO[key] = textdedup.ngram_jaccard_pairs(
            _t(spark, sf_dir, "documents"), n=3, threshold=0.5, out_info=info
        ).localCheckpoint()
        # lazy disclosure handle: cap_dropped_shingles(info) counts on
        # demand at report time (bench.py), never inside the timed query
        _NGRAM_CAP_INFO[key] = info
    return _NGRAM_PAIRS_MEMO[key]


def q_ngram_jaccard(spark, sf_dir):
    return _ngram_pairs(spark, sf_dir)


SQL_NGRAM_JACCARD = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
),
sh0 AS (
  SELECT doc_id AS id, unnest(list_distinct(
    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)]
  )) AS shingle FROM w
),
-- mirror the engine's max_shingle_freq=1000 boilerplate cap; sizes come
-- from the same capped set so the metric matches exactly (ADVICE r1)
capped AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 1000),
sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN capped USING (shingle)),
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.id < b.id GROUP BY 1, 2
)
SELECT id_a, id_b,
  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON id_a = sa.id
JOIN sizes sb ON id_b = sb.id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
"""


def q_ngram_jaccard_prefix(spark, sf_dir):
    """EXACT prefix-filtered set-similarity join (PPJoin-style): the
    cap-free scale path for word-n-gram Jaccard — rarest-first global
    shingle order, per-doc prefix of length |S|−⌈t·|S|⌉+1 indexed, so
    ultra-common boilerplate shingles never enter the inverted-index
    self-join and no pair evidence is dropped. The oracle is the plain
    UNCAPPED pairwise Jaccard — candidate completeness is the PPJoin
    prefix lemma, exactness is the full intersection-count verify."""
    return textdedup.prefix_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5
    )


SQL_NGRAM_JACCARD_PREFIX = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id AS id, unnest(list_distinct(
    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)]
  )) AS shingle FROM w
),
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.id < b.id GROUP BY 1, 2
)
SELECT id_a, id_b,
  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON id_a = sa.id
JOIN sizes sb ON id_b = sb.id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
"""


def q_near_dup_survivors(spark, sf_dir):
    return textdedup.near_dup_survivors(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5,
        pairs=_ngram_pairs(spark, sf_dir),
    )


# transitive closure of the jaccard≥0.5 pair graph via recursive CTE;
# survivor = min doc_id of its component; group_size = component size
SQL_NEAR_DUP_SURVIVORS = r"""
WITH RECURSIVE w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
),
sh0 AS (
  SELECT doc_id AS id, unnest(list_distinct(
    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)]
  )) AS shingle FROM w
),
-- mirror the engine's max_shingle_freq=1000 boilerplate cap; sizes come
-- from the same capped set so the metric matches exactly (ADVICE r1)
capped AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 1000),
sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN capped USING (shingle)),
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.id < b.id GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
),
comp AS (
  SELECT a AS id, least(a, MIN(b)) AS component FROM reach GROUP BY a
),
labeled AS (
  SELECT d.doc_id AS id, COALESCE(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
),
gsz AS (SELECT component, COUNT(*) AS group_size FROM labeled GROUP BY component)
SELECT l.id AS doc_id, g.group_size
FROM labeled l JOIN gsz g USING (component)
WHERE l.id = l.component
"""


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via window functions.

    lag(ts) per user → gap > 30 min marks a session start → running sum of
    markers = session index → per-session aggregate. All native window +
    aggregation; the streaming twin is streaming.sessionize_events.
    """
    e = _t(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ (parquet isAdjustedToUTC=false + Spark inferNTZ).
    # unix_timestamp(ntz) would round-trip through the *session* timezone;
    # derive the wall-clock epoch from date/time fields instead so parity
    # with DuckDB's TZ-naive epoch(ts) holds under any harness session TZ.
    def _epoch(c):
        return (
            F.unix_date(F.col(c).cast("date")) * F.lit(86400)
            + F.hour(c) * 3600
            + F.minute(c) * 60
            + F.second(c)
        ).cast("long")

    epoch = _epoch("ts")
    marked = e.withColumn(
        "new_sess",
        F.when(epoch - F.lag(epoch).over(w_user) > 1800, F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        # cast: DuckDB's window SUM is HUGEINT; pin both engines to int64 so
        # the driver's value-hash sees identical renderings (VERDICT r1 #1).
        "session_idx",
        F.sum("new_sess")
        .over(w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        marked.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # date_format on TIMESTAMP_NTZ renders the stored wall-clock —
            # TZ-invariant, matching the oracle's strftime on naive ts.
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            (F.max(epoch) - F.min(epoch)).alias("duration_sec"),
        )
    )


SQL_EVENTS_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, event_id, ts,
    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
              - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
    CAST(SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS session_idx
  FROM marked
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  MAX(CAST(floor(epoch(ts)) AS BIGINT)) - MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_sec
FROM sess GROUP BY user_id, session_idx
"""


def q_events_asof_join(spark, sf_dir):
    """As-of join: each click gets the latest prior-or-equal purchase value
    per user (operators/temporal.asof_join — union + keyed window, never a
    quadratic per-key theta-join). Oracle: DuckDB's native ASOF LEFT JOIN."""
    from mmkg_rag_spark.operators.temporal import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round("value", 4).alias("purchase_value")
    )
    out = asof_join(
        clicks, purchases, key_cols=["user_id"], value_cols=["purchase_value"]
    )
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "purchase_value",
    )


SQL_EVENTS_ASOF = """
WITH clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, round(value, 4) AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.event_id,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
  p.purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_events_window_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            # ts is TIMESTAMP_NTZ: date_format renders the stored wall-clock,
            # TZ-invariant (matches the oracle's strftime on naive ts)
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("_sv"),
        )
        .select(
            "event_type", "day", "n",
            F.round(F.col("_sv").cast("double"), 4).alias("sum_value"),
        )
    )


SQL_EVENTS_WINDOW = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_embedding_near_dup(spark, sf_dir):
    return textdedup.embedding_near_duplicates(
        _t(spark, sf_dir, "embeddings"), threshold=0.4
    )


SQL_EMBEDDING_NEAR_DUP = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
"""


def q_ann_topk_bruteforce(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ann.brute_topk_cosine(e, q, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


SQL_ANN_BRUTE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS nn_id,
    round(list_dot_product(qv, v)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS score
  FROM q JOIN e ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, nn_id, score,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id) AS rank
  FROM scored
)
SELECT query_id, nn_id, rank, score FROM ranked WHERE rank <= 5
"""


def q_minhash_near_dup_md5(spark, sf_dir):
    """MinHash-LSH near-dup with the md5 hash scheme — fully oracle-checked.

    Same banding/permutations as the production xxhash64 path; the base hash
    is md5-hex (bit-identical in DuckDB), so the ENTIRE LSH pipeline —
    signatures, band buckets, bucket-size cap, candidate join, exact-Jaccard
    verify — is reproduced by the SQL oracle below.
    """
    return textdedup.minhash_near_duplicates(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5, hash_fn="md5"
    )


def _sql_minhash_md5(num_hashes: int = 64, bands: int = 16, seed: int = 1,
                     max_bucket: int = 2000) -> str:
    from mmkg_rag_spark.functions.minhash import MERSENNE_P, _perm_consts

    a_c, b_c = _perm_consts(num_hashes, seed)
    rows = num_hashes // bands
    P = MERSENNE_P
    sig_elems = ", ".join(
        f"COALESCE(list_min(list_transform(h, x -> (x*{a_c[i]} + {b_c[i]}) % {P})), {P})"
        for i in range(num_hashes)
    )
    band_structs = ", ".join(
        "{'band': %d, 'bkey': %s}"
        % (
            i,
            " || ',' || ".join(
                f"sig[{i * rows + j + 1}]::VARCHAR" for j in range(rows)
            ),
        )
        for i in range(bands)
    )
    return rf"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id AS id, list_distinct(
    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)]
  ) AS sh FROM w
),
hs AS (
  SELECT id, sh, list_transform(
    sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {P}
  ) AS h FROM sh
),
sig AS (SELECT id, sh, [{sig_elems}] AS sig FROM hs),
bands AS (
  SELECT id, b['band'] AS band, b['bkey'] AS bkey
  FROM sig, unnest([{band_structs}]) AS t(b)
),
ok_buckets AS (
  SELECT band, bkey FROM bands GROUP BY band, bkey HAVING COUNT(*) <= {max_bucket}
),
kept AS (SELECT b.* FROM bands b JOIN ok_buckets USING (band, bkey)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM kept a JOIN kept b USING (band, bkey)
  WHERE a.id < b.id
),
verified AS (
  SELECT c.id_a, c.id_b,
    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN sh sa ON c.id_a = sa.id
  JOIN sh sb ON c.id_b = sb.id
)
SELECT id_a, id_b, round(jaccard, 4) AS jaccard
FROM verified WHERE jaccard >= 0.5
"""


def q_simhash_near_dup_md5(spark, sf_dir):
    """SimHash near-dup with the md5 hash scheme — fully oracle-checked."""
    return textdedup.simhash_near_duplicates(
        _t(spark, sf_dir, "documents"), max_hamming=3, hash_fn="md5"
    ).withColumn("hamming", F.col("hamming").cast("long"))


def _sql_simhash_md5(max_hamming: int = 3) -> str:
    P_bits = 64
    bit_votes = " + ".join(
        f"(CASE WHEN list_sum(list_transform(h, x -> ((x >> {b}) & 1)*2 - 1)) > 0 "
        f"THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(P_bits)
    )
    chunk_structs = ", ".join(
        f"{{'band': {i}, 'chunk': (sig >> {i * 16}) & 65535}}" for i in range(4)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id AS id,
    list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
  FROM documents
),
hs AS (
  SELECT id, list_transform(t, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS h
  FROM toks
),
sig AS (SELECT id, {bit_votes} AS sig FROM hs),
chunks AS (
  SELECT id, sig, c['band'] AS band, c['chunk'] AS chunk
  FROM sig, unnest([{chunk_structs}]) AS t(c)
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         bit_count(xor(a.sig, b.sig)) AS hamming
  FROM chunks a JOIN chunks b USING (band, chunk)
  WHERE a.id < b.id
)
SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
FROM pairs WHERE hamming <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# training-data curation (operators/curation.py)
# ---------------------------------------------------------------------------

def q_decontaminate(spark, sf_dir):
    """Benchmark n-gram decontamination: corpus docs sharing any 5-gram with
    the (deterministic doc_id%97==0) benchmark slice."""
    d = _tp(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return curation.decontaminate(corpus, bench, n=5)


SQL_DECONTAMINATE = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id AS id, unnest(list_distinct(
    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
       || ' ' || toks[i+4] for i in range(1, len(toks)-3)]
  )) AS gram FROM w
),
bg AS (SELECT DISTINCT gram FROM g WHERE id % 97 = 0)
SELECT g.id AS doc_id, COUNT(*) AS n_hits
FROM g JOIN bg USING (gram)
WHERE g.id % 97 <> 0
GROUP BY 1
"""


def q_curate_corpus(spark, sf_dir):
    """End-to-end curation composition: lang/quality/token filters ∩ near-dup
    survivors ∖ benchmark-contaminated (the deterministic doc_id%97==0 slice
    is the 'eval set' — its docs are removed as trivially contaminated)."""
    d = _tp(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return curation.curate_corpus(
        d, bench, pairs=_ngram_pairs(spark, sf_dir)
    )


def _sql_curate_corpus() -> str:
    surv = SQL_NEAR_DUP_SURVIVORS.strip()
    return f"""
WITH surv AS ({surv}),
w5 AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
g5 AS (
  SELECT doc_id AS id, unnest(list_distinct(
    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
       || ' ' || toks[i+4] for i in range(1, len(toks)-3)]
  )) AS gram FROM w5
),
bg5 AS (SELECT DISTINCT gram FROM g5 WHERE id % 97 = 0),
-- contamination over the FULL corpus (benchmark docs flag themselves and
-- are removed — eval docs must not enter the training set)
cont AS (SELECT DISTINCT g5.id AS doc_id FROM g5 JOIN bg5 USING (gram)),
stats AS (
  SELECT doc_id,
    {ts.sql_token_count('text')} AS n_tokens,
    {ts.sql_round_spark(ts.sql_quality_score('text'), 4)} AS quality,
    {ts.sql_lang_id('text')} AS lang_pred
  FROM documents
)
SELECT s.doc_id, s.n_tokens, s.quality
FROM stats s
JOIN surv ON s.doc_id = surv.doc_id
LEFT JOIN cont ON s.doc_id = cont.doc_id
WHERE cont.doc_id IS NULL AND s.lang_pred IN ('en')
  AND s.quality >= 0.5 AND s.n_tokens BETWEEN 20 AND 1000000
"""


def q_pack_shards(spark, sf_dir):
    """Two-phase distributed prefix sum → ~2000-token training shards."""
    return curation.assign_shards(
        _tp(spark, sf_dir, "documents"), shard_tokens=2000
    ).withColumn("shard_id", F.col("shard_id").cast("long"))


SQL_PACK_SHARDS = f"""
WITH t AS (
  SELECT doc_id, {ts.sql_token_count('text')} AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
    SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_before
  FROM t
)
SELECT doc_id, n_tokens,
  CAST(floor(cum_before / 2000.0) AS BIGINT) AS shard_id
FROM c
"""


SAMPLE_RATES_PPM = {"src0": 800_000, "src1": 500_000, "src2": 250_000,
                    "src3": 125_000}
SAMPLE_DEFAULT_PPM = 100_000

# the engine-portable uniform draw (curation.uniform_ppm twin):
# Spark conv(hex,16,10) ≡ DuckDB CAST('0x'||hex AS BIGINT)
SQL_DRAW_PPM = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|42'), 1, 8)) "
    "AS BIGINT) % 1000000"
)


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum Bernoulli sample (curation.sample_stratified).

    Map-only: literal rate map + md5 hash draw, zero shuffle; the draw is a
    pure function of (doc_id, seed) so the sample is identical on any
    cluster size and stable under corpus growth."""
    d = _t(spark, sf_dir, "documents")
    return curation.sample_stratified(
        d, SAMPLE_RATES_PPM, default_ppm=SAMPLE_DEFAULT_PPM
    ).select(
        "doc_id",
        "source",
        curation.uniform_ppm("doc_id").alias("draw_ppm"),
    )


def _sql_stratified_sample() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES_PPM.items()
    )
    rate = f"CASE source {cases} ELSE {SAMPLE_DEFAULT_PPM} END"
    return f"""
SELECT doc_id, source, {SQL_DRAW_PPM} AS draw_ppm
FROM documents
WHERE {SQL_DRAW_PPM} < {rate}
"""


MIXTURE_BUDGET_TOKENS = 600


def q_mixture_sample(spark, sf_dir):
    """Token-budget mixture sampling (curation.sample_mixture): one tiny
    per-stratum aggregate → broadcast plan → one map-side filtered pass.
    All-integer rate math so the plan is bit-reproducible cross-engine."""
    d = _t(spark, sf_dir, "documents")
    return curation.sample_mixture(
        d, budget_tokens=MIXTURE_BUDGET_TOKENS
    ).select("doc_id", "source", "rate_ppm")


def _sql_mixture_sample() -> str:
    return f"""
WITH tot AS (
  SELECT source AS stratum,
         SUM({ts.sql_token_count('text')}) AS total_tokens
  FROM documents GROUP BY 1
),
plan AS (
  SELECT stratum, total_tokens,
         CAST(LEAST(1000000,
                    ({MIXTURE_BUDGET_TOKENS} * 1000000) // total_tokens)
              AS BIGINT) AS rate_ppm
  FROM tot
)
SELECT d.doc_id, d.source, p.rate_ppm
FROM documents d JOIN plan p ON d.source = p.stratum
WHERE {SQL_DRAW_PPM} < p.rate_ppm
"""


def q_scrub_pii(spark, sf_dir):
    """PII scrub over documents with deterministically planted PII spans
    (the synthetic corpus contains none) — counts + scrubbed fingerprint."""
    d = _tp(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat_ws(
            " ",
            F.col("text"),
            F.concat(F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("call 555-123-4567"))
            .otherwise(F.lit("host 10.0.0.1")),
        ),
    )
    return curation.scrub_pii(d).select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        F.md5("scrubbed").alias("scrub_fp"),
    )


SQL_SCRUB_PII = r"""
WITH planted AS (
  SELECT doc_id,
    concat_ws(' ', text, 'user' || CAST(doc_id AS VARCHAR) || '@example.com',
      CASE WHEN doc_id % 3 = 0 THEN 'call 555-123-4567' ELSE 'host 10.0.0.1' END
    ) AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS scrub_fp
FROM planted
"""


def _sql_ann_lsh(
    k: int = 5, n_planes: int = 4, n_tables: int = 8, n_probes: int = 0,
    dim: int = 64, seed: int = 7
) -> str:
    """DuckDB twin of ann.lsh_topk_cosine (VERDICT r1 #4).

    The hyperplanes are deterministic SHA-derived constants
    (operators/ann._hyperplanes), so the exact same sign-bucket keys can be
    emitted in SQL: per table, bkey = Σ 2^b over planes with positive dot.
    list_dot_product's sequential summation matches F.aggregate(zip_with)
    (proven by the hash-green SQL_ANN_BRUTE), so the sign — and therefore
    the candidate set — is identical; re-score + rank mirror the brute SQL.
    Multi-probe mirrors the Spark side exactly: the base query key per
    table XORs with each probe mask (0 plus 1-bit flips), computed AFTER
    the base-key CTE so the plane dots are evaluated once per table.
    """
    from mmkg_rag_spark.operators.ann import _hyperplanes

    def _bkey(col: str, planes) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({col}, "
            f"[{', '.join(repr(w) for w in plane)}]) > 0 "
            f"THEN {1 << b} ELSE 0 END)"
            for b, plane in enumerate(planes)
        )

    c_structs, q_structs = [], []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 101 * t)
        c_structs.append("{'tbl': %d, 'bkey': %s}" % (t, _bkey("v", planes)))
        q_structs.append("{'tbl': %d, 'bkey': %s}" % (t, _bkey("qv", planes)))

    masks = [0] + [1 << i for i in range(min(n_probes, n_planes))]
    q_probe = (
        "SELECT query_id, tbl, bkey::BIGINT AS bkey FROM q_b0"
        if n_probes == 0
        else (
            "SELECT query_id, tbl, xor(bkey::BIGINT, m)::BIGINT AS bkey "
            f"FROM q_b0, unnest([{', '.join(str(m) for m in masks)}]) AS mm(m)"
        )
    )

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
c_b AS (
  SELECT vec_id AS nn_id, t.b['tbl'] AS tbl, t.b['bkey']::BIGINT AS bkey
  FROM e, unnest([{', '.join(c_structs)}]) AS t(b)
),
q_b0 AS (
  SELECT query_id, t.b['tbl'] AS tbl, t.b['bkey'] AS bkey
  FROM q, unnest([{', '.join(q_structs)}]) AS t(b)
),
q_b AS ({q_probe}),
cand AS (
  SELECT DISTINCT query_id, nn_id
  FROM q_b JOIN c_b USING (tbl, bkey)
  WHERE nn_id <> query_id
),
scored AS (
  SELECT c.query_id, c.nn_id,
    round(list_dot_product(q.qv, e.v)
          / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))),
          6) AS score
  FROM cand c JOIN q ON c.query_id = q.query_id JOIN e ON c.nn_id = e.vec_id
),
ranked AS (
  SELECT query_id, nn_id, score,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id) AS rank
  FROM scored
)
SELECT query_id, nn_id, rank, score FROM ranked WHERE rank <= {k}
"""


def _sql_kmeans_dist(a: str, b: str, dim: int) -> str:
    return (
        f"round(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i]))), 6)"
    )


def _sql_kmeans_ctes(
    n_lists: int, kmeans_iters: int, dim: int
) -> tuple[list[str], str]:
    """Shared CTE prefix reproducing ann._kmeans_centroids in DuckDB:
    ``e`` (the vectors), the unrolled Lloyd loop, and ``a_final`` (the
    final (vec_id, v, list_id) assignment). Returns (ctes, name of the
    final centroid CTE). Used by the IVF and SemDeDup oracles.

    Parity design: both engines round every centroid distance to 6 dp
    before the argmin and every centroid mean to 9 dp, so assignments and
    centroids are pure functions of the rounded values — summation-order
    float noise (Spark's sequential zip_with vs DuckDB's list_sum /
    partition-merge AVG) cannot flip anything. Init = the n_lists
    smallest-id vectors; empty lists keep their previous centroid
    (COALESCE left join), exactly like the operator."""
    avg_list = ", ".join(f"round(avg(v[{i + 1}]), 9)" for i in range(dim))

    def assign_cte(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, v, list_id FROM (
    SELECT e.vec_id, e.v, c.list_id,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {_sql_kmeans_dist('e.v', 'c.v', dim)}, c.list_id) AS rn
    FROM e CROSS JOIN {cents} c
  ) WHERE rn = 1
)"""

    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS list_id, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {n_lists})
)""",
    ]
    prev = "c0"
    for it in range(1, kmeans_iters + 1):
        ctes.append(assign_cte(f"a{it}", prev))
        ctes.append(
            f"m{it} AS (SELECT list_id, list_value({avg_list}) AS v "
            f"FROM a{it} GROUP BY list_id)"
        )
        ctes.append(
            f"""c{it} AS (
  SELECT c.list_id, COALESCE(m.v, c.v) AS v
  FROM {prev} c LEFT JOIN m{it} m USING (list_id)
)"""
        )
        prev = f"c{it}"
    ctes.append(assign_cte("a_final", prev))
    return ctes, prev


def _sql_ann_ivf(
    k: int = 5, n_lists: int = 16, n_probe: int = 4, dim: int = 64,
    kmeans_iters: int = 2,
) -> str:
    """DuckDB twin of ann.ivf_topk_cosine — the k-means is reproduced IN
    SQL via the shared _sql_kmeans_ctes prefix (see its docstring for the
    rounding-based parity design)."""
    def dist(a: str, b: str) -> str:
        return _sql_kmeans_dist(a, b, dim)

    ctes, prev = _sql_kmeans_ctes(n_lists, kmeans_iters, dim)
    ctes.insert(
        1, "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5)"
    )
    ctes.append(
        f"""probe AS (
  SELECT query_id, qv, list_id FROM (
    SELECT q.query_id, q.qv, c.list_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
        ORDER BY {dist('q.qv', 'c.v')}, c.list_id) AS rn
    FROM q CROSS JOIN {prev} c
  ) WHERE rn <= {n_probe}
)"""
    )
    ctes.append(
        """scored AS (
  SELECT p.query_id, a.vec_id AS nn_id,
    round(list_dot_product(p.qv, a.v)
          / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))),
          6) AS score
  FROM probe p JOIN a_final a USING (list_id)
  WHERE a.vec_id <> p.query_id
)"""
    )
    ctes.append(
        """ranked AS (
  SELECT query_id, nn_id, score,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id) AS rank
  FROM scored
)"""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT query_id, nn_id, rank, score FROM ranked WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible: LSH / iterative / rapidfuzz)
# ---------------------------------------------------------------------------

def q_minhash_near_dup(spark, sf_dir):
    """BENCH-ONLY (not in queries()): the production xxhash64 hash mode.

    xxhash64 has no DuckDB twin, so this variant is unoracle-able by
    construction; the oracle-checked registration is q_minhash_near_dup_md5
    (identical banding/verify dataflow, md5 base hash). Kept as a module
    attribute so bench.py can time the production hash path."""
    return textdedup.minhash_near_duplicates(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5
    )


def q_simhash_near_dup(spark, sf_dir):
    """BENCH-ONLY (not in queries()): production xxhash64 SimHash — see
    q_minhash_near_dup. Oracle-checked registration is the md5 twin."""
    return textdedup.simhash_near_duplicates(_t(spark, sf_dir, "documents"))


def q_ann_topk_lsh(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # Config pinned explicitly: the oracle SQL unrolls THESE hyperplanes
    # literally — auto-tuning (n_planes=None) must not retune this query
    # out from under its oracle. Multi-probe p=8/T=8/m=8 matches the old
    # p=4/T=8 recall (≈0.82 at 60° neighbors) at a ~25% expected candidate
    # fraction instead of ~40% — the scale answer to the near-orthogonal
    # test corpus (see ann.lsh_topk_cosine docstring).
    return ann.lsh_topk_cosine(
        e, q, k=5, n_planes=8, n_tables=8, n_probes=8
    ).withColumn("rank", F.col("rank").cast("long"))


def q_ann_topk_ivf(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann.ivf_topk_cosine(e, q, k=5).withColumn(
        "rank", F.col("rank").cast("long")
    )


def q_fuzzy_topk_parts(spark, sf_dir):
    """Rows-only BY DESIGN — a faithful DuckDB twin is impossible (VERDICT
    r2 #8, settled): the score is rapidfuzz's token_ratio =
    max(token_sort_ratio, token_set_ratio) over normalized *indel*
    similarity (insert/delete only; substitution costs 2). DuckDB's only
    edit-distance primitives are levenshtein()/damerau_levenshtein()
    (substitution costs 1, no cost weights, no LCS/longest_common_subseq
    function), and the token_set decomposition (3-way max over
    intersection/remainder joins) has no SQL counterpart either — so any
    SQL "oracle" would compute a DIFFERENT metric whose top-k legitimately
    disagrees on ties/near-ties. Correctness is pinned instead by the
    pytest golden (tests/test_goldens.py) and the kernel unit tests
    (tests/test_similarity.py) against rapidfuzz's published definition."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", F.array("p_name").alias("fields")
    )
    return retrieval.fuzzy_topk(
        p, ["red widget", "blue bolt"], "fields", ["p_partkey"], max_num=3
    )


def q_pagerank_suppliers(spark, sf_dir):
    """PageRank centrality over the supplier↔customer trading graph.

    Exact fixed-point integer ranks (operators/graph.py): every step of the
    recurrence is BIGINT arithmetic, so the 5-iteration result is
    bit-identical across partitionings AND engines — the DuckDB oracle
    unrolls the same recurrence as chained CTEs and hash-matches.
    """
    from mmkg_rag_spark.operators.graph import pagerank

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
    )
    pr = pagerank(e, undirected=True, iterations=5)
    return (
        pr.select("node", "rank_scaled")
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(30)
    )


def _sql_pagerank(iterations: int = 5, seed_pred: str | None = None) -> str:
    """Unrolled integer PageRank (mirrors operators/graph.py exactly).

    ``seed_pred``: SQL predicate over a node string (e.g. the supplier-key
    filter) → personalized PageRank; None → uniform teleport.
    """
    from mmkg_rag_spark.operators.graph import SCALE

    base = (SCALE * 3) // 20

    def flag(expr: str) -> str:
        if seed_pred is None:
            return "1"
        return f"(CASE WHEN {seed_pred.format(node=expr)} THEN 1 ELSE 0 END)"

    ctes = [
        "e0 AS (SELECT DISTINCT 'S' || l_suppkey AS src, 'C' || o_custkey AS dst\n"
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "bi AS (SELECT src, dst FROM e0 UNION ALL\n"
        "  SELECT dst AS src, src AS dst FROM e0)",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM bi GROUP BY src)",
        "adj AS (SELECT b.src, b.dst, d.outdeg FROM bi b JOIN deg d USING (src))",
        f"r0 AS (SELECT src AS node,\n"
        f"  CAST({SCALE} * {flag('src')} AS BIGINT) AS rank FROM deg)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"r{i} AS (SELECT a.dst AS node,\n"
            f"  CAST({flag('a.dst')} * {base}"
            f" + (CAST(SUM(r.rank // a.outdeg) AS BIGINT) // 20)"
            f" * 17 AS BIGINT) AS rank\n"
            f"  FROM adj a JOIN r{i - 1} r ON r.node = a.src GROUP BY a.dst)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, rank AS rank_scaled FROM r{iterations}"
        + "\nORDER BY rank_scaled DESC, node LIMIT 30"
    )


def q_ppr_suppliers(spark, sf_dir):
    """Personalized PageRank: random-walk proximity to 5 seed suppliers —
    the retrieval-side ranking (seed = query entities) over the trading
    graph. Same exact-integer recurrence; teleport mass restricted to the
    seed set (operators/graph.py personalize=)."""
    from mmkg_rag_spark.operators.graph import pagerank

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    e = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
    )
    seeds = s.filter(F.col("s_suppkey") < 5).select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("node")
    )
    pr = pagerank(e, undirected=True, iterations=5, personalize=seeds)
    return (
        pr.select("node", "rank_scaled")
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(30)
    )


def q_lpa_suppliers(spark, sf_dir):
    """Community sizes from deterministic synchronous label propagation
    over the supplier↔customer trading graph (operators/graph.py). The
    min-struct tie-break makes the labeling a pure function of the graph,
    so the DuckDB oracle (same recurrence, ROW_NUMBER tie-break) matches
    hash-exactly."""
    from mmkg_rag_spark.operators.graph import label_propagation

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
    )
    lab = label_propagation(e, iterations=4)
    return (
        lab.groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(30)
    )


def _sql_lpa(iterations: int = 4) -> str:
    """Unrolled synchronous LPA (mirrors operators/graph.py exactly)."""
    ctes = [
        "e0 AS (SELECT DISTINCT 'S' || l_suppkey AS src, 'C' || o_custkey AS dst\n"
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "bi AS (SELECT src, dst FROM e0 UNION ALL\n"
        "  SELECT dst AS src, src AS dst FROM e0)",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM bi)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"v{i} AS (SELECT b.dst AS node, l.label, COUNT(*) AS c\n"
            f"  FROM bi b JOIN l{i - 1} l ON l.node = b.src"
            f" GROUP BY b.dst, l.label)",
        )
        ctes.append(
            f"l{i} AS (SELECT node, label FROM (SELECT node, label,\n"
            f"  ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label)"
            f" AS rn FROM v{i}) WHERE rn = 1)"
        )
    return (
        "WITH " + ",\n".join(c if isinstance(c, str) else c[0] for c in ctes)
        + f"\nSELECT label AS community, COUNT(*) AS n_members FROM l{iterations}"
        + "\nGROUP BY label ORDER BY n_members DESC, community LIMIT 30"
    )


def q_triangles_coorder(spark, sf_dir):
    """Triangle counts + clustering coefficients on the part co-order graph
    (parts appearing in the same order are linked). Degree-oriented wedge
    enumeration (operators/graph.py triangle_counts) — the O(m^1.5),
    skew-proof MapReduce-classic — with exact integer counts so the DuckDB
    oracle (same set construction in SQL) hash-matches. Top-30 by count."""
    from mmkg_rag_spark.operators.graph import triangle_counts

    li = _t(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    l2 = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    e = (
        l1.join(l2, "l_orderkey")
        .where(F.col("p1") < F.col("p2"))
        .select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
    )
    t = triangle_counts(e)
    return (
        t.select(
            F.col("node").cast("long").alias("node"),
            F.col("degree").cast("long").alias("degree"),
            F.col("triangles").cast("long").alias("triangles"),
            F.round("clustering", 4).alias("clustering"),
        )
        .orderBy(F.desc("triangles"), "node")
        .limit(30)
    )


SQL_TRIANGLES = """
WITH pr AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT a AS node FROM pr UNION ALL SELECT b AS node FROM pr)
  GROUP BY node
),
o AS (
  SELECT CASE WHEN da.degree < db.degree
              OR (da.degree = db.degree AND pr.a < pr.b)
         THEN pr.a ELSE pr.b END AS u,
         CASE WHEN da.degree < db.degree
              OR (da.degree = db.degree AND pr.a < pr.b)
         THEN pr.b ELSE pr.a END AS v,
         CASE WHEN da.degree < db.degree
              OR (da.degree = db.degree AND pr.a < pr.b)
         THEN db.degree ELSE da.degree END AS dv
  FROM pr JOIN deg da ON da.node = pr.a JOIN deg db ON db.node = pr.b
),
w AS (
  SELECT o1.u, o1.v AS v1, o2.v AS v2
  FROM o o1 JOIN o o2 ON o1.u = o2.u
   AND (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))
),
tri AS (
  SELECT w.u, w.v1, w.v2 FROM w JOIN o ON o.u = w.v1 AND o.v = w.v2
),
pn AS (
  SELECT node, COUNT(*) AS triangles FROM (
    SELECT u AS node FROM tri UNION ALL
    SELECT v1 AS node FROM tri UNION ALL
    SELECT v2 AS node FROM tri)
  GROUP BY node
)
SELECT d.node, d.degree, COALESCE(pn.triangles, 0) AS triangles,
  round(CASE WHEN d.degree < 2 THEN 0.0
        ELSE CAST(COALESCE(pn.triangles, 0) * 2 AS DOUBLE)
             / (d.degree * (d.degree - 1)) END, 4) AS clustering
FROM deg d LEFT JOIN pn ON pn.node = d.node
ORDER BY triangles DESC, d.node LIMIT 30
"""


KCORE_K = 80
KCORE_ROUNDS = 6


def q_kcore_coorder(spark, sf_dir):
    """k-core of the part co-order graph (operators/graph.py kcore):
    fixed-round synchronous peeling, exact integer degrees, so the DuckDB
    oracle (same rounds unrolled as CTEs) hash-matches. Returns surviving
    (node, core_degree)."""
    from mmkg_rag_spark.operators.graph import kcore

    li = _t(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    l2 = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    e = (
        l1.join(l2, "l_orderkey")
        .where(F.col("p1") < F.col("p2"))
        .select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
    )
    out = kcore(e, k=KCORE_K, rounds=KCORE_ROUNDS)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("core_degree").cast("long").alias("core_degree"),
    )


def _sql_kcore(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    ctes = [
        "pr AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b\n"
        "  FROM lineitem l1 JOIN lineitem l2\n"
        "    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey)",
        "bi AS (SELECT a AS src, b AS dst FROM pr\n"
        "  UNION ALL SELECT b AS src, a AS dst FROM pr)",
        "a0 AS (SELECT DISTINCT src AS node FROM bi)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"d{r} AS (SELECT b.src AS node, COUNT(*) AS cd FROM bi b\n"
            f"  JOIN a{r - 1} x ON b.src = x.node\n"
            f"  JOIN a{r - 1} y ON b.dst = y.node GROUP BY b.src)"
        )
        ctes.append(f"a{r} AS (SELECT node FROM d{r} WHERE cd >= {k})")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, cd AS core_degree FROM d{rounds} WHERE cd >= {k}"
    )


def q_kg_pagerank(spark, sf_dir):
    """Entity centrality over the constructed KG (rows-only: the graph is
    built by the LLM-extraction pipeline, not SQL-derivable)."""
    from mmkg_rag_spark.operators.graph import pagerank

    kg = _build_kg(spark, sf_dir)
    pr = pagerank(
        kg.all_edges.select("source", "target"), "source", "target",
        undirected=True, iterations=5,
    )
    return (
        pr.select("node", "rank_scaled")
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(20)
    )


def q_kg_communities(spark, sf_dir):
    """GraphRAG-style communities of the constructed KG (rows-only: the
    graph comes from the extraction pipeline). Deterministic LPA — the
    community sizes are golden-pinned in tests/test_goldens.py."""
    from mmkg_rag_spark.operators.graph import label_propagation

    kg = _build_kg(spark, sf_dir)
    lab = label_propagation(
        kg.all_edges.select("source", "target"), "source", "target",
        iterations=4,
    )
    return (
        lab.groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


def q_kg_nodes(spark, sf_dir):
    kg = _build_kg(spark, sf_dir)
    return kg.nodes.select(
        "name", "label", "description",
        F.size("aliases").cast("long").alias("n_aliases"),
        F.size("chunks").cast("long").alias("n_chunks"),
    )


def q_kg_edges(spark, sf_dir):
    kg = _build_kg(spark, sf_dir)
    return kg.all_edges.select("source", "label", "target")


def q_kg_degree_topk(spark, sf_dir):
    from mmkg_rag_spark.pipeline import degree_summary

    return degree_summary(_build_kg(spark, sf_dir)).limit(20)


def q_kg_search_eris(spark, sf_dir):
    """R4 retrieval composition over the constructed KG (rows-only check)."""
    from mmkg_rag_spark.operators.retrieval import search_eris

    kg = _build_kg(spark, sf_dir)
    # retrieval reads the persisted bucketed layout (VERDICT r2 #7): the
    # name/source-keyed scans are co-located, so any non-broadcast join
    # the planner picks on those keys is exchange-free on the graph side
    nodes = spark.table(kg.nodes_table) if kg.nodes_table else kg.nodes
    edges = spark.table(kg.edges_table) if kg.edges_table else kg.all_edges
    res = search_eris(
        nodes, edges, kg.images,
        ["Global Web Consortium", "Acme"], max_num=3,
    )
    return res["related_edges"].select("source", "label", "target")


# ---------------------------------------------------------------------------
# lexical relevance (TF-IDF / BM25 / inverted index) + event sequence ops
# ---------------------------------------------------------------------------

_BM25_QUERY = ["spark", "join", "window", "vector"]


def q_doc_tfidf_topk(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (operators/relevance.py)."""
    from mmkg_rag_spark.operators.relevance import tfidf_topk

    return tfidf_topk(_tp(spark, sf_dir, "documents"), k=3)


SQL_TFIDF = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
  ) AS rank FROM scored
)
SELECT doc_id, term, tf, round(tfidf, 6) AS tfidf, rank
FROM ranked WHERE rank <= 3
"""


def q_bm25_search(spark, sf_dir):
    """Okapi BM25 top-10 for a fixed bag of query terms."""
    from mmkg_rag_spark.operators.relevance import bm25_search

    return bm25_search(_tp(spark, sf_dir, "documents"), _BM25_QUERY, k=10)


def _sql_bm25(terms=None, k=10, k1=1.2, b=0.75) -> str:
    terms = terms or _BM25_QUERY
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tok AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
df AS (SELECT term, count(*) AS df FROM tf WHERE term IN ({tlist}) GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (n.n_docs - df.df + 0.5) / (df.df + 0.5))
         * (tf.tf * {k1 + 1.0}) / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / avgdl.avgdl)) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
  CROSS JOIN n CROSS JOIN avgdl
  WHERE tf.term IN ({tlist})
)
SELECT doc_id,
       round(CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE), 6) AS score,
       count(*) AS n_terms_hit
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def q_inverted_index(spark, sf_dir):
    """Posting lists with df >= 5; postings emitted as a CSV string (the
    driver's value hash canonicalizes strings, not engine array types)."""
    from mmkg_rag_spark.operators.relevance import inverted_index

    idx = inverted_index(_tp(spark, sf_dir, "documents"), min_df=5)
    return idx.select(
        "term",
        "df",
        F.array_join(
            F.transform(F.col("postings"), lambda x: x.cast("string")), ","
        ).alias("postings"),
    )


SQL_INVERTED_INDEX = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2
)
SELECT term, count(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY term HAVING count(*) >= 5
"""


_FUNNEL_STEPS = ["signup", "click", "purchase"]


def q_events_funnel(spark, sf_dir):
    """3-step ordered funnel over the event stream (operators/temporal.py):
    one user-keyed shuffle + chained conditional window minimums."""
    from mmkg_rag_spark.operators.temporal import funnel_counts

    return funnel_counts(
        _t(spark, sf_dir, "events"), _FUNNEL_STEPS
    ).withColumn("step", F.col("step").cast("long"))


SQL_EVENTS_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY e.user_id
),
c AS (
  SELECT (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2,
         (SELECT count(*) FROM s3) AS n3
)
SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type, n1 AS n_users,
       round(n1 / n1, 6) AS conv_from_first FROM c
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', n2, round(n2 / n1, 6) FROM c
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', n3, round(n3 / n1, 6) FROM c
"""


def q_events_json_extract(spark, sf_dir):
    """Semi-structured props parsing: JSON field k aggregated per type —
    get_json_object stays JVM-side (no Python round-trip)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.withColumn("_k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
        )
        .withColumn(
            "avg_k",
            F.round(F.col("sum_k").cast("double") / F.col("n_events"), 6),
        )
    )


SQL_EVENTS_JSON = """
SELECT event_type, count(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       round(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / count(*), 6) AS avg_k
FROM events GROUP BY event_type
"""


def q_events_range_join(spark, sf_dir):
    """Point-in-interval join (operators/temporal.range_join): clicks
    landing inside any [error_ts, error_ts + 10 min) window of the same
    user — bucketed banding, never a nested-loop inequality join."""
    from mmkg_rag_spark.operators.temporal import range_join

    e = _t(spark, sf_dir, "events")
    iv = (
        e.filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end_ts"),
        )
    )
    pt = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    return (
        range_join(pt, iv, ["user_id"], bucket_seconds=600)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


SQL_EVENTS_RANGE_JOIN = """
WITH iv AS (
  SELECT user_id, ts AS start_ts, ts + INTERVAL 10 MINUTE AS end_ts
  FROM events WHERE event_type = 'error'
),
pt AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT pt.user_id, count(*) AS n_pairs
FROM pt JOIN iv ON pt.user_id = iv.user_id
  AND iv.start_ts <= pt.ts AND pt.ts < iv.end_ts
GROUP BY pt.user_id
"""


def q_doc_bigram_topk(spark, sf_dir):
    """Corpus bigram count table, top-20 (operators/relevance.ngram_counts):
    n-grams built in-row from the token array (no per-position window),
    one map-side-combinable groupBy, bounded top-k."""
    from mmkg_rag_spark.operators.relevance import ngram_counts

    return ngram_counts(_tp(spark, sf_dir, "documents"), n=2, k=20)


SQL_BIGRAMS = """
WITH arrs AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
bg AS (
  SELECT unnest(list_transform(list_zip(l[1:len(l)-1], l[2:len(l)]),
                z -> z[1] || ' ' || z[2])) AS ngram
  FROM arrs
)
SELECT ngram, count(*) AS n_occurrences
FROM bg GROUP BY ngram
ORDER BY n_occurrences DESC, ngram ASC LIMIT 20
"""


def q_doc_lm_score(spark, sf_dir):
    """Corpus-LM document scoring (relevance.rare_ngram_score): per doc,
    the rare-bigram instance fraction + mean corpus bigram frequency — the
    KenLM-shaped gibberish filter, in pure integer arithmetic so the
    oracle can hash-match (no order-dependent float log-prob sums)."""
    from mmkg_rag_spark.operators.relevance import rare_ngram_score

    return rare_ngram_score(_tp(spark, sf_dir, "documents"), n=2, rare_max=1)


SQL_DOC_LM_SCORE = """
WITH arrs AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
inst AS (
  SELECT doc_id AS id,
         unnest(list_transform(list_zip(l[1:len(l)-1], l[2:len(l)]),
                z -> z[1] || ' ' || z[2])) AS ngram
  FROM arrs
),
cnts AS (SELECT ngram, COUNT(*) AS cnt FROM inst GROUP BY ngram)
SELECT i.id AS doc_id,
  COUNT(*) AS n_ngrams,
  CAST(SUM(CASE WHEN c.cnt <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
  round(CAST(SUM(CASE WHEN c.cnt <= 1 THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 4) AS rare_frac,
  round(CAST(SUM(c.cnt) AS DOUBLE) / COUNT(*), 4) AS avg_freq
FROM inst i JOIN cnts c USING (ngram)
GROUP BY i.id
"""


_BFS_SEEDS = ["S0", "S1"]
_BFS_HOPS = 3


def q_bfs_suppliers(spark, sf_dir):
    """Multi-source BFS distances over the supplier↔customer graph
    (operators/graph.bfs_distances) — the distributed generalization of
    the reference's k-hop neighborhood (search.py:151-215, networkx
    single_source_shortest_path_length with cutoff)."""
    from mmkg_rag_spark.operators.graph import bfs_distances

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
    )
    return bfs_distances(e, _BFS_SEEDS, _BFS_HOPS)


def _sql_bfs(seeds=None, hops: int = _BFS_HOPS) -> str:
    """Unrolled level-synchronous BFS (mirrors graph.bfs_distances):
    round i relaxes every edge out of the distance table and re-minimizes
    — identical integer distances, hash-green."""
    seeds = seeds or _BFS_SEEDS
    seed_rows = " UNION ALL ".join(f"SELECT '{s}' AS node, 0 AS dist" for s in seeds)
    ctes = [
        "e0 AS (SELECT DISTINCT 'S' || l_suppkey AS src, 'C' || o_custkey AS dst\n"
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "adj AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0)",
        f"d0 AS ({seed_rows})",
    ]
    for i in range(1, hops + 1):
        ctes.append(
            f"d{i} AS (SELECT node, min(dist) AS dist FROM (\n"
            f"  SELECT node, dist FROM d{i - 1}\n"
            f"  UNION ALL\n"
            f"  SELECT a.dst AS node, d.dist + 1 AS dist\n"
            f"  FROM adj a JOIN d{i - 1} d ON d.node = a.src) GROUP BY node)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, dist FROM d{hops}"


def q_events_retention(spark, sf_dir):
    """Weekly retention cohorts: users by (first-activity week, week
    offset) + retention ratio vs the cohort's week 0. Weeks are TZ-proof
    integer epoch-weeks (ntz_epoch // 604800 — no calendar/zone functions,
    so the DuckDB twin is bit-identical). Shuffle shape: one user-keyed
    window for the cohort min, one distinct, one (cohort, offset) agg; the
    ratio window runs over the tiny counts table only."""
    from mmkg_rag_spark.functions.timeops import ntz_epoch

    e = _t(spark, sf_dir, "events")
    week = F.floor(ntz_epoch("ts") / 604800).cast("long")
    wk = e.select("user_id", week.alias("week"))
    w = Window.partitionBy("user_id")
    dist = (
        wk.withColumn("cohort_week", F.min("week").over(w))
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_off"),
        )
        .distinct()
    )
    cnt = dist.groupBy("cohort_week", "week_off").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w0 = Window.partitionBy("cohort_week").orderBy("week_off")
    return cnt.withColumn(
        "retention",
        F.round(F.col("n_users") / F.first("n_users").over(w0), 6),
    )


SQL_EVENTS_RETENTION = """
WITH wk AS (
  SELECT user_id, CAST(floor(epoch(ts) / 604800.0) AS BIGINT) AS week
  FROM events
),
coh AS (
  SELECT user_id, week,
         min(week) OVER (PARTITION BY user_id) AS cohort_week
  FROM wk
),
dist AS (
  SELECT DISTINCT user_id, cohort_week, week - cohort_week AS week_off FROM coh
),
cnt AS (
  SELECT cohort_week, week_off, count(*) AS n_users FROM dist GROUP BY 1, 2
)
SELECT cohort_week, week_off, n_users,
  round(n_users / first_value(n_users) OVER (
    PARTITION BY cohort_week ORDER BY week_off), 6) AS retention
FROM cnt
"""


def q_doc_source_rollup(spark, sf_dir):
    """ROLLUP aggregation (lang, source) with grouping_id — the
    multi-granularity summary operator class (Catalyst expands the rollup
    into a single Expand + one aggregate exchange, not one job per
    grouping set)."""
    d = _t(spark, sf_dir, "documents")
    return d.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.grouping_id().cast("long").alias("gid"),
    )


SQL_DOC_ROLLUP = """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(grouping(lang, source) AS BIGINT) AS gid
FROM documents GROUP BY ROLLUP(lang, source)
"""


def q_events_value_percentiles(spark, sf_dir):
    """Exact interpolated quantiles (p50/p90/p99) of value per event_type —
    the percentile/quantile aggregate class. Uses the exact `percentile`
    aggregate (sort-based within the hash-agg partial), not approx sketches:
    the approximate twin (`approx_percentile`) has engine-specific sketch
    internals that no oracle can reproduce, so the exact form is the
    parity query. One shuffle on event_type; rounded to 4dp so the linear
    interpolation's last-bit float noise can't flake the value hash."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


SQL_EVENTS_PERCENTILES = """
SELECT event_type, COUNT(*) AS n,
  round(quantile_cont(value, 0.5), 4) AS p50,
  round(quantile_cont(value, 0.9), 4) AS p90,
  round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
"""


def q_events_hopping_window(spark, sf_dir):
    """Hopping (sliding) window aggregate: 10-minute windows every 5
    minutes, per event_type. Each event lands in exactly len/hop = 2
    windows; rather than Spark's `F.window` (whose NTZ handling routes
    through the session zone) the window starts are derived from the
    TZ-proof integer epoch and the event is fanned out with one
    `explode(array(0, hop))` — a narrow 2× row expansion followed by one
    (type, win_start) hash aggregate with map-side partials. Same shape the
    streaming twin uses under watermarks."""
    from mmkg_rag_spark.functions.timeops import ntz_epoch

    e = _t(spark, sf_dir, "events")
    base = (F.floor(ntz_epoch("ts") / 300) * 300).cast("long")
    return (
        e.select(
            "event_type",
            base.alias("base"),
            F.col("value"),
            F.explode(F.array(F.lit(0), F.lit(300))).alias("off"),
        )
        .groupBy(
            "event_type", (F.col("base") - F.col("off")).alias("win_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("_sv"),
        )
        .select(
            "event_type", "win_start", "n",
            F.round(F.col("_sv").cast("double"), 4).alias("sum_value"),
        )
    )


SQL_EVENTS_HOPPING = """
SELECT event_type,
  CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - o.off AS win_start,
  COUNT(*) AS n,
  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
FROM events CROSS JOIN (VALUES (0), (300)) AS o(off)
GROUP BY 1, 2
"""


def q_events_daily_pivot(spark, sf_dir):
    """PIVOT: long→wide reshape, one count column per event_type per day.
    With an explicit value list Spark's `.pivot` compiles to ONE hash
    aggregate of conditional counts (no second shuffle, no value-discovery
    job) — identical physical shape to the oracle's FILTER aggregation.
    Never call `.pivot(col)` without values at scale: the value-discovery
    pass is a full extra scan+distinct."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    wide = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types],
    )


SQL_EVENTS_PIVOT = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
  COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
  COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
  COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events GROUP BY 1
"""


def q_lineitem_measures_unpivot(spark, sf_dir):
    """UNPIVOT/melt: wide→long reshape of the four lineitem measures, then
    one aggregate per measure. `DataFrame.unpivot` is a zero-shuffle Expand
    (each input row fans to 4 rows map-side); the only exchange is the
    4-group aggregate. Decimal sums so addition order can't flake parity."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("val").cast("decimal(28,4)")).cast("double"), 2
        ).alias("total"),
        F.round(F.min("val").cast("double"), 4).alias("vmin"),
        F.round(F.max("val").cast("double"), 4).alias("vmax"),
    )


SQL_LINEITEM_UNPIVOT = """
WITH long AS (
  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT 'l_tax', l_tax FROM lineitem
)
SELECT measure, COUNT(*) AS n,
  round(CAST(SUM(CAST(val AS DECIMAL(28,4))) AS DOUBLE), 2) AS total,
  round(CAST(MIN(val) AS DOUBLE), 4) AS vmin,
  round(CAST(MAX(val) AS DOUBLE), 4) AS vmax
FROM long GROUP BY measure
"""


def q_events_trailing_range_window(spark, sf_dir):
    """RANGE-BETWEEN window frame: per user, the trailing-10-minute event
    count and value sum at each event (value-based frame over the TZ-proof
    integer epoch — NOT rowsBetween: rows and range frames diverge whenever
    event spacing is irregular, which is exactly the webtext case). One
    user-keyed shuffle; the frame is evaluated in a single sort pass per
    partition. Decimal sum so addition order can't flake parity."""
    from mmkg_rag_spark.functions.timeops import ntz_epoch

    e = _t(spark, sf_dir, "events")
    ep = ntz_epoch("ts").alias("ep")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep")
        .rangeBetween(-600, Window.currentRow)
    )
    return (
        e.select("user_id", "event_id", ep, F.col("value"))
        .select(
            "user_id",
            "event_id",
            "ep",
            F.count(F.lit(1)).over(w).alias("n_10m"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double"),
                4,
            ).alias("sum_10m"),
        )
        .drop("ep")
    )


SQL_EVENTS_RANGE_WINDOW = """
WITH t AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep, value
  FROM events
)
SELECT user_id, event_id,
  COUNT(*) OVER w AS n_10m,
  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE), 4) AS sum_10m
FROM t
WINDOW w AS (PARTITION BY user_id ORDER BY ep
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
"""


def q_customer_balance_deciles(spark, sf_dir):
    """ntile/percent_rank ranking class: customers bucketed into account-
    balance deciles with per-decile stats. The orderBy carries c_custkey as
    a deterministic tiebreaker — without it, equal balances straddling a
    decile boundary make ntile assignment run-order-dependent and the
    oracle hash flakes. Exact ntile/percent_rank over the whole table is
    intrinsically a SinglePartition global sort — fine for a dimension
    table (customer is ~150k rows/SF); a fact-table decile job would use a
    two-phase rank (per-partition counts + range partitioner) instead.
    The per-decile aggregate is map-side combinable."""
    c = _t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("bal_min"),
        F.round(F.max("c_acctbal"), 2).alias("bal_max"),
        F.round(F.max("pr"), 6).alias("pr_max"),
    )


SQL_CUSTOMER_DECILES = """
WITH ranked AS (
  SELECT c_custkey, c_acctbal,
    CAST(ntile(10) OVER w AS BIGINT) AS decile,
    round(percent_rank() OVER w, 6) AS pr
  FROM customer
  WINDOW w AS (ORDER BY c_acctbal, c_custkey)
)
SELECT decile, COUNT(*) AS n,
  round(MIN(c_acctbal), 2) AS bal_min,
  round(MAX(c_acctbal), 2) AS bal_max,
  round(MAX(pr), 6) AS pr_max
FROM ranked GROUP BY decile
"""


def q_events_distinct_sketch(spark, sf_dir):
    """Mergeable HLL sketches (Apache DataSketches, native in Spark 3.5+):
    per-day distinct-user sketches + a whole-range estimate from
    hll_union_agg over the day sketches. THE pattern for distinct counts
    at 100 TB: each partition/day materializes a fixed-size (≤ 2^lgK
    registers) sketch once, and any rollup (day→month→all) is a cheap
    merge of sketches — no re-scan, no exact-distinct shuffle of raw ids.
    rows-only by necessity (DuckDB's approx_count_distinct is a different
    HLL implementation — estimates differ by design); the error bound vs
    exact countDistinct is pinned by tests/test_percentile_window.py, and
    the oracle-checked portable twin (events_distinct_hll_md5) proves the
    register-level merge semantics cross-engine."""
    e = _t(spark, sf_dir, "events")
    day_sk = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    per_day = day_sk.select(
        "day", F.hll_sketch_estimate("sk").cast("long").alias("est_users")
    )
    total = day_sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est")
    )
    # Lazy scalar attach: broadcast the 1-row union estimate instead of an
    # eager .first() at plan-build time (same pattern as relevance._corpus_size)
    # — one job at execution, the day_sk aggregate computed once per branch.
    return per_day.crossJoin(
        F.broadcast(total.select(F.col("est").alias("est_total_users")))
    )


def q_nation_top_supplier(spark, sf_dir):
    """argmax/max_by aggregate class: the top-balance supplier per nation
    as ONE map-side-combinable `max(struct(...))` — the scale-right argmax
    (each partition keeps one struct per group; the merge is a struct
    compare), NOT a window row_number that sorts every partition's full
    contents. s_suppkey inside the struct is the deterministic tiebreaker;
    both engines compare structs lexicographically, so the oracle
    hash-matches."""
    s = _t(spark, sf_dir, "supplier")
    m = s.groupBy("s_nationkey").agg(
        F.max(
            F.struct(
                F.col("s_acctbal").alias("bal"),
                F.col("s_suppkey").alias("sk"),
                F.col("s_name").alias("nm"),
            )
        ).alias("m")
    )
    return m.select(
        "s_nationkey",
        F.round(F.col("m.bal"), 2).alias("top_bal"),
        F.col("m.sk").alias("top_suppkey"),
        F.col("m.nm").alias("top_name"),
    )


SQL_NATION_TOP_SUPPLIER = """
WITH m AS (
  SELECT s_nationkey,
    max(struct_pack(bal := s_acctbal, sk := s_suppkey, nm := s_name)) AS m
  FROM supplier GROUP BY s_nationkey
)
SELECT s_nationkey, round(m.bal, 2) AS top_bal,
       m.sk AS top_suppkey, m.nm AS top_name
FROM m
"""


def q_lineitem_stats_corr(spark, sf_dir):
    """Statistical-aggregate class: Pearson correlation, sample covariance,
    and sample stddev/variance per group. All four are ALGEBRAIC aggregates
    (each partition keeps O(1) co-moments — n, sum, sum-of-squares,
    cross-moment — and the merge combines moments), so the plan is a single
    map-side-partial groupBy shuffling O(groups) rows regardless of input
    size: the scale-right way to compute second-order statistics at 100 TB.
    Definitions are the textbook ones shared by Spark and DuckDB
    (corr = covar_pop/(stddev_pop_x*stddev_pop_y), *_samp with n-1), so the
    oracle hash-matches after rounding absorbs summation-order ulps."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
                "covar_qty_disc"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
        )
    )


SQL_LINEITEM_STATS_CORR = """
SELECT l_returnflag, COUNT(*) AS n,
  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
  round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
  round(stddev_samp(l_extendedprice), 4) AS sd_price,
  round(var_samp(l_discount), 8) AS var_disc
FROM lineitem GROUP BY l_returnflag
"""


def q_region_nations_listagg(spark, sf_dir):
    """Ordered string-aggregation class (LISTAGG / string_agg): per region,
    the alphabetized comma-joined list of member nation names plus the
    member count. Spark has no ordered listagg aggregate, so the
    deterministic composition is collect_list → array_sort → array_join —
    ordering INSIDE the row after the (unordered, map-side-combinable)
    collect, never a global sort of the input. At 100 TB this stays one
    shuffle of O(groups) rows; the per-group payload is the only thing that
    grows, which is intrinsic to listagg's contract."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(
            F.broadcast(r), n.n_regionkey == r.r_regionkey
        )
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations"),
        )
    )


SQL_REGION_NATIONS_LISTAGG = """
SELECT r_name, COUNT(*) AS n_nations,
  string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_orders_cube(spark, sf_dir):
    """CUBE aggregation class — all four grouping sets of (status,
    priority) including the cross-granularity ones ROLLUP cannot express
    (status-only AND priority-only). Catalyst expands the cube into ONE
    Expand (4 replicas per input row) + one aggregate exchange — one job,
    not one scan per grouping set; at 100 TB the Expand fan-out is the
    intrinsic cost of the contract and the partial aggregate collapses it
    map-side before the shuffle."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(28,4)")).cast("double"), 2
        ).alias("sum_price"),
        F.grouping_id().cast("long").alias("gid"),
    )


SQL_ORDERS_CUBE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 2)
         AS sum_price,
       CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_events_transition_matrix(spark, sf_dir):
    """Window-navigation class (lead/lag): the event-type transition matrix
    — for each user's time-ordered stream, count (event_type → next
    event_type) pairs. ONE user-keyed shuffle + per-partition sort carries
    the lead(); the pair aggregate is map-side combinable. (ts, event_id)
    is a total order per user, so the matrix is partitioning/engine
    invariant. The sequence-model shape (Markov transition counts) that
    funnel/sessionize don't cover: lead/lag navigation itself."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


SQL_EVENTS_TRANSITIONS = """
WITH s AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
)
SELECT from_type, to_type, count(*) AS n_transitions
FROM s WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


def q_vocab_coverage(spark, sf_dir):
    """Ordered cumulative-distribution class: how many distinct tokens cover
    X% of all token occurrences — the vocabulary-size question every
    tokenizer build answers. Token counts are one map-side-combinable
    groupBy; the ordered cumulative sum then runs over the VOCAB table
    (orders of magnitude smaller than the corpus — the global window is
    vocab-sized, and past ~10^8 types the two-phase distributed prefix sum
    `pack_shards` demonstrates replaces it). All-integer threshold math:
    cum*1e6 ≥ thr_ppm*total in BIGINT, so the answer can't flake on float
    rounding."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # the grand total rides the SAME vocab-sized single-partition window
    # pass as the cumulative sum (unbounded-following frame) — no second
    # corpus scan, no broadcast branch
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    ranked = cnt.select(
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("total"),
    )
    thr = F.explode(
        F.array(*[F.lit(t) for t in (500_000, 900_000, 950_000, 990_000)])
    ).alias("thr_ppm")
    return (
        ranked.select("k", "cum", "total", thr)
        .filter(F.col("cum") * 1_000_000 >= F.col("thr_ppm") * F.col("total"))
        .groupBy("thr_ppm")
        .agg(F.min("k").alias("tokens_needed"))
        .withColumn("thr_ppm", F.col("thr_ppm").cast("long"))
    )


SQL_VOCAB_COVERAGE = """
WITH cnt AS (
  SELECT t.tok, count(*) AS c
  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        FROM documents) t
  WHERE t.tok <> '' GROUP BY t.tok
),
ranked AS (
  SELECT row_number() OVER (ORDER BY c DESC, tok) AS k,
         CAST(sum(c) OVER (ORDER BY c DESC, tok
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(sum(c) OVER () AS BIGINT) AS total
  FROM cnt
),
thr AS (SELECT unnest([500000, 900000, 950000, 990000]) AS thr_ppm)
SELECT CAST(thr_ppm AS BIGINT) AS thr_ppm,
       CAST(min(k) AS BIGINT) AS tokens_needed
FROM ranked, thr
WHERE cum * 1000000 >= thr_ppm * total
GROUP BY thr_ppm
"""


def q_nation_share_of_region(spark, sf_dir):
    """Ratio-to-parent window class: each nation's share of its region's
    order revenue, ranked within region. Revenue sums aggregate in
    DECIMAL(28,4) (order-invariant), the share divides the two exact sums
    as doubles once per nation row, and the window partitions by region —
    25 nation rows after one fact-table aggregate; the dimension joins
    broadcast."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,4)")).alias("_rev")
        )
    )
    w = Window.partitionBy("r_name")
    wr = Window.partitionBy("r_name").orderBy(F.desc("_rev"), F.asc("n_name"))
    return rev.select(
        "r_name",
        "n_name",
        F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
        F.round(
            (F.col("_rev") / F.sum("_rev").over(w)).cast("double"), 6
        ).alias("share"),
        F.row_number().over(wr).cast("long").alias("rank_in_region"),
    )


SQL_NATION_SHARE = """
WITH rev AS (
  SELECT r_name, n_name,
         SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS _rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
  round(CAST(_rev AS DOUBLE), 2) AS revenue,
  round(CAST(_rev / SUM(_rev) OVER (PARTITION BY r_name) AS DOUBLE), 6)
    AS share,
  CAST(row_number() OVER (PARTITION BY r_name ORDER BY _rev DESC, n_name)
       AS BIGINT) AS rank_in_region
FROM rev
"""


_SSSP_SEEDS = ["S0", "S1"]
_SSSP_ROUNDS = 4


def q_sssp_suppliers(spark, sf_dir):
    """WEIGHTED shortest paths (fixed-round Bellman-Ford,
    operators/graph.sssp_distances) over the supplier↔customer graph with
    integer edge costs — the weighted generalization of `bfs_suppliers`:
    when KG edges carry a cost (inverse relevance, hop toll), retrieval
    seed-proximity is a shortest-path question, not a hop count
    (reference proximity: search.py:151-215). Delta-frontier relaxation:
    only nodes whose distance improved last round join the adjacency —
    frontier-sized joins, one min-groupBy + one outer merge per round,
    per-round-identical to relax-everything (distances only decrease).
    Exact BIGINT weights ⇒ the DuckDB oracle unrolls the same rounds as
    chained CTEs and hash-matches."""
    from mmkg_rag_spark.operators.graph import sssp_distances

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        (F.lit(1) + F.col("l_linenumber") % 5).cast("long").alias("w"),
    )
    return sssp_distances(e, _SSSP_SEEDS, _SSSP_ROUNDS)


def _sql_sssp(seeds=None, rounds: int = _SSSP_ROUNDS) -> str:
    """Unrolled fixed-round Bellman-Ford (mirrors graph.sssp_distances):
    round i min-combines the previous table with every edge relaxation —
    identical BIGINT distances, hash-green."""
    seeds = seeds or _SSSP_SEEDS
    seed_rows = " UNION ALL ".join(
        f"SELECT '{s}' AS node, CAST(0 AS BIGINT) AS dist" for s in seeds
    )
    ctes = [
        "e0 AS (SELECT 'S' || l_suppkey AS src, 'C' || o_custkey AS dst,\n"
        "  CAST(1 + l_linenumber % 5 AS BIGINT) AS w\n"
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "eb AS (SELECT src, dst, w FROM e0\n"
        "  UNION ALL SELECT dst AS src, src AS dst, w FROM e0)",
        "adj AS (SELECT src, dst, min(w) AS w FROM eb GROUP BY src, dst)",
        f"d0 AS ({seed_rows})",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"d{i} AS (SELECT node, min(dist) AS dist FROM (\n"
            f"  SELECT node, dist FROM d{i - 1}\n"
            f"  UNION ALL\n"
            f"  SELECT a.dst AS node, d.dist + a.w AS dist\n"
            f"  FROM adj a JOIN d{i - 1} d ON d.node = a.src) GROUP BY node)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, dist FROM d{rounds}"


def q_events_growth_accounting(spark, sf_dir):
    """User-lifecycle growth accounting — per epoch-week, how many active
    users are NEW (first week ever), RETAINED (active the week before),
    RESURRECTED (returning after a gap), and how many of last week's
    actives CHURNED (did not return). The DAU/WAU growth decomposition
    every corpus/product dashboard runs; `events_retention` gives the
    cohort triangle, this gives the flow decomposition. Shuffle shape: one
    distinct on (user, week), ONE user-keyed window sort carrying both
    lag() and lead(), then week-keyed aggregates over the tiny week table.
    TZ-proof integer epoch-weeks; all counts BIGINT."""
    from mmkg_rag_spark.functions.timeops import ntz_epoch

    e = _t(spark, sf_dir, "events")
    week = F.floor(ntz_epoch("ts") / 604800).cast("long")
    uw = e.select("user_id", week.alias("week")).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    lab = uw.select(
        "week",
        F.lag("week").over(w).alias("prev_week"),
        F.lead("week").over(w).alias("next_week"),
    )
    act = lab.groupBy("week").agg(
        F.sum(F.col("prev_week").isNull().cast("long")).alias("n_new"),
        # when/otherwise, not a bare cast: on the corpus' first week every
        # prev_week is NULL, and sum(all-NULL) is NULL where the oracle's
        # CASE yields 0
        F.sum(
            F.when(F.col("prev_week") == F.col("week") - 1, 1)
            .otherwise(0)
            .cast("long")
        ).alias("n_retained"),
        F.sum(
            (
                F.col("prev_week").isNotNull()
                & (F.col("prev_week") < F.col("week") - 1)
            ).cast("long")
        ).alias("n_resurrected"),
    )
    ch = (
        lab.filter(
            F.col("next_week").isNull()
            | (F.col("next_week") > F.col("week") + 1)
        )
        .groupBy((F.col("week") + 1).alias("week"))
        .agg(F.count(F.lit(1)).alias("_n_churned"))
    )
    return act.join(ch, "week", "left").select(
        "week",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce("_n_churned", F.lit(0)).cast("long").alias("n_churned"),
    )


SQL_EVENTS_GROWTH = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800.0) AS BIGINT) AS week
  FROM events
),
lab AS (
  SELECT week,
         lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
         lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
  FROM uw
),
act AS (
  SELECT week,
    CAST(sum(CASE WHEN prev_week IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_new,
    CAST(sum(CASE WHEN prev_week = week - 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_retained,
    CAST(sum(CASE WHEN prev_week IS NOT NULL AND prev_week < week - 1
             THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM lab GROUP BY week
),
ch AS (
  SELECT week + 1 AS week, count(*) AS n
  FROM lab
  WHERE next_week IS NULL OR next_week > week + 1
  GROUP BY week + 1
)
SELECT a.week, a.n_new, a.n_retained, a.n_resurrected,
       CAST(coalesce(ch.n, 0) AS BIGINT) AS n_churned
FROM act a LEFT JOIN ch ON a.week = ch.week
"""


def q_events_gap_fill(spark, sf_dir):
    """Time-series densification (gap fill): per event type, a dense daily
    spine from its first to last active day with zero-filled counts — the
    step every windowed model/chart needs before resampling, and the one
    aggregation shape a plain GROUP BY cannot produce (absent rows). The
    spine is generated with a narrow explode(sequence(d0, d1)) fan-out
    from the |types|-row span table — never a driver loop, never a
    calendar table scan — then LEFT-joined back to the per-day counts
    (broadcastable: |types| × |days|). TZ-proof integer epoch-days."""
    from mmkg_rag_spark.functions.timeops import ntz_epoch

    e = _t(spark, sf_dir, "events")
    day = F.floor(ntz_epoch("ts") / 86400).cast("long")
    per = e.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    span = per.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    return spine.join(per, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("_n", F.lit(0)).cast("long").alias("n_events"),
    )


SQL_EVENTS_GAP_FILL = """
WITH per AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM per GROUP BY 1),
spine AS (
  SELECT event_type, unnest(generate_series(d0, d1)) AS day FROM span
)
SELECT s.event_type, s.day, CAST(coalesce(p.n, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN per p ON s.event_type = p.event_type AND s.day = p.day
"""


def q_part_pair_affinity(spark, sf_dir):
    """Market-basket pair co-occurrence (the A-Priori pair-count pattern):
    parts ordered together in ≥ 2 distinct orders, with each part's own
    order count attached. The candidate join is keyed on the BASKET id
    (equi-join on l_orderkey with the part_a < part_b residual), so the
    pair expansion is Σ k_i·(k_i−1)/2 over basket sizes — bounded by the
    max items-per-order (≤ ~20 here; at crawl scale a basket-size cap +
    salting is the disclosed defense, the same shape as the shingle-cap
    in ngram_jaccard_pairs) — never |parts|². Per-part counts join back
    broadcast-sized. All-integer outputs."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    per_part = items.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        pairs.join(
            F.broadcast(per_part), pairs["part_a"] == F.col("_pk")
        )
        .withColumnRenamed("_n", "n_a")
        .drop("_pk")
        .join(F.broadcast(per_part), pairs["part_b"] == F.col("_pk"))
        .withColumnRenamed("_n", "n_b")
        .drop("_pk")
        .select("part_a", "part_b", "n_both", "n_a", "n_b")
    )


SQL_PART_PAIR_AFFINITY = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_both
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
per_part AS (SELECT l_partkey, count(*) AS n FROM items GROUP BY 1)
SELECT p.part_a, p.part_b, p.n_both,
       pa.n AS n_a, pb.n AS n_b
FROM pairs p
JOIN per_part pa ON p.part_a = pa.l_partkey
JOIN per_part pb ON p.part_b = pb.l_partkey
"""


# ---------------------------------------------------------------------------
# Session-3 query classes: connected components as a first-class query,
# fact-table two-phase deciles, dictionary-collapsed edit-distance join,
# equi-width histogram, vector-column dimension stats.
# ---------------------------------------------------------------------------

COMPONENT_MIN_COOCCUR = 2


def q_part_components(spark, sf_dir):
    """Connected components as a REGISTERED query class
    (functions/components.connected_components) — the primitive behind the
    reference's entity-merge closure (deduplicate.py greedy grouping →
    order-independent CC, see operators/dedup.py) and near_dup_survivors,
    here attested directly: weakly-connected components of the part
    co-order graph thresholded to pairs co-ordered ≥2 times (the same
    support cut as part_pair_affinity — keeps the graph similarity-graph
    sparse, ~3.5k edges at sf0.01 AND sf0.1, like a real ER candidate
    graph vs the near-complete unthresholded one). Components here are
    "substitutable part families". The operator is adaptive
    (driver union-find under the edge threshold, iterative min-label
    propagation above — the 10^12-row path); labels = min vertex id are
    partitioning-invariant integers, so the DuckDB recursive-CTE closure
    oracle hash-matches. Output is per-component (label, size, max node,
    node-id checksum) — |components| rows, never the closure."""
    from mmkg_rag_spark.functions.components import connected_components

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    right = items.select("l_orderkey", F.col("l_partkey").alias("p2"))
    e = (
        items.join(right, "l_orderkey")
        .where(F.col("l_partkey") < F.col("p2"))
        .groupBy(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= COMPONENT_MIN_COOCCUR)
        .select("src", "dst")
    )
    comp = connected_components(e)
    return comp.groupBy(F.col("component").cast("long").alias("component")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("id").cast("long").alias("max_node"),
        F.sum("id").cast("long").alias("sum_nodes"),
    )


SQL_PART_COMPONENTS = """
WITH RECURSIVE pr AS (
  SELECT l1.l_partkey AS a, l2.l_partkey AS b
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l1
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
adj AS (SELECT a AS src, b AS dst FROM pr UNION SELECT b, a FROM pr),
reach(node, lbl) AS (
  SELECT src, src FROM adj
  UNION
  SELECT adj.dst, r.lbl FROM reach r JOIN adj ON adj.src = r.node
),
comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
SELECT component, COUNT(*) AS n_nodes,
       MAX(node) AS max_node,
       CAST(SUM(node) AS BIGINT) AS sum_nodes
FROM comp GROUP BY component
"""


def q_lineitem_price_deciles(spark, sf_dir):
    """Fact-table-shaped exact deciles (functions/ranks.global_ntile): the
    100 TB twin of customer_balance_deciles. `ntile(10) OVER (ORDER BY …)`
    plans an Exchange SinglePartition — the whole fact table sorts in ONE
    task — so this class computes the identical buckets two-phase: one
    PARALLEL repartitionByRange + in-partition sort, a |partitions|-row
    offset prefix-sum, Arrow-batched in-partition enumeration, broadcast
    offset join. (l_orderkey, l_linenumber) completes the total order so
    tie placement is engine-invariant; bucket/pct_rank derive from the
    exact global rank with the standard SQL definitions, so the plain
    window-function oracle hash-matches bit-for-bit."""
    from mmkg_rag_spark.functions.ranks import global_ntile

    li = _t(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    b = global_ntile(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"], 10
    )
    return b.groupBy(F.col("bucket").alias("decile")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("price_min"),
        F.round(F.max("l_extendedprice"), 2).alias("price_max"),
        F.round(F.max("pct_rank"), 6).alias("pr_max"),
    )


SQL_LINEITEM_DECILES = """
WITH ranked AS (
  SELECT l_extendedprice,
    CAST(ntile(10) OVER w AS BIGINT) AS decile,
    percent_rank() OVER w AS pr
  FROM lineitem
  WINDOW w AS (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
)
SELECT decile, COUNT(*) AS n,
  round(MIN(l_extendedprice), 2) AS price_min,
  round(MAX(l_extendedprice), 2) AS price_max,
  round(MAX(pr), 6) AS pr_max
FROM ranked GROUP BY decile
"""


EDITDIST_MAX = 2


def q_part_name_matches(spark, sf_dir):
    """Edit-distance similarity self-join — the ER blocking shape the KG
    canonicalizer uses (alias matching, dedup.py D1), on exact levenshtein
    instead of token-sort ratio. Scale design: collapse to the DISTINCT
    name dictionary first (string-similarity joins at corpus scale are
    dictionary-sized, never row-sized — the 20k-part table holds ~240
    distinct names), block candidate pairs on the head noun (last token —
    the classic ER blocking key; recall vs all-pairs is a blocking choice,
    identical on both sides by construction), then JVM-side
    `levenshtein()` ≤ 2 and attach per-name row counts. Everything after
    the two tiny groupBys is broadcast-sized."""
    p = _t(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("blk", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("n").alias("n_a"), "blk"
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("n").alias("n_b"), "blk"
    )
    return (
        a.join(F.broadcast(b), "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("dist") <= EDITDIST_MAX)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )


SQL_PART_NAME_MATCHES = """
WITH names AS (
  SELECT p_name, COUNT(*) AS n,
         string_split(p_name, ' ')[-1] AS blk
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       a.n AS n_a, b.n AS n_b
FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


HIST_BUCKET_WIDTH = 25_000
HIST_MAX_BUCKET = 19


def q_orders_price_histogram(spark, sf_dir):
    """Equi-width histogram class: order totals binned into 20 fixed
    25k-wide buckets (top bucket clamps the tail so the bucket id is
    total-range-proof). Bucketing is a map-only integer expression →
    ONE map-side-combinable groupBy; the shuffle moves ≤20 partial rows
    per map task regardless of fact-table size. Sums go through
    DECIMAL(28,4) so the per-bucket totals are addition-order-exact and
    the oracle hash-matches (the double-sum trap documented at
    orders_cube)."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / HIST_BUCKET_WIDTH),
        F.lit(HIST_MAX_BUCKET),
    ).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("price_min"),
            F.round(F.max("o_totalprice"), 2).alias("price_max"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,4)")).cast(
                    "double"
                ),
                2,
            ).alias("sum_price"),
        )
    )


SQL_ORDERS_HISTOGRAM = f"""
SELECT LEAST(CAST(floor(o_totalprice / {HIST_BUCKET_WIDTH}) AS BIGINT),
             {HIST_MAX_BUCKET}) AS bucket,
       COUNT(*) AS n_orders,
       round(MIN(o_totalprice), 2) AS price_min,
       round(MAX(o_totalprice), 2) AS price_max,
       round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 2)
         AS sum_price
FROM orders GROUP BY 1
"""


def q_embedding_dim_stats(spark, sf_dir):
    """Vector-column analytics: per-dimension stats of the embedding
    array via posexplode — the diagnostic pass an ANN index build runs
    (dead/low-variance dimension detection, quantizer range calibration).
    The explode is a NARROW fan-out (|rows|·64, no shuffle) feeding one
    map-side-combinable groupBy on 64 keys. Float sums are
    addition-order-dependent, so values are quantized first —
    floor(CAST(val AS DOUBLE) · 1e6) — making every aggregate exact
    integer arithmetic that hash-matches DuckDB's
    generate_subscripts/unnest twin; the mean divides the exact sum once
    at the end."""
    e = _t(spark, sf_dir, "embeddings")
    d = e.select(F.posexplode("embedding").alias("dim0", "val"))
    q = d.select(
        (F.col("dim0") + 1).cast("long").alias("dim"),
        F.floor(F.col("val").cast("double") * 1_000_000)
        .cast("long")
        .alias("q"),
    )
    return q.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sum_q"),
        F.min("q").alias("min_q"),
        F.max("q").alias("max_q"),
        F.round(F.sum("q") / F.count(F.lit(1)) / 1e6, 6).alias("mean"),
    )


SQL_EMBEDDING_DIM_STATS = """
WITH flat AS (
  SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS q
  FROM embeddings
)
SELECT dim, COUNT(*) AS n,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       MIN(q) AS min_q, MAX(q) AS max_q,
       round(CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mean
FROM flat GROUP BY dim
"""


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-15"


def q_orders_shipping_priority(spark, sf_dir):
    """TPC-H Q3-shaped star join: the unshipped-revenue top-10 — customer
    (filtered on segment) ⋈ orders (ordered before D) ⋈ lineitem (shipped
    after D), revenue per order, top 10. The multi-way-join planning
    class: both dimension filters cut BEFORE the join (pushed to the scan),
    the filtered customer side is broadcast (no fact-side shuffle for it),
    and the top-10 plans as TakeOrderedAndProject — never a global sort.
    Revenue sums through DECIMAL so the value hash is addition-order-exact;
    (revenue DESC, o_orderdate, l_orderkey) is a total order so the cutoff
    is engine-invariant."""
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit(Q3_DATE))
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit(Q3_DATE))
    )
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.join(
            F.broadcast(o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("_rev"))
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2)
    AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Session-4 query classes: CDC/SCD2 compaction, sweep-line concurrency,
# explicit salted skew join, deterministic per-group sampling, containment
# near-dup, degree assortativity.
# ---------------------------------------------------------------------------


def q_events_latest_per_key(spark, sf_dir):
    """CDC latest-snapshot compaction (operators/cdc.latest_snapshot): one
    surviving row per user — the newest event by (ts, event_id). The
    first stage of every incremental build over a recrawled page store
    (latest (url, warc_ts) version wins). Implemented as a map-side-
    combinable max(struct(order…, payload)) aggregate, NOT a window:
    partial aggregation collapses versions before the shuffle, a ~10×
    shuffle saving at 10 versions/key. Oracle: row_number()=1 window."""
    from mmkg_rag_spark.operators.cdc import latest_snapshot

    e = _t(spark, sf_dir, "events")
    out = latest_snapshot(
        e.select("user_id", "ts", "event_id", "event_type", "value"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        payload_cols=["event_type", "value"],
    )
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        "event_type",
        F.round("value", 4).alias("value"),
    )


SQL_EVENTS_LATEST = """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_type, round(value, 4) AS value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn FROM events
) WHERE rn = 1
"""


def q_events_scd2(spark, sf_dir):
    """Slowly-changing-dimension type-2 intervals (operators/cdc.
    scd2_intervals): every purchase event becomes a [valid_from, valid_to)
    validity row via lead() per user — the point-in-time-joinable history
    shape (pairs with temporal.asof_join). One hash shuffle on the
    (high-cardinality, skew-free) key + per-key sort; exact timestamps so
    the DuckDB lead() twin hash-matches."""
    from mmkg_rag_spark.operators.cdc import scd2_intervals

    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    out = scd2_intervals(
        e.select("user_id", "ts", "event_id", F.round("value", 4).alias("value")),
        key_cols=["user_id"],
        ts_col="ts",
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "event_id",
        "value",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.col("is_current").cast("boolean").alias("is_current"),
    )


SQL_EVENTS_SCD2 = """
WITH p AS (
  SELECT user_id, ts, event_id, round(value, 4) AS value
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id, value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_events_peak_concurrency(spark, sf_dir):
    """Per-day peak concurrent sessions (operators/temporal.
    peak_concurrency): sweep-line over [ts, ts+10min) click intervals,
    clipped to calendar days so the running sum windows PARTITIONED BY
    day — embarrassingly parallel across the time axis, never the
    single-partition global sort a naive sweep plans. Integer deltas
    pre-aggregated per distinct timestamp make the per-day max
    tie-order-proof and bit-identical across engines."""
    from mmkg_rag_spark.operators.temporal import peak_concurrency

    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    iv = e.select(
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end_ts"),
    )
    out = peak_concurrency(iv, "start_ts", "end_ts")
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "peak_concurrent",
        "n_boundaries",
    )


SQL_EVENTS_PEAK_CONCURRENCY = """
WITH iv AS (
  SELECT ts AS s, ts + INTERVAL 10 MINUTE AS e
  FROM events WHERE event_type = 'click'
),
d AS (
  SELECT s, e, unnest(generate_series(
    date_trunc('day', s),
    CASE WHEN date_trunc('day', e) = e
         THEN e - INTERVAL 1 DAY ELSE date_trunc('day', e) END,
    INTERVAL 1 DAY)) AS day
  FROM iv WHERE e > s
),
clipped AS (
  SELECT day, greatest(s, day) AS cs, least(e, day + INTERVAL 1 DAY) AS ce
  FROM d
),
deltas AS (
  SELECT day, cs AS ts, 1 AS delta FROM clipped
  UNION ALL
  SELECT day, ce AS ts, -1 AS delta FROM clipped
  WHERE ce < day + INTERVAL 1 DAY
),
per_ts AS (SELECT day, ts, SUM(delta) AS dd FROM deltas GROUP BY day, ts),
curve AS (
  SELECT day, SUM(dd) OVER (PARTITION BY day ORDER BY ts) AS open
  FROM per_ts
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(MAX(open) AS BIGINT) AS peak_concurrent,
       CAST(COUNT(*) AS BIGINT) AS n_boundaries
FROM curve GROUP BY day
"""


def q_skew_salted_join(spark, sf_dir):
    """Explicit salted skew join (functions/skew.salted_join — the
    north-rule's head-entity remedy): the fact side's hot keys are spread
    across 8 shuffle partitions by a deterministic xxhash64 salt, the dim
    side replicates 8×, and the join runs on (key, salt). shuffle_hash
    hint keeps it a shuffled join (a broadcast would hide the skew path at
    this test scale; at 100 TB the dim side is too big to broadcast and
    this IS the plan). The salt is internal plumbing — the result, and the
    oracle, are the plain join + group-by. Revenue sums in DECIMAL so the
    hash can't drift with partitioning."""
    from mmkg_rag_spark.functions.skew import salted_join

    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(
        e, c.hint("shuffle_hash"), on=["user_id"],
        salts=8, big_salt_col="event_id",
    )
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 4
        ).alias("sum_value"),
    )


SQL_SKEW_SALTED_JOIN = """
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 4)
         AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def q_doc_per_source_sample(spark, sf_dir):
    """Deterministic k-per-group sampling (operators/curation.
    sample_per_group): 5 documents per source ranked by md5(doc_id) — a
    uniform, engine-portable pseudo-random order, so the sample is
    partition-layout-invariant and rerun-stable (the property TABLESAMPLE/
    rand() can never give, and the one that makes eval-set draws
    auditable). Spark's WindowGroupLimit pushdown keeps only k rows per
    group on the map side before the shuffle."""
    from mmkg_rag_spark.operators.curation import sample_per_group

    d = _t(spark, sf_dir, "documents")
    return sample_per_group(d, "source", 5, "doc_id").select(
        "source", "doc_id", "rk"
    )


SQL_DOC_PER_SOURCE_SAMPLE = """
SELECT source, doc_id, rk FROM (
  SELECT source, doc_id, row_number() OVER (
    PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
  ) AS rk FROM documents
) WHERE rk <= 5
"""


def q_doc_containment_pairs(spark, sf_dir):
    """Asymmetric near-dup by n-gram CONTAINMENT (operators/textdedup.
    containment_pairs): |A∩B|/|A| catches a document EMBEDDED in a longer
    one — the quote-farm/boilerplate-wrap case Jaccard misses because the
    union is dominated by the longer side (Broder's resemblance vs
    containment). Same shared-shingle equi-join + frequency-cap plan as
    the Jaccard class; only the final integer arithmetic differs."""
    return textdedup.containment_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.6
    )


SQL_DOC_CONTAINMENT = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
),
sh0 AS (
  SELECT doc_id AS id, unnest(list_distinct(
    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)]
  )) AS shingle FROM w
),
capped AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 1000),
sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN capped USING (shingle)),
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.id < b.id GROUP BY 1, 2
)
SELECT id_a, id_b,
  round(CAST(i AS DOUBLE) / sa.n, 4) AS cont_a,
  round(CAST(i AS DOUBLE) / sb.n, 4) AS cont_b,
  round(greatest(CAST(i AS DOUBLE) / sa.n, CAST(i AS DOUBLE) / sb.n), 4)
    AS containment
FROM inter
JOIN sizes sa ON id_a = sa.id
JOIN sizes sb ON id_b = sb.id
WHERE greatest(CAST(i AS DOUBLE) / sa.n, CAST(i AS DOUBLE) / sb.n) >= 0.6
"""


def q_graph_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002) of the supplier↔customer trading
    graph (operators/graph.degree_assortativity): Pearson correlation of
    endpoint degrees over the doubled edge list — THE one-number summary
    of whether hub entities cluster (drives the salting plan for the
    link-scoring self-join). Every moment accumulates in DECIMAL(38,0) —
    no float summation — so the single final division is bit-stable
    across partitionings and engines."""
    from mmkg_rag_spark.operators.graph import degree_assortativity

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
    )
    return degree_assortativity(e)


SQL_GRAPH_ASSORTATIVITY = """
WITH e0 AS (
  SELECT DISTINCT
    least('S' || CAST(l_suppkey AS VARCHAR), 'C' || CAST(o_custkey AS VARCHAR)) AS u,
    greatest('S' || CAST(l_suppkey AS VARCHAR), 'C' || CAST(o_custkey AS VARCHAR)) AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE 'S' || CAST(l_suppkey AS VARCHAR) <> 'C' || CAST(o_custkey AS VARCHAR)
),
both_dir AS (
  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
),
deg AS (SELECT u, COUNT(*) AS d FROM both_dir GROUP BY u),
xy AS (
  SELECT CAST(da.d AS HUGEINT) AS dx, CAST(db.d AS HUGEINT) AS dy
  FROM both_dir b JOIN deg da ON b.u = da.u JOIN deg db ON b.v = db.u
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(dx) AS sx,
         SUM(dx * dx) AS sxx, SUM(dx * dy) AS sxy
  FROM xy
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       CAST(n / 2 AS BIGINT) AS n_edges,
       round(CAST(n * sxy - sx * sx AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS assortativity
FROM m
"""


# ---------------------------------------------------------------------------
# Session-4b query classes: rolling distinct actives, last-touch attribution,
# data-quality column profile, robust (median/MAD) outlier stats.
# ---------------------------------------------------------------------------


def q_events_rolling_distinct(spark, sf_dir):
    """Trailing-7-day distinct active users per day (operators/temporal.
    rolling_distinct — rolling WAU). COUNT(DISTINCT) is non-algebraic over
    a sliding window, so the operator dedupes to (user, active_day), then
    explodes each active day into the ≤7 report days it feeds: fan-out
    bounded at 7×|user-days|, three hash shuffles total, no unbounded
    window state, no day×table self-join. Report days after the data's
    max day are dropped (trailing window not yet complete)."""
    from mmkg_rag_spark.operators.temporal import rolling_distinct

    e = _t(spark, sf_dir, "events")
    out = rolling_distinct(e, key_col="user_id", ts_col="ts", window_days=7)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_active"
    )


SQL_EVENTS_ROLLING_DISTINCT = """
WITH active AS (
  SELECT DISTINCT user_id AS k, date_trunc('day', ts) AS d FROM events
),
mx AS (SELECT max(d) AS max_d FROM active),
contrib AS (
  SELECT k, unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))
    AS day
  FROM active
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT k) AS BIGINT) AS n_active
FROM contrib, mx WHERE day <= mx.max_d
GROUP BY 1
"""


def q_events_last_touch(spark, sf_dir):
    """Last-touch attribution (operators/temporal.last_touch): every
    purchase credited to the user's most recent PRECEDING non-purchase
    event — the marketing-attribution / provenance primitive. One hash
    shuffle on user_id + per-user sort; the credit is an ignorenulls-last
    running carry over rows [unbounded, -1] (the asof_join trick), never a
    per-conversion self-join. (ts, event_id) gives a total order so the
    result is engine-exact; direct conversions keep NULL touch."""
    from mmkg_rag_spark.operators.temporal import last_touch

    e = _t(spark, sf_dir, "events")
    out = last_touch(
        e.select("user_id", "ts", "event_id", "event_type"),
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        F.date_format("conv_ts", "yyyy-MM-dd HH:mm:ss").alias("conv_ts"),
        "touch_type",
        F.date_format("touch_ts", "yyyy-MM-dd HH:mm:ss").alias("touch_ts"),
    )


SQL_EVENTS_LAST_TOUCH = """
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS conv_ts,
       touch_type,
       strftime(touch_ts, '%Y-%m-%d %H:%M:%S') AS touch_ts
FROM (
  SELECT user_id, ts, event_type,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER w AS touch_type,
    last_value(CASE WHEN event_type <> 'purchase' THEN ts END
               IGNORE NULLS) OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
WHERE event_type = 'purchase'
"""


def q_doc_profile(spark, sf_dir):
    """Data-quality column profile of the documents table (operators/
    profile.profile_columns — the Deequ-style pre-extraction gate): per
    column, rows / nulls / exact distincts / min-max witnesses, ONE table
    scan (all distinct-counts share a single Expand + two-phase hash agg),
    emitted long-format via stack so constraint checks are plain filters.
    min/max order by native type, render as ≤40-char strings."""
    from mmkg_rag_spark.operators.profile import profile_columns

    d = _t(spark, sf_dir, "documents")
    return profile_columns(
        d, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _sql_profile_col(col: str) -> str:
    return f"""
SELECT '{col}' AS "column",
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows,
       CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
       substr(CAST(min({col}) AS VARCHAR), 1, 40) AS min_val,
       substr(CAST(max({col}) AS VARCHAR), 1, 40) AS max_val
FROM documents"""


SQL_DOC_PROFILE = "\nUNION ALL\n".join(
    _sql_profile_col(c) for c in ["doc_id", "text", "lang", "source", "n_chars"]
)


def q_events_value_outliers(spark, sf_dir):
    """Per-event-type robust outlier stats (functions/robust.
    robust_outlier_stats): median/MAD/Hampel-fence counts — the
    heavy-tail-proof anomaly gate (mean±kσ is dragged by the very tail it
    should flag). Exact interpolated medians via Spark's percentile
    aggregate ≡ DuckDB quantile_cont; group stats re-attach broadcast;
    two grouped aggs + two broadcast joins, no raw-fact window sort.
    Zero-MAD groups fall back to counting values ≠ median."""
    from mmkg_rag_spark.functions.robust import robust_outlier_stats

    e = _t(spark, sf_dir, "events")
    return robust_outlier_stats(e, "event_type", "value", z=3.0)


SQL_EVENTS_VALUE_OUTLIERS = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS median,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, abs(e.value - m.median) AS absdev, m.median, m.n
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(absdev, 0.5) AS mad FROM dev GROUP BY 1
)
SELECT d.event_type, max(d.n) AS n,
       round(max(d.median), 6) AS median,
       round(max(m.mad), 6) AS mad,
       CAST(SUM(CASE WHEN m.mad > 0
                     THEN CASE WHEN d.absdev > 3 * 1.4826 * m.mad
                               THEN 1 ELSE 0 END
                     ELSE CASE WHEN d.absdev > 0 THEN 1 ELSE 0 END
                END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


def q_orders_monthly_yoy(spark, sf_dir):
    """Year-over-year growth report: monthly DECIMAL-exact revenue joined
    to the same month one year earlier. The period join is an explicit
    equi-join on add_months(month, -12) — correct under gap months, where
    a lag(12) window silently compares wrong periods — and it runs
    broadcast on the months-sized aggregate, so the only corpus-wide work
    is the one map-side-combinable groupBy. Growth is computed in DOUBLE
    from the exact DECIMAL sums (one division per output row — no float
    accumulation), try_divide-guarded for a zero prior month."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,4)")).alias("rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    prev = monthly.select(
        F.add_months(F.col("month"), 12).cast("timestamp").alias("month"),
        F.col("rev").alias("rev_prev"),
    )
    return (
        monthly.join(F.broadcast(prev), "month", "left")
        .select(
            F.date_format("month", "yyyy-MM").alias("month"),
            F.col("rev").cast("double").alias("revenue"),
            "n_orders",
            F.col("rev_prev").cast("double").alias("revenue_prev_year"),
            F.round(
                F.try_divide(
                    (F.col("rev") - F.col("rev_prev")).cast("double"),
                    F.col("rev_prev").cast("double"),
                )
                * 100,
                4,
            ).alias("yoy_pct"),
        )
    )


SQL_ORDERS_MONTHLY_YOY = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS rev,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT strftime(m.month, '%Y-%m') AS month,
       CAST(m.rev AS DOUBLE) AS revenue,
       m.n_orders,
       CAST(p.rev AS DOUBLE) AS revenue_prev_year,
       round(CAST(m.rev - p.rev AS DOUBLE) / CAST(p.rev AS DOUBLE) * 100, 4)
         AS yoy_pct
FROM monthly m
LEFT JOIN monthly p ON p.month + INTERVAL 12 MONTH = m.month
"""


def q_events_daily_anomalies(spark, sf_dir):
    """Trailing-window anomaly detection on the per-type daily event
    counts: each (type, day) scored against the mean/std of its 7
    PRECEDING days, computed in closed form from exact BIGINT Σn and Σn²
    over the frame — so both engines do the identical double arithmetic
    from identical integers (never engine-internal Welford streams). The
    window runs over the tiny per-(type,day) aggregate, partitioned by
    type — the raw facts see only one map-side-combinable groupBy. Days
    without a full 7-day history are excluded (their fence is undefined);
    z is try_divide-guarded for zero-variance windows."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    scored = (
        daily.withColumn("n_prev", F.count(F.lit(1)).over(w))
        .withColumn("s1", F.sum("n").over(w))
        .withColumn("s2", F.sum(F.col("n") * F.col("n")).over(w))
        .filter(F.col("n_prev") == 7)
    )
    mean = F.col("s1").cast("double") / 7
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / 7
    ) / 6
    std = F.sqrt(var)
    z = F.try_divide(F.col("n").cast("double") - mean, std)
    return scored.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.round(mean, 6).alias("trailing_mean"),
        F.round(std, 6).alias("trailing_std"),
        F.round(z, 6).alias("z"),
        (F.coalesce(F.abs(z), F.lit(0.0)) > 3.0).alias("is_anomaly"),
    )


SQL_EVENTS_DAILY_ANOMALIES = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, day, n,
         count(*) OVER w AS n_prev,
         CAST(SUM(n) OVER w AS BIGINT) AS s1,
         CAST(SUM(n * n) OVER w AS BIGINT) AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
       round(CAST(s1 AS DOUBLE) / 7, 6) AS trailing_mean,
       round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / 7) / 6), 6)
         AS trailing_std,
       round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7)
             / NULLIF(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / 7)
                           / 6), 0), 6) AS z,
       coalesce(abs((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7)
             / NULLIF(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / 7)
                           / 6), 0)), 0) > 3.0 AS is_anomaly
FROM scored WHERE n_prev = 7
"""


def q_source_term_lift(spark, sf_dir):
    """Per-source distinctive vocabulary (operators/relevance.term_lift):
    top-5 terms by smoothed log-odds lift — the Fightin'-Words contrast of
    each crawl source against the REST of the corpus (what raw TF-IDF
    can't ask). All-integer counts until two final ln() per surviving
    row; term-keyed joins (vocab-scale, no broadcast of the vocabulary),
    group totals broadcast, WindowGroupLimit top-k."""
    from mmkg_rag_spark.operators.relevance import term_lift

    d = _t(spark, sf_dir, "documents")
    return term_lift(d, group_col="source", text_col="text", k=5)


SQL_SOURCE_TERM_LIFT = r"""
WITH toks AS (
  SELECT source AS g, unnest(string_split(text, ' ')) AS term
  FROM documents
),
per_group AS (
  SELECT g, term, CAST(count(*) AS BIGINT) AS c_tg
  FROM toks WHERE term <> '' GROUP BY 1, 2
),
per_term AS (SELECT term, CAST(SUM(c_tg) AS BIGINT) AS c_t FROM per_group GROUP BY 1),
group_tot AS (SELECT g, CAST(SUM(c_tg) AS BIGINT) AS n_g FROM per_group GROUP BY 1),
total AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n FROM group_tot),
scored AS (
  SELECT pg.g, pg.term, pg.c_tg, pt.c_t,
         ln(CAST(pg.c_tg + 1 AS DOUBLE) / CAST(gt.n_g - pg.c_tg + 1 AS DOUBLE))
         - ln(CAST(pt.c_t - pg.c_tg + 1 AS DOUBLE)
              / CAST(t.n - gt.n_g - (pt.c_t - pg.c_tg) + 1 AS DOUBLE)) AS lift
  FROM per_group pg
  JOIN per_term pt USING (term)
  JOIN group_tot gt USING (g)
  CROSS JOIN total t
)
SELECT g AS source, term, c_tg, c_t, round(lift, 6) AS lift, rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY g ORDER BY lift DESC, term) AS rk
  FROM scored
) WHERE rk <= 5
"""


def q_small_order_revenue(spark, sf_dir):
    """TPC-H Q17-shaped correlated scalar subquery, decorrelated: per-brand
    revenue of lineitems whose quantity is below 20% of that PART's average
    quantity. The naive form runs one subquery per outer row; the scale
    form is aggregate-then-join — one per-part aggregate (map-side
    combinable, partkey-uniform) shuffled back onto the fact table by
    partkey, with the part dimension broadcast for the brand column.
    The threshold compare is EXACT: qty < avg(qty)/5 is evaluated as
    5·qty·cnt < Σqty in DECIMAL (quantities are 2dp-exact), so no float
    avg ever decides a row's membership — borderline rows can't flip
    between engines or partitionings. Revenue sums in DECIMAL; the single
    final /7 division is the only double op per output row."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(per_part, "l_partkey")
        .join(F.broadcast(p.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .filter(qty * 5 * F.col("cnt") < F.col("sum_qty"))
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(28,4)"))
                .cast("double") / 7,
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


SQL_SMALL_ORDER_REVENUE = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
)
SELECT p_brand,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / 7,
             2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small_lines
FROM lineitem l
JOIN per_part pp USING (l_partkey)
JOIN part ON p_partkey = l.l_partkey
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
GROUP BY 1
"""


def q_late_shipper_blame(spark, sf_dir):
    """TPC-H Q21-shaped blame query re-expressed without dates the schema
    lacks: suppliers who were the STRICTLY LATEST shipper on an order that
    involved at least one other supplier (EXISTS another supplier on the
    order; NOT EXISTS another supplier shipping at-or-after me). The
    classic plan stacks a semi- and an anti-self-join; here both
    existentials collapse into ONE window pass over the per-(order,
    supplier) max-shipdate aggregate — supplier count, order max, and
    at-max count are three aggregates over the same l_orderkey partition,
    so the fact table is shuffled exactly once (groupBy) and the window
    runs over the much smaller (order, supplier) table partitioned the
    same way. The oracle deliberately keeps the EXISTS/NOT-EXISTS
    formulation so the two independent shapes must agree. Integer counts,
    total (numwait DESC, s_name) order, top 10."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    ls = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("smax")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        ls.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("omax", F.max("smax").over(w))
        .withColumn(
            "n_at_max",
            F.sum(F.when(F.col("smax") == F.col("omax"), 1).otherwise(0)).over(w),
        )
        .filter(
            (F.col("n_supp") >= 2)
            & (F.col("smax") == F.col("omax"))
            & (F.col("n_at_max") == 1)
        )
    )
    return (
        flagged.join(
            F.broadcast(s.select("s_suppkey", "s_name")),
            flagged["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


SQL_LATE_SHIPPER_BLAME = """
WITH ls AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax
  FROM lineitem GROUP BY 1, 2
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM ls l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (
        SELECT 1 FROM ls l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM ls l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.smax >= l1.smax)
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 10
"""


def q_supplier_link_prediction(spark, sf_dir):
    """Link prediction on the supplier–customer bipartite graph
    (operators/graph.common_neighbor_pairs): top-20 supplier pairs by
    shared customers, with neighborhood Jaccard. Candidates come from
    wedge enumeration THROUGH each shared customer (u < v), never an
    all-pairs product; customers with more than 32 supplier relationships
    are excluded from candidate generation (hub blocking — declared
    semantics mirrored in the oracle, wedge volume ≤ Σ min(deg,32)²).
    Jaccard denominators still count ALL relationships. Exact integer
    counts; one integer division per surviving pair."""
    from mmkg_rag_spark.operators.graph import common_neighbor_pairs

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    edges = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst")
    )
    return common_neighbor_pairs(edges, max_wedge_degree=32, k=20)


SQL_SUPPLIER_LINK_PREDICTION = """
WITH e AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey AS t
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
deg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
tdeg AS (SELECT t, count(*) AS td FROM e GROUP BY 1),
small AS (SELECT e.s, e.t FROM e JOIN tdeg USING (t) WHERE td <= 32),
pairs AS (
  SELECT a.s AS u, b.s AS v, CAST(count(*) AS BIGINT) AS common
  FROM small a JOIN small b ON a.t = b.t AND a.s < b.s
  GROUP BY 1, 2
)
SELECT u, v, common, du.deg AS deg_u, dv.deg AS deg_v,
       round(CAST(common AS DOUBLE)
             / CAST(du.deg + dv.deg - common AS DOUBLE), 6) AS jaccard
FROM pairs
JOIN deg du ON du.s = u
JOIN deg dv ON dv.s = v
ORDER BY common DESC, jaccard DESC, u, v
LIMIT 20
"""


def q_events_interval_islands(spark, sf_dir):
    """Gaps-and-islands over per-user activity intervals
    (operators/temporal.interval_islands): each event opens a 5-minute
    window [epoch, epoch+300]; overlapping-or-touching windows merge into
    islands via the running-max sweep (one user-keyed shuffle, windows +
    groupBy all on the same partitioning — no quadratic overlap
    self-join). Coverage is Σ per-island span, NOT Σ interval lengths
    (overlaps would double-count). TZ-proof integer epochs end-to-end;
    every output column is exact BIGINT."""
    from mmkg_rag_spark.functions.timeops import ntz_epoch
    from mmkg_rag_spark.operators.temporal import interval_islands

    e = _t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        ntz_epoch("ts").alias("start_s"),
        (ntz_epoch("ts") + 300).alias("end_s"),
    )
    return interval_islands(iv, "user_id", "start_s", "end_s")


SQL_EVENTS_INTERVAL_ISLANDS = """
WITH iv AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS nw
  FROM iv
),
numbered AS (
  SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
per_island AS (
  SELECT user_id, island, min(s) AS i_s, max(e) AS i_e, count(*) AS n
  FROM numbered GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(SUM(i_e - i_s) AS BIGINT) AS covered_s,
       CAST(MAX(i_e - i_s) AS BIGINT) AS longest_island_s,
       CAST(SUM(n) AS BIGINT) AS n_intervals
FROM per_island GROUP BY 1
"""


def q_weighted_sample_topk(spark, sf_dir):
    """Sequential Poisson sampling (curation.sample_weighted_topk):
    10 docs per source with inclusion probability ~∝ n_chars — priority
    ξ = uniform_ppm·10⁹ // weight in FIXED-POINT integers, k smallest per
    stratum win. Map-only priority projection + one per-stratum top-k
    window (WindowGroupLimit); the md5 draw makes the sample a pure
    function of (doc_id, seed) — identical on any cluster size, stable
    under corpus growth, resumable."""
    d = _t(spark, sf_dir, "documents")
    return curation.sample_weighted_topk(
        d, k=10, weight_col="n_chars", strata_col="source", id_col="doc_id"
    )


SQL_WEIGHTED_SAMPLE_TOPK = f"""
WITH pri AS (
  SELECT source AS stratum, doc_id AS id,
         CAST(n_chars AS BIGINT) AS weight,
         ({SQL_DRAW_PPM} * 1000000000) // CAST(n_chars AS BIGINT) AS priority
  FROM documents WHERE n_chars >= 1
)
SELECT stratum, id, weight, CAST(priority AS BIGINT) AS priority, rk
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY stratum
              ORDER BY priority, id) AS INTEGER) AS rk
  FROM pri
) WHERE rk <= 10
"""


# ---- portable HLL twin (oracle-checkable mergeable distinct sketch) ----
# 256 registers (p=8); alpha_m * m^2 precomputed once and embedded as the
# SAME literal in both engines so no constant arithmetic can diverge.
_HLL_M = 256
_HLL_AM2 = 47072.71267120224  # 0.7213/(1+1.079/256) * 256^2


def _hll_rho_case(v: str) -> str:
    """SQL CASE computing rho = position of the highest set bit of a 32-bit
    value counted from the MSB (1-based), 33 for v = 0 — pure integer
    comparisons, portable to any engine."""
    arms = " ".join(
        f"WHEN {v} >= {1 << (31 - i)} THEN {i + 1}" for i in range(32)
    )
    return f"CASE {arms} ELSE 33 END"


def _hll_estimate_sql(z: str, zeros: str) -> str:
    """Closed-form HLL estimate from exact-double Z and integer zero-register
    count: raw = alpha·m²/Z with the standard small-range linear-counting
    correction. Z is a sum of powers of two (≤ 41 significand bits), so it is
    EXACT and order-independent; ln() only enters the small-range branch."""
    raw = f"({_HLL_AM2} / {z})"
    return (
        f"CASE WHEN {raw} <= {2.5 * _HLL_M} AND {zeros} > 0 "
        f"THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / {zeros}) "
        f"ELSE {raw} END"
    )


def q_events_distinct_hll_md5(spark, sf_dir):
    """Oracle-checkable twin of the native DataSketches query
    (events_distinct_sketch): an EXPLICIT HyperLogLog over md5-derived
    hashes — bucket = first 8 hash bits, rho = 1 + leading zeros of the
    next 32 — so DuckDB computes bit-identical registers and the identical
    closed-form estimate. Demonstrates the mergeable-sketch property the
    rows-only native query can't prove to the driver: the whole-range
    estimate is computed by MERGING the per-day registers (max per
    bucket), never by re-scanning raw ids.

    Scale shape: one groupBy to (day, bucket) registers — ≤ 256 rows per
    day regardless of corpus size — then day-level rollups over the tiny
    register table. Z = Σ2^(−rho) sums powers of two (≤ 41 significand
    bits → exact, order-independent double); the single division and the
    small-range ln are the only inexact ops, rounded to 4dp (the green
    source_term_lift precedent). Native hll_sketch_agg remains the
    production path (benched); this twin is the correctness surface."""
    e = _t(spark, sf_dir, "events")
    hexh = F.md5(F.concat_ws("|", F.col("user_id").cast("string"), F.lit("hll")))
    hashed = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.conv(F.substring(hexh, 1, 2), 16, 10).cast("int").alias("bucket"),
        F.conv(F.substring(hexh, 3, 8), 16, 10).cast("bigint").alias("v"),
    )
    regs = hashed.withColumn("rho", F.expr(_hll_rho_case("v"))).groupBy(
        "day", "bucket"
    ).agg(F.max("rho").alias("r"))

    def est(df, keys):
        z = "SUM(1.0 / CAST(shiftleft(1L, r) AS DOUBLE))" \
            f" + ({_HLL_M} - count(*))"
        zeros = f"({_HLL_M} - count(*))"
        return df.groupBy(*keys).agg(
            F.expr(f"round({_hll_estimate_sql(f'({z})', zeros)}, 4)").alias("est")
        )

    per_day = est(regs, ["day"]).withColumnRenamed("est", "est_users")
    merged = regs.groupBy("bucket").agg(F.max("r").alias("r"))
    total = est(merged, []).withColumnRenamed("est", "est_total_users")
    return per_day.crossJoin(F.broadcast(total))


def _sql_events_distinct_hll_md5() -> str:
    rho = _hll_rho_case("v")
    z = f"SUM(1.0 / CAST((CAST(1 AS BIGINT) << r) AS DOUBLE)) + ({_HLL_M} - count(*))"
    zeros = f"({_HLL_M} - count(*))"
    estimate = _hll_estimate_sql(f"({z})", zeros)
    return f"""
WITH hashed AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|hll'), 1, 2))
              AS BIGINT) AS bucket,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|hll'), 3, 8))
              AS BIGINT) AS v
  FROM events
),
regs AS (
  SELECT day, bucket, max({rho}) AS r
  FROM hashed GROUP BY 1, 2
),
per_day AS (
  SELECT day, round({estimate}, 4) AS est_users FROM regs GROUP BY day
),
merged AS (SELECT bucket, max(r) AS r FROM regs GROUP BY 1),
total AS (SELECT round({estimate}, 4) AS est_total_users FROM merged)
SELECT day, est_users, est_total_users FROM per_day CROSS JOIN total
"""


def q_cust_order_distribution(spark, sf_dir):
    """TPC-H Q13-shaped distribution query: how many customers placed
    exactly k (non-urgent) orders, INCLUDING k=0 — the zero bucket is the
    whole point, so the join must be outer-preserving. Scale shape:
    aggregate the fact table FIRST (orders → per-custkey counts, map-side
    combinable, one shuffle on o_custkey), then LEFT-join the customer
    dimension onto the pre-shrunk counts — never join raw orders to
    customer. The second aggregate groups on the count itself (at most
    |max orders per customer| + 1 rows), so it collapses to a tiny
    hash aggregate regardless of corpus size."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return (
        c.join(per_cust, c["c_custkey"] == per_cust["o_custkey"], "left")
        .select(F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


SQL_CUST_ORDER_DISTRIBUTION = """
WITH per_cust AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
  FROM orders WHERE o_orderpriority <> '1-URGENT' GROUP BY 1
)
SELECT COALESCE(n, 0) AS c_count, CAST(count(*) AS BIGINT) AS custdist
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY 1
"""


_PROSPECT_CCS = ("13", "31", "23", "29", "30", "18", "17")


def q_cust_prospects(spark, sf_dir):
    """TPC-H Q22-shaped prospect query: customers in a set of "country
    code" groups (last-two-digit slice of c_name — the schema has no
    phone column) whose balance exceeds the positive-balance average of
    that candidate pool and who never placed an URGENT order (every
    synthetic customer has some order, so the classic "no orders at all"
    predicate would be vacuously empty — the anti-join shape is what the
    class exercises), grouped by code.
    Scale shape: the global average is a 1-row broadcast scalar (never a
    correlated subquery), the no-orders predicate is a LEFT ANTI join on
    o_custkey (one shuffle of the pre-filtered candidate slice, not the
    dimension), and the threshold compare is EXACT — bal·n_bal > Σbal in
    DECIMAL, so no double average ever decides a borderline row's
    membership across engines or partitionings."""
    cc = F.substring("c_name", 17, 2)
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    cands = (
        _t(spark, sf_dir, "customer")
        .withColumn("cc", cc)
        .filter(F.col("cc").isin(*_PROSPECT_CCS))
        .select("cc", "c_custkey", bal.alias("bal"))
    )
    stats = cands.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("sum_bal"), F.count(F.lit(1)).alias("n_bal")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cands.crossJoin(F.broadcast(stats))
        .filter(F.col("bal") * F.col("n_bal") > F.col("sum_bal"))
        .join(o, cands["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("cc")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("bal").cast("double"), 2).alias("totacctbal"),
        )
    )


SQL_CUST_PROSPECTS = f"""
WITH cands AS (
  SELECT substring(c_name, 17, 2) AS cc, c_custkey,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer
  WHERE substring(c_name, 17, 2) IN {_PROSPECT_CCS!r}
),
stats AS (
  SELECT SUM(bal) AS sum_bal, CAST(count(*) AS BIGINT) AS n_bal
  FROM cands WHERE bal > 0
)
SELECT cc, CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(SUM(bal) AS DOUBLE), 2) AS totacctbal
FROM cands CROSS JOIN stats
WHERE bal * n_bal > sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_orderpriority = '1-URGENT'
                    AND o_custkey = cands.c_custkey)
GROUP BY 1
"""


SNB_WINDOW = 4


def q_snb_candidate_pairs(spark, sf_dir):
    """Sorted-neighborhood blocking (Hernandez–Stolfo) — the classic
    alternative to LSH banding for ER candidate generation (the D1
    canonicalizer family; reference entity merge
    /root/reference/src/mmkg_rag/index/merge.py): sort the DISTINCT name
    dictionary, pair each name with its next SNB_WINDOW-1 neighbors in
    sort order, keep pairs whose word-set Jaccard ≥ 1/3 (integer
    cross-multiply — no float ever decides membership). Scale shape: the
    DICTIONARY sorts, never the corpus, via the two-phase exact global
    rank (functions/ranks.py — one PARALLEL range shuffle, no Exchange
    SinglePartition), and the window pairing is an EQUI-join on rank
    after exploding offsets 1..W-1 — candidate volume is exactly
    (W-1)·n, data-independent, the property that makes SNB robust where
    a skewed blocking key blows up bucket joins."""
    from mmkg_rag_spark.functions.ranks import global_row_numbers

    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    # the test dictionaries are ≤100 names: 8 range partitions keep the
    # two-phase rank's per-partition worker spin-up proportionate (32
    # near-empty mapInPandas partitions cost ~3 s of pure startup); at
    # corpus scale pass defaultParallelism — the knob, not the algorithm
    ranked = global_row_numbers(names, ["p_name"], num_partitions=8).select(
        "p_name", "rank"
    )
    probes = ranked.withColumn(
        "d", F.explode(F.sequence(F.lit(1), F.lit(SNB_WINDOW - 1)))
    ).select(
        F.col("p_name").alias("name_a"),
        (F.col("rank") + F.col("d")).alias("rank_b"),
    )
    right = ranked.select(
        F.col("p_name").alias("name_b"), F.col("rank").alias("rank_b")
    )
    toks_a = F.array_distinct(F.split("name_a", " "))
    toks_b = F.array_distinct(F.split("name_b", " "))
    inter = F.size(F.array_intersect(toks_a, toks_b)).cast("long")
    uni = (F.size(toks_a) + F.size(toks_b)).cast("long") - inter
    return (
        probes.join(right, "rank_b")
        .select(
            "name_a",
            "name_b",
            inter.alias("n_common"),
            uni.alias("n_union"),
        )
        .filter(F.col("n_common") * 3 >= F.col("n_union"))
    )


SQL_SNB_CANDIDATE_PAIRS = f"""
WITH ranked AS (
  SELECT p_name, ROW_NUMBER() OVER (ORDER BY p_name) AS r
  FROM (SELECT DISTINCT p_name FROM part)
),
pairs AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b,
         len(list_intersect(list_distinct(string_split(a.p_name, ' ')),
                            list_distinct(string_split(b.p_name, ' ')))) AS i,
         len(list_distinct(string_split(a.p_name, ' ')))
           + len(list_distinct(string_split(b.p_name, ' '))) AS s
  FROM ranked a JOIN ranked b ON b.r - a.r BETWEEN 1 AND {SNB_WINDOW - 1}
)
SELECT name_a, name_b, CAST(i AS BIGINT) AS n_common,
       CAST(s - i AS BIGINT) AS n_union
FROM pairs WHERE 3 * i >= s - i
"""


def q_events_time_weighted_avg(spark, sf_dir):
    """Per-user time-weighted average (TWAP) of an irregularly-sampled
    value stream — the canonical sensor/price rollup where a plain AVG
    over-weights bursts. Each value holds until the next event: weight =
    seconds to the next event (lead over the TZ-proof integer epoch with
    event_id tiebreak; the last event carries no interval). The
    numerator is EXACT — DECIMAL(18,2) value × BIGINT seconds summed as
    decimal, so no order-dependent double accumulation; only the final
    division is float, on identical inputs both engines. One user-keyed
    shuffle shared by the window and the groupBy."""
    from mmkg_rag_spark.functions.timeops import ntz_epoch

    e = _t(spark, sf_dir, "events").withColumn("ep", ntz_epoch("ts"))
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    d = (
        e.withColumn("ep2", F.lead("ep").over(w))
        .filter(F.col("ep2").isNotNull())
        .withColumn("dt", F.col("ep2") - F.col("ep"))
        .withColumn("v", F.col("value").cast("decimal(18,2)"))
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt").alias("span_sec"),
        F.round(
            F.sum(F.col("v") * F.col("dt")).cast("double") / F.sum("dt"), 6
        ).alias("twap"),
    )


SQL_EVENTS_TWAP = """
WITH d AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER
           (PARTITION BY user_id
            ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS ep2,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(SUM(ep2 - ep) AS BIGINT) AS span_sec,
       round(CAST(SUM(v * (ep2 - ep)) AS DOUBLE) / SUM(ep2 - ep), 6) AS twap
FROM d WHERE ep2 IS NOT NULL
GROUP BY 1
"""


QTY_THRESHOLD = 300


def q_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume orders): orders whose total lineitem
    quantity exceeds a threshold, joined back to orders + customer. Scale
    shape: aggregate the FACT table first — one shuffle on l_orderkey
    with map-side partial sums — then HAVING-filter to the tiny
    heavy-order set and BROADCAST it into orders; the customer join runs
    on the already-filtered rows, so raw lineitem never joins a
    dimension. Quantities sum as DECIMAL so the threshold compare and
    the emitted total are exact on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qd"))
        .filter(F.col("qd") > QTY_THRESHOLD)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round(F.col("qd").cast("double"), 2).alias("total_qty"),
        )
    )


SQL_LARGE_VOLUME_ORDERS = f"""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qd
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {QTY_THRESHOLD}
)
SELECT c_custkey, c_name, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice,
       round(CAST(qd AS DOUBLE), 2) AS total_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


_FK_RELATIONS = [
    ("lineitem.l_orderkey->orders.o_orderkey",
     "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey",
     "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey",
     "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer.c_custkey",
     "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey",
     "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey",
     "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region.r_regionkey",
     "nation", "n_regionkey", "region", "r_regionkey"),
    ("events.user_id->customer.c_custkey",
     "events", "user_id", "customer", "c_custkey"),
]


def q_ref_integrity_audit(spark, sf_dir):
    """Referential-integrity audit over every FK edge of the star schema —
    the data-quality gate a pipeline runs BEFORE joining 100 TB of facts
    (a silent orphan key means silent row loss in every inner join
    downstream). Per relation: distinct FK keys, orphan keys (FK values
    with no dimension row) and unused dimension keys, all from ONE
    full-outer join of the two DISTINCT key sets — the fact side
    collapses to distinct keys first (map-side combinable), so the join
    is keys-vs-keys, never rows-vs-rows. The union output is
    |relations| rows."""
    out = None
    for rel, ftab, fk, dtab, pk in _FK_RELATIONS:
        fkeys = (
            _t(spark, sf_dir, ftab)
            .select(F.col(fk).cast("long").alias("k"))
            .distinct()
            .withColumn("f", F.lit(1))
        )
        pkeys = (
            _t(spark, sf_dir, dtab)
            .select(F.col(pk).cast("long").alias("k"))
            .distinct()
            .withColumn("p", F.lit(1))
        )
        row = (
            fkeys.join(pkeys, "k", "full_outer")
            .agg(
                F.count("f").alias("n_fk_keys"),
                F.count(F.when(F.col("p").isNull(), 1)).alias("orphan_keys"),
                F.count(F.when(F.col("f").isNull(), 1)).alias("unused_keys"),
            )
            .select(
                F.lit(rel).alias("relation"),
                "n_fk_keys",
                "orphan_keys",
                "unused_keys",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


def _sql_ref_integrity() -> str:
    parts = []
    for rel, ftab, fk, dtab, pk in _FK_RELATIONS:
        parts.append(f"""
SELECT '{rel}' AS relation,
       CAST(count(f.k) AS BIGINT) AS n_fk_keys,
       CAST(count(*) FILTER (p.k IS NULL) AS BIGINT) AS orphan_keys,
       CAST(count(*) FILTER (f.k IS NULL) AS BIGINT) AS unused_keys
FROM (SELECT DISTINCT CAST({fk} AS BIGINT) AS k FROM {ftab}) f
FULL OUTER JOIN (SELECT DISTINCT CAST({pk} AS BIGINT) AS k FROM {dtab}) p
ON f.k = p.k""")
    return "\nUNION ALL\n".join(parts)


def q_events_value_quantile_sketch(spark, sf_dir):
    """Mergeable fixed-bin quantile sketch (histogram digest) — the
    quantile sibling of the HLL twin: per-type value histograms at bin
    width 0.25 are the SKETCH (a few hundred integers, mergeable by
    plain addition), and p50/p90/p99 read off the cumulative registers
    with in-bin linear interpolation. The '__all__' row is computed by
    MERGING the per-type registers (sum per bin) — the mergeability
    property proven in-query, register-for-register, exactly like a
    per-shard rollup at 100 TB would. Determinism: bins are
    floor(value·4) (one IEEE multiply), rank targets are exact integer
    ceilings, and the interpolation is the identical expression tree on
    both engines. Register/quantile logic lives in functions/qsketch.py,
    shared with the streaming register fold
    (streaming.quantile_sketch_registers) whose state IS the registers."""
    from mmkg_rag_spark.functions import qsketch

    e = _t(spark, sf_dir, "events")
    hist = qsketch.histogram(e)
    all_hist = hist.select("event_type", "b", "cnt").unionAll(
        qsketch.merge_registers(hist)
    )
    return qsketch.quantiles_from_registers(all_hist)


SQL_EVENTS_QUANTILE_SKETCH = """
WITH hist AS (
  SELECT event_type, CAST(floor(value * 4) AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
all_hist AS (
  SELECT event_type, b, cnt FROM hist
  UNION ALL
  SELECT '__all__' AS event_type, b, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM hist GROUP BY b
),
cum AS (
  SELECT event_type, b, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY b) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY b) - cnt AS cp,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM all_hist
),
picked AS (
  SELECT c.event_type, c.n, q.qname,
         round(0.25 * c.b + 0.25 * ((q.qn * c.n + q.qd - 1) // q.qd - c.cp)
               / c.cnt, 6) AS est
  FROM cum c
  JOIN (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
       q(qname, qn, qd)
    ON c.cum >= (q.qn * c.n + q.qd - 1) // q.qd
   AND c.cp < (q.qn * c.n + q.qd - 1) // q.qd
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       MAX(CASE WHEN qname = 'p50' THEN est END) AS p50,
       MAX(CASE WHEN qname = 'p90' THEN est END) AS p90,
       MAX(CASE WHEN qname = 'p99' THEN est END) AS p99
FROM picked GROUP BY 1
"""


def q_events_type_dow_chisq(spark, sf_dir):
    """Chi-square contribution table for event_type × weekday — the
    categorical-association screen (is traffic mix independent of
    weekday?) a curation pipeline runs before stratifying on a feature.
    Weekday is pure integer arithmetic on the TZ-proof epoch
    ((days+4) mod 7 — 1970-01-01 was a Thursday), never a locale/zone
    calendar call. Per-cell exactness: observed·N − row·col is BIGINT
    (≤1e10 at these scales), expected_milli is an exact integer division
    — the only floats are one squared cast and one division on identical
    inputs, so the oracle hash-matches without any summation-order
    hazard (no float SUM anywhere: the statistic ships as the per-cell
    contribution table, Σ is the reader's one exact addition)."""
    from mmkg_rag_spark.functions.timeops import ntz_epoch

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        ((F.floor(ntz_epoch("ts") / 86400) + 4) % 7)
        .cast("long")
        .alias("dow"),
    )
    cells = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("o")
    )
    rows = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("r"))
    cols = e.groupBy("dow").agg(F.count(F.lit(1)).alias("c"))
    n = e.agg(F.count(F.lit(1)).alias("n_total"))
    j = (
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(cols), "dow")
        .crossJoin(F.broadcast(n))
    )
    num = (F.col("o") * F.col("n_total") - F.col("r") * F.col("c")).cast(
        "double"
    )
    den = (F.col("r") * F.col("c") * F.col("n_total")).cast("double")
    return j.select(
        "event_type",
        "dow",
        F.col("o").alias("observed"),
        F.expr("r * c * 1000 div n_total").alias("expected_milli"),
        F.round(num * num / den, 6).alias("chisq_contrib"),
    )


SQL_EVENTS_CHISQ = """
WITH e AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS dow
  FROM events
),
cells AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS o
          FROM e GROUP BY 1, 2),
rws AS (SELECT event_type, CAST(count(*) AS BIGINT) AS r
        FROM e GROUP BY 1),
cls AS (SELECT dow, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM e)
SELECT event_type, dow, o AS observed,
       r * c * 1000 // n_total AS expected_milli,
       round(CAST(o * n_total - r * c AS DOUBLE)
             * CAST(o * n_total - r * c AS DOUBLE)
             / CAST(r * c * n_total AS DOUBLE), 6) AS chisq_contrib
FROM cells JOIN rws USING (event_type) JOIN cls USING (dow)
CROSS JOIN tot
"""


def q_region_nation_rollup(spark, sf_dir):
    """ROLLUP along the geographic hierarchy region → nation — the
    drill-down twin of the CUBE class (hierarchical subtotals + grand
    total, no cross-granularity sets). The dimension chain
    (customer→nation→region) joins BEFORE the rollup so Catalyst plans
    one Expand (3 replicas) + one aggregate exchange over the
    pre-joined facts; the dimension joins are broadcast (25-nation /
    5-region tables). Revenue sums as DECIMAL — the grand-total cell
    aggregates every order, the maximal ulp-drift exposure the cube
    class documents."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nt = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    j = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(nt), c["c_nationkey"] == nt["n_nationkey"])
        .join(F.broadcast(r), nt["n_regionkey"] == r["r_regionkey"])
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(28,4)")).cast(
                "double"
            ),
            2,
        ).alias("revenue"),
        F.grouping_id().cast("long").alias("gid"),
    )


SQL_REGION_NATION_ROLLUP = """
SELECT r_name, n_name, count(*) AS n_orders,
       round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 2)
         AS revenue,
       CAST(grouping(r_name, n_name) AS BIGINT) AS gid
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


_Q7_NATIONS = ("NATION_18", "NATION_19")  # trade in both directions at every SF


def _rev_dec():
    """Exact decimal revenue: extprice·(1−discount), the repo-wide
    pattern (see q_agg_pricing_summary) — no double ever enters a SUM."""
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )


def q_nation_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): revenue between two nations in
    BOTH directions, by (supplier nation, customer nation, year). Scale
    shape: nation (25 rows) and supplier broadcast; the nation-pair
    filter applies to the supplier/customer sides BEFORE the fact join
    (semi-selective dimension predicates pushed below the big joins —
    Catalyst pushes the isin() through the join onto the broadcast
    sides), then one aggregate exchange on the 3 grouping keys. Year is
    a wall-clock field read of the NTZ shipdate — TZ-proof on both
    engines."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate",
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .filter(F.col("n_name").isin(*_Q7_NATIONS))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cn = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .filter(F.col("n_name").isin(*_Q7_NATIONS))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cn, o["o_custkey"] == cn["c_custkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(F.sum(_rev_dec()).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_NATION_VOLUME_SHIPPING = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE),
             2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN {_Q7_NATIONS!r} AND cn.n_name IN {_Q7_NATIONS!r}
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
"""


def q_nation_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): per supplier-nation per
    year, SUM(revenue − cost). The schema has no partsupp table, so the
    cost model is declared as qty·retailprice·0.1 (an exact DECIMAL
    product — 0.1 is DECIMAL(2,1), never a double) — the class is the
    SHAPE: a 4-table star join into a two-key aggregate, all decimal
    arithmetic so the grand sums are order-independent. Dimensions
    broadcast; one fact shuffle on the grouping keys."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate",
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    cost = (
        F.col("l_quantity").cast("decimal(12,2)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit(0.1).cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(_rev_dec() - cost).cast("double"), 2
            ).alias("profit")
        )
    )


SQL_NATION_PROFIT = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(6,4)))
                      - CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(p_retailprice AS DECIMAL(12,2))
                        * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE), 2)
         AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def q_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): per month, the percentage of
    revenue from PROMO-type parts. Both the promo and total sums stay
    DECIMAL end-to-end; only the final share division is float, on
    identical inputs (one cast + one divide + one round — the same tree
    both engines). Part broadcasts; one aggregate exchange on the
    month key."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    ym = (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("long")
    rev = _rev_dec()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(ym.alias("ym"))
        .agg(
            F.sum(promo).alias("_pr"),
            F.sum(rev).alias("_tr"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "ym",
            F.round(
                F.lit(100) * F.col("_pr").cast("double")
                / F.col("_tr").cast("double"),
                4,
            ).alias("promo_share_pct"),
            "n_items",
        )
    )


SQL_PROMO_REVENUE_SHARE = """
WITH m AS (
  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
         SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(12,2))
                       * (1 - CAST(l_discount AS DECIMAL(6,4)))
                  ELSE CAST(0 AS DECIMAL(12,2)) END) AS pr,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS tr,
         CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT ym, round(100 * CAST(pr AS DOUBLE) / CAST(tr AS DOUBLE), 4)
         AS promo_share_pct,
       n_items
FROM m
"""


_Q15_FROM = "1996-01-01"
_Q15_TO = "1996-04-01"


def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): suppliers whose quarterly revenue
    EQUALS the maximum — the view + scalar-max shape. The max attaches
    as a 1-row broadcast scalar and the tie compare happens in EXACT
    DECIMAL (never a rounded double), so ties are engine-invariant.
    One fact shuffle (per-supplier aggregate), everything after is
    supplier-dimension sized."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(_Q15_FROM)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(_Q15_TO)))
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(_rev_dec()).alias("rev")
    )
    mx = per_supp.agg(F.max("rev").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev").cast("double"), 2).alias("total_revenue"),
        )
    )


SQL_TOP_SUPPLIER_REVENUE = f"""
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_FROM}'
    AND l_shipdate < TIMESTAMP '{_Q15_TO}'
  GROUP BY 1
),
mx AS (SELECT MAX(rev) AS max_rev FROM per_supp)
SELECT s_suppkey, s_name, round(CAST(rev AS DOUBLE), 2) AS total_revenue
FROM per_supp CROSS JOIN mx
JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = max_rev
"""


def q_disjunctive_filter_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    three OR-branches over (brand, size range, quantity range) — the
    class that exercises OR pushdown: Catalyst must push the common
    l_quantity bounds and the partkey join below the disjunction rather
    than materialize the cross of branches. Part broadcasts; output is
    ONE row (global decimal sum + count)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#1") & sz.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#2") & sz.between(5, 20) & q.between(10, 30))
        | ((b == "Brand#3") & sz.between(20, 40) & q.between(20, 50))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.round(F.sum(_rev_dec()).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_DISJUNCTIVE_FILTER_REVENUE = """
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE),
             2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
       AND l_quantity BETWEEN 20 AND 50)
"""


_Q8_REGION = "EUROPE"
_Q8_NATION = "NATION_19"


def q_nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): of all revenue sold to a
    region's customers, the fraction supplied by one nation, per year.
    Numerator is a conditional decimal sum over the SAME rows as the
    denominator (one pass, no second join), the share is the single
    float division at the end. The customer side filters to the region
    BEFORE the fact join (broadcast nation→region chain); one aggregate
    exchange on the year."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate",
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    region_custs = (
        c.join(
            F.broadcast(
                n.join(r, n["n_regionkey"] == r["r_regionkey"]).filter(
                    F.col("r_name") == _Q8_REGION
                )
            ),
            c["c_nationkey"] == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        s["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = _rev_dec()
    target = F.when(
        F.col("supp_nation") == _Q8_NATION, rev
    ).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(region_custs, o["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(target).alias("_nr"), F.sum(rev).alias("_tr"))
        .select(
            "l_year",
            F.round(F.col("_tr").cast("double"), 2).alias("total_revenue"),
            F.round(
                F.lit(100) * F.col("_nr").cast("double")
                / F.col("_tr").cast("double"),
                4,
            ).alias("mkt_share_pct"),
        )
    )


SQL_NATION_MARKET_SHARE = f"""
WITH rows_ AS (
  SELECT year(l_shipdate) AS y, sn.n_name AS supp_nation,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(6,4))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = '{_Q8_REGION}'
)
SELECT CAST(y AS BIGINT) AS l_year,
       round(CAST(SUM(rev) AS DOUBLE), 2) AS total_revenue,
       round(100 * CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}'
                                 THEN rev
                                 ELSE CAST(0 AS DECIMAL(12,2)) END)
                        AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 4) AS mkt_share_pct
FROM rows_ GROUP BY 1
"""


def q_parts_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) over a filtered part slice, excluding
    a blacklisted supplier set (NOT IN → LEFT ANTI join; the schema has
    no partsupp, so the supplier–part relation is the DISTINCT
    (suppkey, partkey) projection of lineitem — collapsed FIRST, so the
    count-distinct aggregates pairs, never raw facts). The blacklist is
    name-derived (names ending in '7') since there is no comment
    column; the anti join broadcasts it."""
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = _t(spark, sf_dir, "supplier").filter(
        F.col("s_name").endswith("7")
    ).select("s_suppkey")
    pairs = li.distinct()
    return (
        pairs.join(bad, pairs["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), pairs["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_PARTS_SUPPLIER_COUNT = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '%7')
GROUP BY 1, 2, 3
"""


SEQ_LEN = 512


def q_pack_training_sequences(spark, sf_dir):
    """Fixed-length training-sequence packing with document lineage
    (curation.pack_sequences) — the step between shard packing and the
    training loader: the corpus is one concatenated token stream,
    sequence k owns token positions [k·L, (k+1)·L), and each output row
    is one (seq_id, doc_id, doc_offset, n_span) span — the provenance
    map that lets a loader assemble any sequence, or attribute any
    sequence position back to its source document, without
    re-tokenizing. Scale shape: offsets via the two-phase distributed
    prefix sum (assign_shards' machinery — no corpus-order global
    window), then map-only integer arithmetic with a bounded explode
    (≤ n div L + 2 rows per doc)."""
    from mmkg_rag_spark.operators.curation import pack_sequences

    return pack_sequences(_tp(spark, sf_dir, "documents"), SEQ_LEN)


SQL_PACK_TRAINING_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id, {ts.sql_token_count('text')} AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      AS BIGINT) AS cum_before
  FROM t WHERE n_tokens > 0
)
SELECT CAST(u.s AS BIGINT) AS seq_id, doc_id,
  CAST(GREATEST(cum_before, u.s * {SEQ_LEN}) - cum_before AS BIGINT)
    AS doc_offset,
  CAST(LEAST(cum_before + n_tokens, (u.s + 1) * {SEQ_LEN})
       - GREATEST(cum_before, u.s * {SEQ_LEN}) AS BIGINT) AS n_span
FROM c, LATERAL unnest(generate_series(
    cum_before // {SEQ_LEN},
    (cum_before + n_tokens - 1) // {SEQ_LEN})) AS u(s)
"""


LATE_DAYS = 90


def q_shipment_lateness_by_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipping-priority audit): per order priority,
    how many lineitems shipped late (> LATE_DAYS days after the order
    date) and the late fraction. Date arithmetic is day-granular on the
    CAST-to-DATE wall-clock fields of the NTZ timestamps — TZ-proof and
    identical on both engines; the late test and counts are pure
    integers, the one float division is the final rate. One fact join
    (orders broadcast-eligible as the smaller side), one aggregate
    exchange on the 5-value priority key (map-side combinable, so the
    low-cardinality key never skews the shuffle)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    late = (
        F.datediff(F.col("l_shipdate").cast("date"),
                   F.col("o_orderdate").cast("date"))
        > LATE_DAYS
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.count(F.when(late, 1)).alias("n_late"),
        )
        .select(
            "o_orderpriority",
            "n_items",
            "n_late",
            F.round(
                F.col("n_late").cast("double") / F.col("n_items"), 4
            ).alias("late_rate"),
        )
    )


SQL_SHIPMENT_LATENESS = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(count(*) FILTER (date_diff('day', CAST(o_orderdate AS DATE),
                                       CAST(l_shipdate AS DATE))
                             > {LATE_DAYS}) AS BIGINT) AS n_late,
       round(CAST(count(*) FILTER (date_diff('day',
                                             CAST(o_orderdate AS DATE),
                                             CAST(l_shipdate AS DATE))
                                   > {LATE_DAYS}) AS DOUBLE)
             / count(*), 4) AS late_rate
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# --- Session-8 additions: the six TPC-H shapes that complete 22/22 ---
# The schema has no partsupp table and no commit/receipt dates, so Q2 /
# Q4 / Q11 / Q20 are declared against lineitem-derived supply evidence
# (each docstring states the substitution); the class under test is the
# SHAPE — the join/agg/semi-join topology and its 100-TB plan — not the
# TPC-H text.

_Q2_REGION = "EUROPE"
_Q2_PTYPE = "LARGE"


def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): for every part of one
    type, the supplier(s) in one region offering the lowest observed
    line price. partsupp does not exist in this schema, so the offer
    relation is derived from lineitem: cost(part, supplier) =
    MIN(l_extendedprice) — MIN of raw doubles is order-independent and
    engine-exact, so the per-part "equals the minimum" tie compare is
    deterministic with no decimal scaffolding. Scale shape: the region
    filter lands on the supplier dimension BEFORE the fact join (the
    classic Q2 trap is joining the fact first); supplier/nation/region
    and part all broadcast; one fact shuffle builds the offer relation,
    and the per-part minimum is a window over the offer table
    (part-supplier sized, orders of magnitude smaller than the fact)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q2_REGION)
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == _Q2_PTYPE).select(
        "p_partkey", "p_name"
    )
    sn = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name",
                 "s_acctbal", "n_name")
        .agg(F.min("l_extendedprice").alias("_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("_min", F.min("_cost").over(w))
        .filter(F.col("_cost") == F.col("_min"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            F.round("_cost", 2).alias("best_price"),
        )
    )


SQL_MIN_COST_SUPPLIER = f"""
WITH offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice) AS cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = '{_Q2_PTYPE}'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = '{_Q2_REGION}'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name AS nation,
       p_partkey, p_name, round(cost, 2) AS best_price
FROM offers
QUALIFY cost = min(cost) OVER (PARTITION BY p_partkey)
"""


_Q4_FROM = "1996-07-01"
_Q4_TO = "1996-10-01"


def q_order_priority_returns(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): orders placed in one
    quarter that had at least one problem line, counted per priority.
    The schema has no commit/receipt dates, so the EXISTS predicate is
    l_returnflag = 'R' (a returned line) instead of commit < receipt —
    same topology: a date-sliced order scan LEFT SEMI joined to a
    filtered lineitem scan, then a 5-key rollup. Scale shape: both
    filters are pushdown-able scan predicates; the semi-join shuffles
    only orderkeys + the priority column and stops probing an order on
    first match; the aggregate is map-side combinable on 5 keys."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_FROM))
        & (F.col("o_orderdate") < F.lit(_Q4_TO))
    ).select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SQL_ORDER_PRIORITY_RETURNS = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_Q4_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{_Q4_TO} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1
"""


def q_discount_revenue_delta(spark, sf_dir):
    """TPC-H Q6 shape (forecasting revenue change): one filtered scan,
    one global sum — what revenue would be forgone if mid-band
    discounts were eliminated for small orders in one year. The
    discount-band predicate compares on round(l_discount·100) — both
    engines compute it on the identical stored double with the same two
    ops, so the band membership is bit-reproducible without trusting
    double literals; the summed product is exact DECIMAL. Scale shape:
    ZERO joins and zero wide exchanges — every predicate reaches the
    parquet scan (shipdate range is min/max-prunable), the sum is a
    partial-agg + 1-row final, the ideal 100-TB plan for this class."""
    li = _t(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & disc_pct.between(2, 4)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * F.col("l_discount").cast("decimal(6,4)")
                ).cast("double"),
                2,
            ).alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_DISCOUNT_REVENUE_DELTA = """
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE), 2)
         AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 2 AND 4
  AND l_quantity < 24
"""


_Q10_FROM = "1996-01-01"
_Q10_TO = "1996-04-01"


def q_returned_item_customers(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): the top 20 customers
    by revenue lost to returned lines in one quarter. The top-20 rank
    orders on the EXACT decimal revenue (ties impossible to flake) with
    c_custkey as the total-order tiebreak; the emitted revenue is the
    rounded double. Scale shape: the quarter filter prunes orders at
    the scan; lineitem joins the pruned orders (shuffle on orderkey),
    one aggregate exchange on custkey, then customer/nation broadcast
    onto the customer-sized aggregate; the global top-20 is a
    TakeOrdered over at most |customers| rows, never the fact."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_FROM))
        & (F.col("o_orderdate") < F.lit(_Q10_TO))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(_rev_dec()).alias("_rev"))
    )
    w = Window.orderBy(F.desc("_rev"), F.asc("c_custkey"))
    return (
        per_cust.join(
            F.broadcast(c), per_cust["o_custkey"] == c["c_custkey"]
        )
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select(
            "c_custkey",
            "c_name",
            # round in EXACT decimal first (HALF_UP on both engines),
            # THEN cast — the sum's scale-6 decimal can land on a .xx5
            # tie that double-round flakes on (found live at sf0.01).
            F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
            F.col("n_name").alias("nation"),
            "rank",
        )
    )


SQL_RETURNED_ITEM_CUSTOMERS = f"""
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{_Q10_FROM} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{_Q10_TO} 00:00:00'
  GROUP BY 1
)
SELECT c_custkey, c_name, CAST(round(rev, 2) AS DOUBLE) AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name AS nation,
       CAST(row_number() OVER (ORDER BY rev DESC, c_custkey) AS BIGINT)
         AS rank
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
QUALIFY rank <= 20
"""


_Q11_NATION = "NATION_7"


def q_important_parts_value(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): parts whose
    supply value from one nation's suppliers exceeds a threshold
    fraction of the nation's total. partsupp does not exist, so supply
    value is SUM(l_extendedprice) (exact DECIMAL) of the nation's
    shipped lines per part; the threshold is 2× the MEAN part value
    (TPC-H's 0.0001/SF constant rescaled so the cut is non-degenerate
    at every SF). The compare is division-free — val·n_parts >
    2·total — evaluated as the identical double expression tree on
    both engines (repo float policy; the decimal·bigint product would
    exceed DECIMAL(38) headroom at large SF). Scale shape: nation
    filter broadcasts onto supplier before the fact scan; ONE fact
    aggregate produces the per-part values; the grand total is a
    re-aggregate of the per-part table (part-sized, not a second fact
    pass) attached as a 1-row broadcast scalar — the same
    scalar-attach pattern as nation_share_of_region."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name") == _Q11_NATION
    ).select("n_nationkey")
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey"
    )
    per_part = (
        li.join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias(
                "_val"
            )
        )
    )
    total = per_part.agg(
        F.sum("_val").alias("_total"),
        F.count(F.lit(1)).alias("_nparts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("_val").cast("double") * F.col("_nparts")
            > F.lit(2.0) * F.col("_total").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("_val").cast("double"), 2).alias("supply_value"),
        )
    )


SQL_IMPORTANT_PARTS_VALUE = f"""
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = '{_Q11_NATION}'
  GROUP BY 1
)
SELECT p_partkey, round(CAST(val AS DOUBLE), 2) AS supply_value
FROM per_part
WHERE CAST(val AS DOUBLE) * (SELECT count(*) FROM per_part)
      > 2.0 * (SELECT CAST(SUM(val) AS DOUBLE) FROM per_part)
"""


_Q20_NATION = "NATION_3"
_Q20_PREFIX = "red"
_Q20_SHARE = 0.2  # exact binary double (0.2 parses identically)


def q_promo_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers in one
    nation who dominate the supply of some part with a name prefix —
    the nested-aggregate semi-join topology (Q20's partsupp/availqty
    test becomes: this supplier shipped > 20% of the part's 1997
    volume). Quantities are integral doubles, so the sums are exact
    integers and the share compare is engine-invariant. Scale shape:
    the name-prefix filter broadcasts part onto the fact scan; ONE fact
    aggregate to (part, supplier); the per-part denominator is a window
    over that aggregate (no second fact pass); the winner set semi-joins
    the supplier dimension, nation filter applied dimension-side."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(_Q20_PREFIX)
    ).select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name") == _Q20_NATION
    ).select("n_nationkey")
    sp = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
    )
    w = Window.partitionBy("l_partkey")
    winners = (
        sp.withColumn("_part_qty", F.sum("_qty").over(w))
        .filter(F.col("_qty") > F.lit(_Q20_SHARE) * F.col("_part_qty"))
        .select("l_suppkey")
        # no distinct(): LEFT SEMI dedupes by construction, and the
        # winner set broadcasts (supplier-bounded), so the semi-join
        # adds zero exchanges
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(
            F.broadcast(winners),
            s["s_suppkey"] == winners["l_suppkey"],
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )


SQL_PROMO_PART_SUPPLIERS = f"""
WITH sp AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
           AND p_name LIKE '{_Q20_PREFIX}%'
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
),
winners AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, qty,
           SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty
    FROM sp
  ) WHERE qty > CAST({_Q20_SHARE} AS DOUBLE) * part_qty
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = '{_Q20_NATION}'
WHERE EXISTS (SELECT 1 FROM winners WHERE l_suppkey = s_suppkey)
"""


_Q5_REGION = "ASIA"


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): revenue by nation for
    orders where the CUSTOMER and SUPPLIER share a nation inside one
    region, for one year — the only TPC-H query whose join graph is
    cyclic (the c_nationkey = s_nationkey edge closes the loop). The
    same-nation test is an extra equi-condition on the supplier
    broadcast join, never a second fact pass. Scale shape: the year
    filter prunes orders at the scan; customer and the region-filtered
    supplier/nation both broadcast; ONE fact shuffle (lineitem ⋈
    pruned orders) and one 5-key aggregate exchange; revenue is exact
    DECIMAL."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    sn = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(sn),
            (li["l_suppkey"] == sn["s_suppkey"])
            & (c["c_nationkey"] == sn["s_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_rev_dec()).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE), 2)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = '{_Q5_REGION}'
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""


def q_dataset_split(spark, sf_dir):
    """Leakage-safe train/val/test split (curation.leakage_safe_split):
    the split hashes the exact-dedup group representative, so duplicate
    documents can never straddle a split boundary. One fingerprint
    exchange; the draw is the engine-portable md5 ppm (SQL_DRAW_PPM
    pattern on keep_id)."""
    return curation.leakage_safe_split(_tp(spark, sf_dir, "documents"))


SQL_DATASET_SPLIT = f"""
WITH fp AS (
  SELECT doc_id, {ts.sql_fingerprint('text')} AS f FROM documents
),
rep AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY f) AS keep_id FROM fp
),
d AS (
  SELECT doc_id, keep_id,
         CAST(('0x' || substr(md5(CAST(keep_id AS VARCHAR) || '|42'), 1, 8))
              AS BIGINT) % 1000000 AS u
  FROM rep
)
SELECT doc_id, keep_id,
       CASE WHEN u < 980000 THEN 'train'
            WHEN u < 990000 THEN 'val'
            ELSE 'test' END AS split
FROM d
"""


_SEMDEDUP_TAU = 0.4


def q_semdedup(spark, sf_dir):
    """SemDeDup (ann.semdedup_survivors): embedding-cluster-then-prune
    semantic dedup — deterministic k-means (shared with IVF), then drop
    every vector with a smaller-id cluster-mate at cosine ≥ τ. The
    oracle reproduces the whole k-means + the cluster-bucketed pair
    test in SQL via the shared _sql_kmeans_ctes prefix."""
    from mmkg_rag_spark.operators.ann import semdedup_survivors

    return semdedup_survivors(
        _t(spark, sf_dir, "embeddings"), tau=_SEMDEDUP_TAU
    )


def _sql_semdedup(
    n_lists: int = 16, kmeans_iters: int = 2, dim: int = 64,
    tau: float = _SEMDEDUP_TAU,
) -> str:
    """DuckDB twin of ann.semdedup_survivors: shared k-means CTEs, then
    the min-id survivor rule as a NOT-EXISTS over same-cluster pairs
    (cosine rounded to 6 dp pre-compare on both engines)."""
    ctes, _ = _sql_kmeans_ctes(n_lists, kmeans_iters, dim)
    ctes.append(
        f"""dropped AS (
  SELECT DISTINCT a.vec_id
  FROM a_final a JOIN a_final b
    ON a.list_id = b.list_id AND a.vec_id > b.vec_id
  WHERE round(list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v))
           * sqrt(list_dot_product(b.v, b.v))), 6) >= {tau}
)"""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT a.vec_id, CAST(a.list_id AS BIGINT) AS list_id"
        + "\nFROM a_final a"
        + "\nWHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)"
    )


_DUPSPAN_K = 8
_DUPSPAN_MIN = 2


def q_dup_substring_spans(spark, sf_dir):
    """ExactSubstr-style duplicate-span marking
    (textdedup.duplicate_window_spans): maximal per-document token spans
    covered by k-token windows that repeat ≥2 times corpus-wide — the
    suffix-array dedup of Lee et al. 2022 reformulated as two uniform
    shuffles (window-hash count + per-doc island merge). Completes the
    dedup family: exact (whole doc), MinHash/SimHash (near-dup doc),
    containment (embedded doc), and now sub-document substring spans."""
    from mmkg_rag_spark.operators.textdedup import duplicate_window_spans

    return duplicate_window_spans(
        _tp(spark, sf_dir, "documents"), k=_DUPSPAN_K, min_count=_DUPSPAN_MIN
    )


SQL_DUP_SUBSTRING_SPANS = f"""
WITH arrs AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
wins AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         md5(array_to_string(l[u.i + 1 : u.i + {_DUPSPAN_K}], ' ')) AS h
  FROM arrs, LATERAL unnest(generate_series(0, len(l) - {_DUPSPAN_K})) AS u(i)
),
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS cnt FROM wins
  ) WHERE cnt >= {_DUPSPAN_MIN}
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos > prev + {_DUPSPAN_K}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS isl_id
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM marked)
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {_DUPSPAN_K} AS BIGINT) AS span_end,
       CAST(max(pos) + {_DUPSPAN_K} - min(pos) AS BIGINT) AS dup_tokens,
       CAST(count(*) AS BIGINT) AS n_windows
FROM isl
GROUP BY doc_id, isl_id
"""


def q_dedup_cut_text(spark, sf_dir):
    """ExactSubstr CUT (textdedup.cut_duplicate_spans): every document
    rebuilt with its duplicated spans removed; the md5 of the rebuilt
    text pins the exact reconstruction cross-engine. Coverage equals
    the union of the marked windows, so the oracle skips the island
    merge and tests token membership directly."""
    from mmkg_rag_spark.operators.textdedup import cut_duplicate_spans

    return cut_duplicate_spans(
        _tp(spark, sf_dir, "documents"), k=_DUPSPAN_K, min_count=_DUPSPAN_MIN
    )


SQL_DEDUP_CUT_TEXT = f"""
WITH arrs AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
wins AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         md5(array_to_string(l[u.i + 1 : u.i + {_DUPSPAN_K}], ' ')) AS h
  FROM arrs, LATERAL unnest(generate_series(0, len(l) - {_DUPSPAN_K})) AS u(i)
),
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS cnt FROM wins
  ) WHERE cnt >= {_DUPSPAN_MIN}
),
cov AS (
  SELECT doc_id, list(DISTINCT p) AS covered FROM (
    SELECT doc_id, u.p
    FROM marked,
         LATERAL unnest(generate_series(pos, pos + {_DUPSPAN_K} - 1)) AS u(p)
  ) GROUP BY doc_id
),
cut AS (
  SELECT a.doc_id, a.l,
         list_filter(a.l, (t, i) ->
           NOT list_contains(coalesce(c.covered, []), i - 1)) AS kept
  FROM arrs a LEFT JOIN cov c USING (doc_id)
)
SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
       CAST(len(kept) AS BIGINT) AS n_kept,
       md5(coalesce(array_to_string(kept, ' '), '')) AS clean_md5
FROM cut
"""


def q_pmi_collocations(spark, sf_dir):
    """Top-50 bigram collocations by PMI lift (operators/relevance.
    pmi_collocations): the Church-&-Hanks phrase-mining pass a corpus
    pipeline runs before tokenizer training. In-row bigram build (no
    (doc, position) shuffle), term-keyed unigram joins, corpus totals as
    broadcast 1-row scalars, min_count>=5 gate, deterministic (lt, rt)
    tiebreak on the top-k cut. The only float op is ONE fixed-association
    double expression per surviving pair — written identically in the
    oracle, so the hashes match bit-for-bit."""
    from mmkg_rag_spark.operators.relevance import pmi_collocations

    d = _t(spark, sf_dir, "documents")
    return pmi_collocations(d, min_count=5, k=50)


SQL_PMI_COLLOCATIONS = r"""
WITH arrs AS (
  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS a
  FROM documents
),
bg AS (
  SELECT a[j] AS lt, a[j + 1] AS rt
  FROM arrs, unnest(range(1, len(a))) AS u(j)
),
pair_cnt AS (
  SELECT lt, rt, CAST(count(*) AS BIGINT) AS pair_cnt FROM bg GROUP BY 1, 2
),
uni AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY 1
),
n_uni AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni),
n_bi AS (SELECT CAST(SUM(pair_cnt) AS BIGINT) AS n_bi FROM pair_cnt)
SELECT lt, rt, pair_cnt, left_cnt, right_cnt,
       round(
         ((CAST(pair_cnt AS DOUBLE) * CAST(n_uni AS DOUBLE))
            * CAST(n_uni AS DOUBLE))
         / ((CAST(n_bi AS DOUBLE) * CAST(left_cnt AS DOUBLE))
              * CAST(right_cnt AS DOUBLE)),
         6) AS lift
FROM (
  SELECT p.lt, p.rt, p.pair_cnt, ul.c AS left_cnt, ur.c AS right_cnt
  FROM pair_cnt p
  JOIN uni ul ON ul.term = p.lt
  JOIN uni ur ON ur.term = p.rt
  WHERE p.pair_cnt >= 5
), n_uni, n_bi
ORDER BY lift DESC, lt, rt
LIMIT 50
"""


def q_heavy_hitters(spark, sf_dir):
    """Exact phi-heavy-hitters (share > 1/(k+1), k=31) via a Misra-Gries
    nomination pass (functions/heavyhitters.heavy_hitters): a map-only
    O(k)-state sketch nominates candidates (provably a superset of the
    heavy hitters), then ONE semi-join recount confirms them exactly —
    the full vocabulary is never shuffled. The oracle is the naive exact
    GROUP BY + HAVING twin; the MG pass can only over-nominate, never
    change the answer, so they agree bit-for-bit (all-integer math,
    share_ppm by integer DIV on both engines)."""
    from mmkg_rag_spark.functions.heavyhitters import heavy_hitters

    d = _t(spark, sf_dir, "documents")
    return heavy_hitters(d, k=31)


SQL_HEAVY_HITTERS = r"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
c AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt
  FROM toks WHERE term <> '' GROUP BY 1
),
t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens FROM c)
SELECT term, cnt, n_tokens,
       CAST(cnt * 1000000 // n_tokens AS BIGINT) AS share_ppm
FROM c, t
WHERE cnt * 32 > n_tokens
ORDER BY cnt DESC, term
"""


_BPE_MERGES = 24


def _sql_bpe_chain(n: int) -> str:
    """Shared CTE chain for the BPE oracles: the merge loop UNROLLED as
    ``n`` (pair-count -> argmax -> apply) CTE triples over the
    word-frequency table. Words ride as delimited symbol strings
    ``|s1||s2||...|``; applying a merge is ONE ``replace`` of
    ``|a||b|`` with ``|ab|`` — each occurrence owns its delimiters, so
    SQL's non-overlapping left-to-right replace is exactly the trainer's
    ``_apply_merge`` (adjacent occurrences share no characters)."""
    parts = [
        # AS MATERIALIZED is load-bearing: w{i} is referenced twice per
        # level (p{i+1} and w{i+1}); inlined CTEs would expand to 2^n
        # scans of the parquet.
        "WITH wc AS MATERIALIZED (",
        "  SELECT word, CAST(count(*) AS BIGINT) AS cnt",
        "  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)",
        "  WHERE word <> '' AND word NOT LIKE '%|%' GROUP BY 1",
        "),",
        "w0 AS MATERIALIZED (",
        "  SELECT '|' || array_to_string(",
        "           list_append(regexp_extract_all(word, '.'), '</w>'), '||')",
        "         || '|' AS s, cnt",
        "  FROM wc",
        ")",
    ]
    for i in range(1, n + 1):
        parts += [
            f", p{i} AS (",
            f"  SELECT sy[j] AS l, sy[j + 1] AS r, CAST(SUM(cnt) AS BIGINT) AS c",
            f"  FROM (SELECT string_split(trim(s, '|'), '||') AS sy, cnt FROM w{i - 1}) t,",
            f"       unnest(range(1, len(sy))) AS u(j)",
            f"  GROUP BY 1, 2",
            f"), m{i} AS MATERIALIZED (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1)",
            f", w{i} AS MATERIALIZED (",
            f"  SELECT replace(w.s, '|' || m.l || '||' || m.r || '|',",
            f"                 '|' || m.l || m.r || '|') AS s, w.cnt",
            f"  FROM w{i - 1} w, m{i} m",
            f")",
        ]
    return "\n".join(parts)


def _sql_bpe_merges(n: int = _BPE_MERGES) -> str:
    union = "\nUNION ALL ".join(
        f"SELECT {i} AS rk, l AS lt, r AS rt, c AS pair_cnt FROM m{i}"
        for i in range(1, n + 1)
    )
    return f"{_sql_bpe_chain(n)}\nSELECT * FROM (\n{union}\n) ORDER BY rk"


def _sql_bpe_encode(n: int = _BPE_MERGES) -> str:
    """Encode oracle: apply the learned replace chain to every distinct
    word once, count surviving symbols, join the per-word token cost back
    onto the exploded documents. Equivalent to the trainer's
    lowest-rank-first encode because a merge's operand symbols always
    predate it (rank order IS dependency order)."""
    expr = "s0"
    for i in range(1, n + 1):
        expr = (
            f"replace({expr},"
            f" (SELECT '|' || l || '||' || r || '|' FROM m{i}),"
            f" (SELECT '|' || l || r || '|' FROM m{i}))"
        )
    return f"""{_sql_bpe_chain(n)}
, vocab AS (
  SELECT word,
         '|' || array_to_string(
           list_append(regexp_extract_all(word, '.'), '</w>'), '||') || '|' AS s0
  FROM wc
),
enc AS (
  SELECT word,
         CAST(len(string_split(trim({expr}, '|'), '||')) AS BIGINT) AS n_syms
  FROM vocab
),
docw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
stats AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(SUM(e.n_syms) AS BIGINT) AS n_bpe_tokens
  FROM docw d JOIN enc e USING (word)
  WHERE d.word <> '' GROUP BY 1
)
SELECT doc.doc_id,
       coalesce(s.n_words, 0) AS n_words,
       coalesce(s.n_bpe_tokens, 0) AS n_bpe_tokens
FROM documents doc LEFT JOIN stats s USING (doc_id)
ORDER BY doc.doc_id
"""


def _train_corpus_bpe(spark, sf_dir):
    """Shared train step for the two BPE queries: one corpus groupBy to
    the word-frequency table, then the merge loop on the driver over the
    BOUNDED table (functions/bpe.train_bpe; cap + dropped-tail counts
    disclosed in its stats row). Tokens containing the oracle's '|'
    delimiter are excluded on both engines (none exist in the corpus;
    the exclusion keeps the contract exact rather than assumed)."""
    from mmkg_rag_spark.functions import bpe

    d = _t(spark, sf_dir, "documents")
    wc = bpe.word_counts(d).filter(~F.col("word").contains("|"))
    merges, _stats = bpe.train_bpe(
        wc, n_merges=_BPE_MERGES, min_pair_count=1, max_vocab_words=100_000
    )
    return d, merges


def q_bpe_merge_table(spark, sf_dir):
    """BPE tokenizer training (functions/bpe.train_bpe): the learned
    merge table (rk, lt, rt, pair_cnt) for 24 merges. ONE distributed
    word-count shuffle; the merge loop runs on the driver over the
    bounded word-frequency table (the way production BPE trainers scale
    — pair statistics never need the corpus again). Oracle: the merge
    loop UNROLLED as 24 chained argmax CTEs in DuckDB — an iterative
    algorithm made hash-checkable, not rows-only."""
    d, merges = _train_corpus_bpe(spark, sf_dir)
    return spark.createDataFrame(
        [(r, a, b, c) for r, a, b, c in merges],
        "rk INT, lt STRING, rt STRING, pair_cnt LONG",
    )


def q_bpe_encode_stats(spark, sf_dir):
    """BPE encode (functions/bpe.encode_bpe): per-document (n_words,
    n_bpe_tokens) under the merges learned on this corpus. Map-only
    Arrow encode with the rank table broadcast and a per-task
    distinct-word memo — the Python cost is per (task, distinct word),
    not per token. Oracle applies the same 24-replace chain to each
    distinct word and joins the per-word cost back (rank order is
    dependency order, so chain-apply == lowest-rank-first encode)."""
    from mmkg_rag_spark.functions.bpe import encode_bpe

    d, merges = _train_corpus_bpe(spark, sf_dir)
    return encode_bpe(d, merges)


def q_doc_term_cms(spark, sf_dir):
    """Count-Min Sketch term frequencies (functions/cms): per-source
    register matrices (one groupBy bounded at depth*width rows per
    source) MERGED by register-wise addition into a corpus sketch, then
    per-term point estimates (min over the 4 md5-derived rows) probed
    against the broadcast register table. Output pairs each estimate
    with the exact count — overcount >= 0 is the CMS one-sided
    guarantee, visible per term. All-integer md5-derived hashing, so
    DuckDB reproduces registers AND estimates bit-for-bit (the
    events_distinct_hll_md5 precedent)."""
    from mmkg_rag_spark.functions import cms

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    per_source = cms.cms_registers(toks, "term", group_cols=["source"])
    merged = cms.cms_merge(per_source)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt_exact"))
    est = cms.cms_estimate(merged, exact.select("term"), "term")
    return (
        exact.join(est, "term")
        .select(
            "term",
            "cnt_exact",
            "cnt_est",
            (F.col("cnt_est") - F.col("cnt_exact")).alias("overcount"),
        )
        .orderBy("term")
    )


_SQL_CMS_BUCKET = (
    "CAST(CAST(('0x' || substr(md5(term || '|cms|' || CAST(j AS VARCHAR)), 1, 4))"
    " AS BIGINT) % 256 AS INT)"
)

SQL_DOC_TERM_CMS = f"""
WITH tok AS (
  SELECT source, term
  FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
),
cells AS (
  SELECT source, j, {_SQL_CMS_BUCKET} AS bucket
  FROM tok CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
),
regs AS (
  SELECT source, j AS row_j, bucket, CAST(count(*) AS BIGINT) AS reg_cnt
  FROM cells GROUP BY 1, 2, 3
),
merged AS (
  SELECT row_j, bucket, CAST(SUM(reg_cnt) AS BIGINT) AS reg_cnt
  FROM regs GROUP BY 1, 2
),
exact AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt_exact FROM tok GROUP BY 1
),
probes AS (
  SELECT term, j, {_SQL_CMS_BUCKET} AS bucket
  FROM exact CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
),
est AS (
  SELECT p.term, CAST(min(m.reg_cnt) AS BIGINT) AS cnt_est
  FROM probes p JOIN merged m ON m.row_j = p.j AND m.bucket = p.bucket
  GROUP BY 1
)
SELECT e.term, e.cnt_exact, s.cnt_est,
       s.cnt_est - e.cnt_exact AS overcount
FROM exact e JOIN est s USING (term)
ORDER BY term
"""


def q_events_audience_overlap(spark, sf_dir):
    """Pairwise audience overlap between event types via K-Minimum-Values
    signatures (functions/kmv): per-type distinct-user estimates, and
    per unordered type pair the union and INTERSECTION estimates — the
    set operation HLL registers can't answer. One distinct shuffle on
    (type, 48-bit md5 hash), a WindowGroupLimit top-k, then everything
    downstream is bounded at k*n_types rows with broadcast joins.
    All-integer estimates (exact below k, (k-1)*2^48 DIV kth above), so
    the DuckDB twin matches bit-for-bit across the exact and estimated
    regimes (sf0.001 exercises exact, sf0.01+ the estimator)."""
    from mmkg_rag_spark.functions import kmv

    e = _t(spark, sf_dir, "events")
    # Lazy lineage cut on the k*n_types-row signature table: per_type and
    # the pair overlap consume sigs ~8 times, and without the cut each
    # consumer re-plans the fact-table distinct (9 scans of events in the
    # final plan). After it, the fact is scanned once per run and every
    # consumer reads the materialized signature rows (graph.py precedent;
    # lazy, so the builder stays job-free).
    sigs = kmv.kmv_signatures(e, "user_id", ["event_type"], k=32).localCheckpoint(
        eager=False
    )
    per_type = kmv.kmv_estimates(sigs, ["event_type"], k=32)
    ov = kmv.kmv_pair_overlap(sigs, "event_type", k=32)
    return (
        ov.join(
            F.broadcast(
                per_type.select(
                    F.col("event_type").alias("g_a"),
                    F.col("n_distinct_est").alias("est_a"),
                )
            ),
            "g_a",
        )
        .join(
            F.broadcast(
                per_type.select(
                    F.col("event_type").alias("g_b"),
                    F.col("n_distinct_est").alias("est_b"),
                )
            ),
            "g_b",
        )
        .select(
            F.col("g_a").alias("type_a"),
            F.col("g_b").alias("type_b"),
            "est_a",
            "est_b",
            "est_union",
            "est_inter",
        )
        .orderBy("type_a", "type_b")
    )


_KMV_K = 32
_KMV_SCALE = (_KMV_K - 1) * (1 << 48)

SQL_EVENTS_AUDIENCE_OVERLAP = f"""
WITH hashed AS (
  SELECT DISTINCT event_type AS g,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|kmv'), 1, 12))
              AS BIGINT) AS h
  FROM events
),
sigs AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {_KMV_K}
),
per_type AS (
  SELECT g,
         CASE WHEN count(*) < {_KMV_K} THEN CAST(count(*) AS BIGINT)
              ELSE CAST({_KMV_SCALE} AS BIGINT) // max(h) END AS est
  FROM sigs GROUP BY g
),
pairs AS (
  SELECT a.g AS g_a, b.g AS g_b
  FROM (SELECT DISTINCT g FROM sigs) a, (SELECT DISTINCT g FROM sigs) b
  WHERE a.g < b.g
),
merged AS (
  SELECT g_a, g_b, h, CAST(count(*) AS BIGINT) AS present_in
  FROM (
    SELECT p.g_a, p.g_b, s.h FROM pairs p JOIN sigs s ON s.g = p.g_a
    UNION ALL
    SELECT p.g_a, p.g_b, s.h FROM pairs p JOIN sigs s ON s.g = p.g_b
  ) GROUP BY 1, 2, 3
),
top AS (
  SELECT g_a, g_b, h, present_in FROM (
    SELECT *, row_number() OVER (PARTITION BY g_a, g_b ORDER BY h) AS rn
    FROM merged
  ) WHERE rn <= {_KMV_K}
),
ov AS (
  SELECT g_a, g_b,
         CAST(count(*) AS BIGINT) AS n_sig,
         max(h) AS kth,
         CAST(SUM(CASE WHEN present_in = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_match
  FROM top GROUP BY 1, 2
),
est AS (
  SELECT g_a, g_b, n_sig, n_match,
         CASE WHEN n_sig < {_KMV_K} THEN n_sig
              ELSE CAST({_KMV_SCALE} AS BIGINT) // kth END AS est_union
  FROM ov
)
SELECT e.g_a AS type_a, e.g_b AS type_b,
       pa.est AS est_a, pb.est AS est_b,
       e.est_union,
       (e.n_match * e.est_union) // e.n_sig AS est_inter
FROM est e
JOIN per_type pa ON pa.g = e.g_a
JOIN per_type pb ON pb.g = e.g_b
ORDER BY type_a, type_b
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "agg_pricing_summary": q_agg_pricing_summary,
        "top_customers_per_segment": q_top_customers_per_segment,
        "dim_remap_join": q_dim_remap_join,
        "khop_suppliers": q_khop_suppliers,
        "anti_join_inactive": q_anti_join_inactive,
        "unordered_pair_merge": q_unordered_pair_merge,
        "set_ops_nations": q_set_ops_nations,
        "scalar_string_ops": q_scalar_string_ops,
        "regex_scan": q_regex_scan,
        "doc_token_stats": q_doc_token_stats,
        "doc_quality": q_doc_quality,
        "doc_lang_id": q_doc_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_repetition": q_doc_repetition,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard_pairs": q_ngram_jaccard,
        "ngram_jaccard_prefix": q_ngram_jaccard_prefix,
        "decontaminate": q_decontaminate,
        "curate_corpus": q_curate_corpus,
        "pack_shards": q_pack_shards,
        "stratified_sample": q_stratified_sample,
        "mixture_sample": q_mixture_sample,
        "scrub_pii": q_scrub_pii,
        "near_dup_survivors": q_near_dup_survivors,
        "events_sessionize": q_events_sessionize,
        "events_window_agg": q_events_window_agg,
        "events_asof_join": q_events_asof_join,
        "embedding_near_dup": q_embedding_near_dup,
        "ann_topk_bruteforce": q_ann_topk_bruteforce,
        # The native-xxhash64 dedup variants (q_minhash_near_dup /
        # q_simhash_near_dup) are deliberately NOT registered: xxhash64 has
        # no cross-engine twin so they can never be oracle-checked; the md5
        # registrations below run the same dataflow with an oracle-able base
        # hash. The native variants are benched directly by bench.py.
        "minhash_near_dup_md5": q_minhash_near_dup_md5,
        "simhash_near_dup_md5": q_simhash_near_dup_md5,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "doc_tfidf_topk": q_doc_tfidf_topk,
        "doc_bigram_topk": q_doc_bigram_topk,
        "doc_lm_score": q_doc_lm_score,
        "bfs_suppliers": q_bfs_suppliers,
        "bm25_search": q_bm25_search,
        "inverted_index": q_inverted_index,
        "events_funnel": q_events_funnel,
        "events_json_extract": q_events_json_extract,
        "events_range_join": q_events_range_join,
        "events_retention": q_events_retention,
        "doc_source_rollup": q_doc_source_rollup,
        "events_value_percentiles": q_events_value_percentiles,
        "events_hopping_window": q_events_hopping_window,
        "events_daily_pivot": q_events_daily_pivot,
        "lineitem_measures_unpivot": q_lineitem_measures_unpivot,
        "events_trailing_range_window": q_events_trailing_range_window,
        "customer_balance_deciles": q_customer_balance_deciles,
        "events_distinct_sketch": q_events_distinct_sketch,
        "nation_top_supplier": q_nation_top_supplier,
        "lineitem_stats_corr": q_lineitem_stats_corr,
        "region_nations_listagg": q_region_nations_listagg,
        "orders_cube": q_orders_cube,
        "events_transition_matrix": q_events_transition_matrix,
        "vocab_coverage": q_vocab_coverage,
        "nation_share_of_region": q_nation_share_of_region,
        "events_growth_accounting": q_events_growth_accounting,
        "events_gap_fill": q_events_gap_fill,
        "part_pair_affinity": q_part_pair_affinity,
        "sssp_suppliers": q_sssp_suppliers,
        "fuzzy_topk_parts": q_fuzzy_topk_parts,
        "pagerank_suppliers": q_pagerank_suppliers,
        "ppr_suppliers": q_ppr_suppliers,
        "lpa_suppliers": q_lpa_suppliers,
        "triangles_coorder": q_triangles_coorder,
        "kcore_coorder": q_kcore_coorder,
        "kg_pagerank": q_kg_pagerank,
        "kg_communities": q_kg_communities,
        "kg_nodes": q_kg_nodes,
        "kg_edges": q_kg_edges,
        "kg_degree_topk": q_kg_degree_topk,
        "kg_search_eris": q_kg_search_eris,
        "part_components": q_part_components,
        "lineitem_price_deciles": q_lineitem_price_deciles,
        "part_name_matches": q_part_name_matches,
        "orders_price_histogram": q_orders_price_histogram,
        "embedding_dim_stats": q_embedding_dim_stats,
        "orders_shipping_priority": q_orders_shipping_priority,
        "events_latest_per_key": q_events_latest_per_key,
        "events_scd2": q_events_scd2,
        "events_peak_concurrency": q_events_peak_concurrency,
        "skew_salted_join": q_skew_salted_join,
        "doc_per_source_sample": q_doc_per_source_sample,
        "doc_containment_pairs": q_doc_containment_pairs,
        "graph_assortativity": q_graph_assortativity,
        "events_rolling_distinct": q_events_rolling_distinct,
        "events_last_touch": q_events_last_touch,
        "doc_profile": q_doc_profile,
        "events_value_outliers": q_events_value_outliers,
        "orders_monthly_yoy": q_orders_monthly_yoy,
        "events_daily_anomalies": q_events_daily_anomalies,
        "source_term_lift": q_source_term_lift,
        "small_order_revenue": q_small_order_revenue,
        "late_shipper_blame": q_late_shipper_blame,
        "supplier_link_prediction": q_supplier_link_prediction,
        "events_interval_islands": q_events_interval_islands,
        "weighted_sample_topk": q_weighted_sample_topk,
        "events_distinct_hll_md5": q_events_distinct_hll_md5,
        "cust_order_distribution": q_cust_order_distribution,
        "cust_prospects": q_cust_prospects,
        "snb_candidate_pairs": q_snb_candidate_pairs,
        "events_time_weighted_avg": q_events_time_weighted_avg,
        "large_volume_orders": q_large_volume_orders,
        "ref_integrity_audit": q_ref_integrity_audit,
        "events_value_quantile_sketch": q_events_value_quantile_sketch,
        "events_type_dow_chisq": q_events_type_dow_chisq,
        "region_nation_rollup": q_region_nation_rollup,
        "nation_volume_shipping": q_nation_volume_shipping,
        "nation_profit": q_nation_profit,
        "promo_revenue_share": q_promo_revenue_share,
        "top_supplier_revenue": q_top_supplier_revenue,
        "disjunctive_filter_revenue": q_disjunctive_filter_revenue,
        "nation_market_share": q_nation_market_share,
        "parts_supplier_count": q_parts_supplier_count,
        "pack_training_sequences": q_pack_training_sequences,
        "shipment_lateness_by_priority": q_shipment_lateness_by_priority,
        "min_cost_supplier": q_min_cost_supplier,
        "order_priority_returns": q_order_priority_returns,
        "discount_revenue_delta": q_discount_revenue_delta,
        "returned_item_customers": q_returned_item_customers,
        "important_parts_value": q_important_parts_value,
        "promo_part_suppliers": q_promo_part_suppliers,
        "dup_substring_spans": q_dup_substring_spans,
        "dedup_cut_text": q_dedup_cut_text,
        "local_supplier_volume": q_local_supplier_volume,
        "semdedup": q_semdedup,
        "dataset_split": q_dataset_split,
        "pmi_collocations": q_pmi_collocations,
        "heavy_hitters": q_heavy_hitters,
        "bpe_merge_table": q_bpe_merge_table,
        "bpe_encode_stats": q_bpe_encode_stats,
        "doc_term_cms": q_doc_term_cms,
        "events_audience_overlap": q_events_audience_overlap,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "agg_pricing_summary": SQL_AGG_PRICING,
        "top_customers_per_segment": SQL_TOP_CUSTOMERS,
        "dim_remap_join": SQL_DIM_REMAP,
        "khop_suppliers": SQL_KHOP,
        "anti_join_inactive": SQL_ANTI_JOIN,
        "unordered_pair_merge": SQL_UNORDERED_PAIR,
        "set_ops_nations": SQL_SET_OPS,
        "scalar_string_ops": SQL_SCALAR_STRING,
        "regex_scan": SQL_REGEX_SCAN,
        "doc_token_stats": SQL_DOC_TOKEN_STATS,
        "doc_quality": SQL_DOC_QUALITY,
        "doc_lang_id": SQL_DOC_LANG_ID,
        "doc_fingerprint": SQL_DOC_FINGERPRINT,
        "doc_repetition": _sql_doc_repetition(),
        "exact_dedup": SQL_EXACT_DEDUP,
        "ngram_jaccard_pairs": SQL_NGRAM_JACCARD,
        "ngram_jaccard_prefix": SQL_NGRAM_JACCARD_PREFIX,
        "decontaminate": SQL_DECONTAMINATE,
        "curate_corpus": _sql_curate_corpus(),
        "pack_shards": SQL_PACK_SHARDS,
        "stratified_sample": _sql_stratified_sample(),
        "mixture_sample": _sql_mixture_sample(),
        "scrub_pii": SQL_SCRUB_PII,
        "near_dup_survivors": SQL_NEAR_DUP_SURVIVORS,
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
        "events_window_agg": SQL_EVENTS_WINDOW,
        "events_asof_join": SQL_EVENTS_ASOF,
        "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
        "ann_topk_bruteforce": SQL_ANN_BRUTE,
        "minhash_near_dup_md5": _sql_minhash_md5(),
        "simhash_near_dup_md5": _sql_simhash_md5(),
        "ann_topk_lsh": _sql_ann_lsh(n_planes=8, n_tables=8, n_probes=8),
        "ann_topk_ivf": _sql_ann_ivf(),
        "doc_tfidf_topk": SQL_TFIDF,
        "doc_bigram_topk": SQL_BIGRAMS,
        "doc_lm_score": SQL_DOC_LM_SCORE,
        "bfs_suppliers": _sql_bfs(),
        "bm25_search": _sql_bm25(),
        "inverted_index": SQL_INVERTED_INDEX,
        "events_funnel": SQL_EVENTS_FUNNEL,
        "events_json_extract": SQL_EVENTS_JSON,
        "events_range_join": SQL_EVENTS_RANGE_JOIN,
        "events_retention": SQL_EVENTS_RETENTION,
        "doc_source_rollup": SQL_DOC_ROLLUP,
        "events_value_percentiles": SQL_EVENTS_PERCENTILES,
        "events_hopping_window": SQL_EVENTS_HOPPING,
        "events_daily_pivot": SQL_EVENTS_PIVOT,
        "lineitem_measures_unpivot": SQL_LINEITEM_UNPIVOT,
        "events_trailing_range_window": SQL_EVENTS_RANGE_WINDOW,
        "customer_balance_deciles": SQL_CUSTOMER_DECILES,
        "nation_top_supplier": SQL_NATION_TOP_SUPPLIER,
        "lineitem_stats_corr": SQL_LINEITEM_STATS_CORR,
        "region_nations_listagg": SQL_REGION_NATIONS_LISTAGG,
        "orders_cube": SQL_ORDERS_CUBE,
        "events_transition_matrix": SQL_EVENTS_TRANSITIONS,
        "vocab_coverage": SQL_VOCAB_COVERAGE,
        "nation_share_of_region": SQL_NATION_SHARE,
        "events_growth_accounting": SQL_EVENTS_GROWTH,
        "events_gap_fill": SQL_EVENTS_GAP_FILL,
        "part_pair_affinity": SQL_PART_PAIR_AFFINITY,
        "sssp_suppliers": _sql_sssp(),
        "pagerank_suppliers": _sql_pagerank(),
        "ppr_suppliers": _sql_pagerank(
            seed_pred="{node} IN ('S0','S1','S2','S3','S4')"
        ),
        "lpa_suppliers": _sql_lpa(),
        "triangles_coorder": SQL_TRIANGLES,
        "kcore_coorder": _sql_kcore(),
        "part_components": SQL_PART_COMPONENTS,
        "lineitem_price_deciles": SQL_LINEITEM_DECILES,
        "part_name_matches": SQL_PART_NAME_MATCHES,
        "orders_price_histogram": SQL_ORDERS_HISTOGRAM,
        "embedding_dim_stats": SQL_EMBEDDING_DIM_STATS,
        "orders_shipping_priority": SQL_SHIPPING_PRIORITY,
        "events_latest_per_key": SQL_EVENTS_LATEST,
        "events_scd2": SQL_EVENTS_SCD2,
        "events_peak_concurrency": SQL_EVENTS_PEAK_CONCURRENCY,
        "skew_salted_join": SQL_SKEW_SALTED_JOIN,
        "doc_per_source_sample": SQL_DOC_PER_SOURCE_SAMPLE,
        "doc_containment_pairs": SQL_DOC_CONTAINMENT,
        "graph_assortativity": SQL_GRAPH_ASSORTATIVITY,
        "events_rolling_distinct": SQL_EVENTS_ROLLING_DISTINCT,
        "events_last_touch": SQL_EVENTS_LAST_TOUCH,
        "doc_profile": SQL_DOC_PROFILE,
        "events_value_outliers": SQL_EVENTS_VALUE_OUTLIERS,
        "orders_monthly_yoy": SQL_ORDERS_MONTHLY_YOY,
        "events_daily_anomalies": SQL_EVENTS_DAILY_ANOMALIES,
        "source_term_lift": SQL_SOURCE_TERM_LIFT,
        "small_order_revenue": SQL_SMALL_ORDER_REVENUE,
        "late_shipper_blame": SQL_LATE_SHIPPER_BLAME,
        "supplier_link_prediction": SQL_SUPPLIER_LINK_PREDICTION,
        "events_interval_islands": SQL_EVENTS_INTERVAL_ISLANDS,
        "weighted_sample_topk": SQL_WEIGHTED_SAMPLE_TOPK,
        "events_distinct_hll_md5": _sql_events_distinct_hll_md5(),
        "cust_order_distribution": SQL_CUST_ORDER_DISTRIBUTION,
        "cust_prospects": SQL_CUST_PROSPECTS,
        "snb_candidate_pairs": SQL_SNB_CANDIDATE_PAIRS,
        "events_time_weighted_avg": SQL_EVENTS_TWAP,
        "large_volume_orders": SQL_LARGE_VOLUME_ORDERS,
        "ref_integrity_audit": _sql_ref_integrity(),
        "events_value_quantile_sketch": SQL_EVENTS_QUANTILE_SKETCH,
        "events_type_dow_chisq": SQL_EVENTS_CHISQ,
        "region_nation_rollup": SQL_REGION_NATION_ROLLUP,
        "nation_volume_shipping": SQL_NATION_VOLUME_SHIPPING,
        "nation_profit": SQL_NATION_PROFIT,
        "promo_revenue_share": SQL_PROMO_REVENUE_SHARE,
        "top_supplier_revenue": SQL_TOP_SUPPLIER_REVENUE,
        "disjunctive_filter_revenue": SQL_DISJUNCTIVE_FILTER_REVENUE,
        "nation_market_share": SQL_NATION_MARKET_SHARE,
        "parts_supplier_count": SQL_PARTS_SUPPLIER_COUNT,
        "pack_training_sequences": SQL_PACK_TRAINING_SEQUENCES,
        "shipment_lateness_by_priority": SQL_SHIPMENT_LATENESS,
        "min_cost_supplier": SQL_MIN_COST_SUPPLIER,
        "order_priority_returns": SQL_ORDER_PRIORITY_RETURNS,
        "discount_revenue_delta": SQL_DISCOUNT_REVENUE_DELTA,
        "returned_item_customers": SQL_RETURNED_ITEM_CUSTOMERS,
        "important_parts_value": SQL_IMPORTANT_PARTS_VALUE,
        "promo_part_suppliers": SQL_PROMO_PART_SUPPLIERS,
        "dup_substring_spans": SQL_DUP_SUBSTRING_SPANS,
        "dedup_cut_text": SQL_DEDUP_CUT_TEXT,
        "local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
        "semdedup": _sql_semdedup(),
        "dataset_split": SQL_DATASET_SPLIT,
        "pmi_collocations": SQL_PMI_COLLOCATIONS,
        "heavy_hitters": SQL_HEAVY_HITTERS,
        "bpe_merge_table": _sql_bpe_merges(),
        "bpe_encode_stats": _sql_bpe_encode(),
        "doc_term_cms": SQL_DOC_TERM_CMS,
        "events_audience_overlap": SQL_EVENTS_AUDIENCE_OVERLAP,
    }
