"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}

The query set covers the engine's phases: full KG construction (scan →
chunk → extract → LSH/CC canonicalize → mmodal link → degree), the
relational operator classes, and the training-data pipeline (dedup families,
text stats, ANN). Each query is timed to first full materialization
(collect of its — small — result; every query ends in an agg/top-k).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "agg_pricing_summary",
    "dim_remap_join",
    "top_customers_per_segment",
    "unordered_pair_merge",
    "khop_suppliers",
    "events_window_agg",
    "events_asof_join",
    "doc_token_stats",
    "doc_quality",
    "doc_lang_id",
    "exact_dedup",
    "decontaminate",
    "pack_shards",
    "scrub_pii",
    "ngram_jaccard_pairs",
    "ngram_jaccard_prefix",
    "near_dup_survivors",
    "curate_corpus",
    "minhash_near_dup",
    "simhash_near_dup",
    "events_sessionize",
    "doc_repetition",
    "stratified_sample",
    "mixture_sample",
    "triangles_coorder",
    "kcore_coorder",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    # embedding_near_dup is deliberately NOT benched: its queries() entry is
    # the O(n²) brute oracle baseline; the scale path (use_ann) is covered
    # by the LSH/IVF bench queries + tests/test_textstats_dedup_ann.py
    "ann_topk_ivf",
    "pagerank_suppliers",
    "doc_tfidf_topk",
    "doc_bigram_topk",
    "doc_lm_score",
    "bfs_suppliers",
    "bm25_search",
    "inverted_index",
    "events_funnel",
    "events_range_join",
    "events_retention",
    "doc_source_rollup",
    "events_value_percentiles",
    "events_hopping_window",
    "events_daily_pivot",
    "lineitem_measures_unpivot",
    "events_trailing_range_window",
    "customer_balance_deciles",
    "events_distinct_sketch",
    "nation_top_supplier",
    "lineitem_stats_corr",
    "region_nations_listagg",
    "orders_cube",
    "events_transition_matrix",
    "vocab_coverage",
    "nation_share_of_region",
    "events_growth_accounting",
    "events_gap_fill",
    "part_pair_affinity",
    "sssp_suppliers",
    "kg_degree_topk",
    # graph/KG retrieval tail (VERDICT r3 item 4): algorithm cost over the
    # built KG / supplier graph — the KG *build* cost is the kg_degree_topk
    # line; these time pagerank/LPA/retrieval on the materialized graph.
    "ppr_suppliers",
    "lpa_suppliers",
    "kg_pagerank",
    "kg_communities",
    "kg_search_eris",
    # session-3 classes
    "part_components",
    "lineitem_price_deciles",
    "part_name_matches",
    "orders_price_histogram",
    "embedding_dim_stats",
    "orders_shipping_priority",
    # session-4 classes
    "events_latest_per_key",
    "events_scd2",
    "events_peak_concurrency",
    "skew_salted_join",
    "doc_per_source_sample",
    "doc_containment_pairs",
    "graph_assortativity",
    "events_rolling_distinct",
    "events_last_touch",
    "doc_profile",
    "events_value_outliers",
    "orders_monthly_yoy",
    "events_daily_anomalies",
    "small_order_revenue",
    "late_shipper_blame",
    "supplier_link_prediction",
    "events_interval_islands",
    "weighted_sample_topk",
    "events_distinct_hll_md5",
    "cust_order_distribution",
    "cust_prospects",
    "snb_candidate_pairs",
    "events_time_weighted_avg",
    "large_volume_orders",
    "ref_integrity_audit",
    "events_value_quantile_sketch",
    "events_type_dow_chisq",
    "region_nation_rollup",
    "nation_volume_shipping",
    "nation_profit",
    "promo_revenue_share",
    "top_supplier_revenue",
    "disjunctive_filter_revenue",
    "nation_market_share",
    "parts_supplier_count",
    "pack_training_sequences",
    "shipment_lateness_by_priority",
    # session-7 completeness sweep: every registered query is benched
    # (the md5-mode dedup twins are covered by their native-hash
    # variants above, so they stay oracle-only)
    "anti_join_inactive",
    "doc_fingerprint",
    "embedding_near_dup",
    "events_json_extract",
    "fuzzy_topk_parts",
    "kg_edges",
    "kg_nodes",
    "regex_scan",
    "scalar_string_ops",
    "set_ops_nations",
    "source_term_lift",
    # session-8: the six shapes completing TPC-H 22/22
    "min_cost_supplier",
    "order_priority_returns",
    "discount_revenue_delta",
    "returned_item_customers",
    "important_parts_value",
    "promo_part_suppliers",
    "dup_substring_spans",
    "dedup_cut_text",
    "local_supplier_volume",
    "semdedup",
    "dataset_split",
    # session-9: vocabulary-pipeline classes
    "pmi_collocations",
    "heavy_hitters",
    "bpe_merge_table",
    "bpe_encode_stats",
    "doc_term_cms",
    "events_audience_overlap",
    "url_canonical_dedup",
    "domain_doc_stats",
    "crawl_frontier_rate",
    "decontaminate_bloom",
    "harmonic_centrality",
    "supplier_path_counts",
    "customer_geo_pairs",
    "supplier_random_walks",
    "doc_keyphrases",
    "customer_rfm_segments",
    "supplier_hits",
    "supplier_scc",
    "nation_order_trend",
    "part_pareto_frontier",
    "part_mis",
    "temporal_reach_suppliers",
    "linkage_patterns",
    "linkage_matches",
    "temperature_sample",
    "part_brand_modularity",
    "customer_sorted_blocking",
    "brand_modularity_move",
    "linkage_clusters",
    "gazetteer_mentions",
    "mention_linking",
    "part_assortativity",
    "doc_surprisal",
    "coorder_edge_support",
    "ktruss_coorder",
    "surface_cooccurrence",
    "mention_spans",
    "rrf_fusion",
    "supplier_butterflies",
    "wl_roles_suppliers",
    "greedy_source_cover",
    "wl_blockmodel_suppliers",
    "events_cusum_drift",
    "embedding_knn_classify",
    "vocab_growth",
    "session_motifs",
    "mutual_topk_coorder",
    "kg_negative_samples",
    "pseudo_diameter_suppliers",
    "doc_novelty",
    "source_overlap_matrix",
    "activity_gini",
    "events_cusum_fixedref",
    "surface_pmi",
    "customer_lorenz",
    "events_burst_spans",
    "coorder_rich_club",
    "orders_aging_buckets",
    "nation_trade_flows",
]

# queries that consume the session KG cache: warm the build untimed so the
# timed number is the graph algorithm, not a duplicate of kg_degree_topk's
# build measurement
KG_WARM = {
    "kg_pagerank", "kg_communities", "kg_search_eris", "kg_nodes", "kg_edges",
}

# reduce result materialization cost for wide outputs: count instead of collect
COUNT_ONLY = {
    "doc_token_stats", "doc_quality", "exact_dedup", "unordered_pair_merge",
    "near_dup_survivors", "events_sessionize", "decontaminate", "pack_shards",
    "scrub_pii", "curate_corpus", "events_asof_join",
    "doc_repetition", "stratified_sample", "mixture_sample",
    "kcore_coorder", "doc_tfidf_topk", "doc_lm_score", "inverted_index",
    "events_range_join",
    "bfs_suppliers", "events_retention", "doc_source_rollup",
    "events_hopping_window", "events_trailing_range_window",
}


def bench_kg(spark, sf_dir: str) -> tuple[float, int]:
    """Time the KG pipeline reading a *materialized* pages table.

    Page synthesis (the testdata adapter) is staged to parquet untimed —
    a production job reads an existing Iceberg/parquet pages table; timing
    generation would benchmark the test-fixture generator, not the engine.
    """
    import shutil
    import tempfile

    from mmkg_rag_spark.pipeline import aqe_size_coalesce, build_kg, degree_summary
    from mmkg_rag_spark.sources.docpages import manifest_df, pages_from_documents

    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    try:
        pages_path = os.path.join(tmp, "pages")
        pages_from_documents(spark, sf_dir).write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        n_pages = pages.count()
        t0 = time.time()
        with aqe_size_coalesce(spark):
            result = build_kg(spark, pages, manifest=manifest_df(spark))
            degree_summary(result).limit(20).collect()
        return time.time() - t0, n_pages
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _warmup(spark) -> None:
    """Untimed warmup: JVM codegen + shuffle machinery + python UDF workers.

    Touches NO bench table, so no query below is cache-primed — this only
    removes one-time process spin-up (~5 s) from the first query's number.
    """
    import pandas as pd  # noqa: F401 — worker-side import warm
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(100000).select(F.sum(_warm(F.col("id")))).collect()
    spark.range(100000).groupBy((F.col("id") % 7).alias("k")).count().collect()


# Session-level memo dicts in __spark_entry__ (pair-graph sharing, KG build).
# min-of-2 must NOT let run 2 hit a memo populated by run 1 — that would time
# a cache lookup, not the query. Each repeat is restored to the memo state the
# query's FIRST run started from, which also preserves the single-shot bench's
# intentional cross-query sharing (survivors/curate reuse the ngram pair graph
# exactly as before).
_MEMO_DICTS = ("_NGRAM_PAIRS_MEMO", "_KG_CACHE")


def _memo_snapshot(se) -> dict[str, dict]:
    return {n: dict(getattr(se, n)) for n in _MEMO_DICTS if hasattr(se, n)}


def _memo_restore(se, snap: dict[str, dict]) -> None:
    for n, saved in snap.items():
        cur = getattr(se, n)
        for k in list(cur):
            if k not in saved:
                v = cur.pop(k)
                try:
                    v.unpersist()
                except Exception:
                    pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Local-mode driver == the executor: size the heap to the box (32 cores ×
    # ~1 GiB working set), not Spark's 1g default. Overridable via env.
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    # min-of-2 per query: this shared box shows one-off 5-7× spikes on single
    # queries (external tenants + lazy codegen/JIT landing in whichever query
    # triggers a generated class) — identical git trees measured 4.0 s and
    # 29.9 s for the same query back-to-back. The reproducible floor is the
    # honest per-plan number; the JSON discloses timing="min_of_2".
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

    import __spark_entry__ as se
    from mmkg_rag_spark.session import get_spark

    spark = get_spark(app_name="mmkg-bench")
    qs = se.queries()
    # Bench-only variants (production xxhash64 dedup paths): deliberately not
    # in queries() because xxhash64 has no DuckDB twin (the md5 twins carry
    # the oracle check); still benched here under their historical names.
    qs.setdefault("minhash_near_dup", se.q_minhash_near_dup)
    qs.setdefault("simhash_near_dup", se.q_simhash_near_dup)

    _warmup(spark)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name == "kg_degree_topk":
            runs = []
            for _ in range(repeats):
                kg_sec, n_pages = bench_kg(spark, sf_dir)
                runs.append(kg_sec)
            timings[name] = round(min(runs), 3)
            continue
        if name in KG_WARM and sf_dir not in getattr(se, "_KG_CACHE", {}):
            se._build_kg(spark, sf_dir)  # untimed: cost owned by kg_degree_topk
        runs = []
        snap = _memo_snapshot(se)
        for i in range(repeats):
            if i:
                _memo_restore(se, snap)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if name in COUNT_ONLY:
                df.count()
            else:
                df.collect()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)

    pages_per_sec = round(n_pages / timings["kg_degree_topk"], 2)

    # similarity-kernel pair throughput (VERDICT r3 item 5): scored pairs and
    # per-core kernel pairs/sec across every scoring site exercised above
    # (dedup verify inside the KG builds, mmodal relevance, fuzzy search)
    from mmkg_rag_spark.metrics import similarity_throughput
    from mmkg_rag_spark.operators.textdedup import cap_dropped_shingles

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "pages_per_sec": pages_per_sec,
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "timing": f"min_of_{repeats}",
        "sim_kernel": similarity_throughput(),
        # no-silent-caps: shingles the ngram frequency cap dropped from pair
        # evidence this run (0 at test SFs; nonzero on boilerplate-heavy
        # data). Counted here, after the timing loop — never in a timed query.
        "ngram_dropped_shingles": cap_dropped_shingles(
            se._NGRAM_CAP_INFO.get(sf_dir, {})
        ),
        # no-silent-caps: the BPE word-table cap disclosure from this run's
        # train (words/tokens the max_vocab_words cut dropped; 0 at test SFs).
        "bpe_train_stats": __import__(
            "mmkg_rag_spark.functions.bpe", fromlist=["bpe"]
        ).LAST_TRAIN_STATS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
