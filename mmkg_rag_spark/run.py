"""Resumable staged KG-construction driver (spark-submit entrypoint).

    spark-submit --py-files mmkg_rag_spark.zip -m ...  # cluster
    python -m mmkg_rag_spark.run --n-docs 200          # sandbox

Runs the pipeline as checkpointed stages. Each stage's output is a catalog
snapshot keyed by the fingerprint of (stage, params, input snapshot); a
re-run — e.g. after a crash — **skips every stage whose snapshot already
exists** and resumes at the first missing one (north-rule resume semantics;
kill this process at any point and re-invoke with the same args to verify).
Each stage also appends per-partition lineage/metrics rows (metrics.py).

Stage DAG (SURVEY.md §3.1 restructured):
  pages → mentions(map) → nodes+mapping(D-phase) → edges(remap)
        ↘ images+image_edges(M-phase, needs nodes)  → summary
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F


# snapshot fingerprint → row count, so each stage's metrics row can carry
# its upstream's rows_in without an extra count job (the count below is
# printed anyway; resumed snapshots pay one parquet-stats count)
_STAGE_ROWS: dict[str, int] = {}


def _stage(catalog, name, snap, input_snap, compute, force=False):
    """Resume-or-compute one stage; returns the stage's DataFrame."""
    t0 = time.time()
    if not force and catalog.has_snapshot(name, snap):
        print(f"[resume] {name} snap-{snap}: exists, skipping compute")
        out = catalog.read(name, snap)
        _STAGE_ROWS[snap] = out.count()
        return out
    df = compute()
    path = catalog.write(df, name, snap, meta={"input": input_snap})
    wall_ms = int((time.time() - t0) * 1000)
    from mmkg_rag_spark.metrics import record_stage

    record_stage(
        catalog, name, snap, input_snap, path, wall_ms,
        rows_in=_STAGE_ROWS.get(input_snap, -1),
    )
    out = catalog.read(name, snap)
    n = out.count()
    _STAGE_ROWS[snap] = n
    print(f"[run   ] {name} snap-{snap}: {n} rows in {wall_ms} ms")
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="staged resumable KG build")
    ap.add_argument("--n-docs", type=int, default=200)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--sf-dir", default=None,
                    help="derive pages from this testdata dir instead of --n-docs")
    ap.add_argument("--warc", default=None, metavar="GLOB",
                    help="build pages from WARC/WET crawl archives (path, "
                         "glob, or inventory file list) instead of synthetic "
                         "generation — the Common Crawl ingestion path")
    ap.add_argument("--stream-warc", default=None, metavar="DIR",
                    help="continuous mode: watch DIR for WARC/WET archives "
                         "and fold each micro-batch into the stored graph "
                         "(drains what's present, then exits; re-run to "
                         "resume from the checkpoint — only new archives "
                         "are processed)")
    ap.add_argument("--warehouse", default="./warehouse")
    ap.add_argument("--chunk-size", type=int, default=8000)
    ap.add_argument("--overlap", type=int, default=400)
    ap.add_argument("--canonical-dedup", action="store_true",
                    help="pre-stage: keep only the latest fetch per "
                         "CANONICAL url (pipeline.dedup_pages_latest) — "
                         "recrawled/re-spelled pages collapse before "
                         "extraction")
    ap.add_argument("--force", action="store_true", help="recompute all stages")
    ap.add_argument("--compact", action="store_true",
                    help="after the build, compact the graph tables "
                         "(rewrite_data_files analog) and report stats")
    ap.add_argument("--master", default=None)
    ap.add_argument("--ask", default=None, metavar="QUESTION",
                    help="after the build, answer QUESTION over the graph "
                         "(multi-agent QA; set MMKG_LLM_BASE_URL / _API_KEY / "
                         "_MODEL for a real endpoint, else the hermetic mock)")
    ap.add_argument("--evaluate", default=None, metavar="CORPUS_DESC",
                    help="after the build, run the evaluation harness over "
                         "the graph: generate persona/task questions from "
                         "CORPUS_DESC, answer via s (single) and m "
                         "(multi-agent) search, judge on the four GraphRAG "
                         "metrics, print win-rate statistics (reference "
                         "tests/evaluation pipeline; same endpoint env vars "
                         "as --ask, hermetic mock otherwise)")
    ap.add_argument("--eval-n", type=int, default=2,
                    help="N for the persona/task/question sweep (N^3 "
                         "questions; the GraphRAG paper uses 5)")
    args = ap.parse_args(argv)

    from mmkg_rag_spark.operators.dedup import canonicalize_entities, remap_and_merge_relations
    from mmkg_rag_spark.operators.extract import chunk_pages, extract_mentions, split_mentions, with_text
    from mmkg_rag_spark.operators.mmodal import (
        describe_images,
        extract_image_instances,
        filter_valid_images,
        link_images,
        score_image_entities,
    )
    from mmkg_rag_spark.session import get_spark
    from mmkg_rag_spark.sources.catalog import ParquetCatalog, fingerprint
    from mmkg_rag_spark.sources.pages import gen_pages_df, image_manifest

    spark = get_spark(master=args.master, app_name="kg-build")
    catalog = ParquetCatalog(spark, args.warehouse)

    if args.stream_warc:
        import os

        from mmkg_rag_spark.streaming import stream_build

        ckpt = os.path.join(args.warehouse, "_stream_warc_ckpt")
        q = stream_build(spark, args.stream_warc, args.warehouse, ckpt,
                         available_now=True, source="warc")
        q.awaitTermination()
        n = catalog.read("nodes").count()
        e = catalog.read("edges").count()
        print(f"[stream] graph now {n} nodes / {e} edges "
              f"(warehouse {args.warehouse})")
        return 0

    # -- stage 1: pages ----------------------------------------------------
    if args.warc:
        from mmkg_rag_spark.sources.warc import read_warc

        pages_fp = fingerprint("pages", "warc", args.warc)
        pages = _stage(
            catalog, "pages", pages_fp, "-",
            lambda: read_warc(spark, args.warc), args.force,
        )
    elif args.sf_dir:
        from mmkg_rag_spark.sources.docpages import pages_from_documents

        pages_fp = fingerprint("pages", "sf", args.sf_dir)
        pages = _stage(
            catalog, "pages", pages_fp, "-",
            lambda: pages_from_documents(spark, args.sf_dir), args.force,
        )
    else:
        pages_fp = fingerprint("pages", "gen", args.n_docs, args.seed)
        pages = _stage(
            catalog, "pages", pages_fp, "-",
            lambda: gen_pages_df(spark, args.n_docs, args.seed), args.force,
        )

    # optional step 0 of a recrawled store: latest fetch per canonical url
    if args.canonical_dedup:
        from mmkg_rag_spark.pipeline import dedup_pages_latest

        dedup_fp = fingerprint("pages_dedup", pages_fp)
        pages = _stage(
            catalog, "pages_dedup", dedup_fp, pages_fp,
            lambda: dedup_pages_latest(pages).drop("canonical_url"),
            args.force,
        )
        pages_fp = dedup_fp

    # WARC pages already carry extracted text (WET rows have no html at
    # all); synthetic/sf pages re-derive it from html to exercise the
    # byte-identity kernel.
    def _texted():
        if args.warc:
            return pages.select("url", "text")
        return with_text(pages).select("url", "text")

    # -- stage 2: mention extraction (map-only) ----------------------------
    mentions_fp = fingerprint("mentions", args.chunk_size, args.overlap, pages_fp)
    mentions = _stage(
        catalog, "mentions", mentions_fp, pages_fp,
        lambda: extract_mentions(
            chunk_pages(_texted(), args.chunk_size, args.overlap)
        ),
        args.force,
    )
    entity_mentions, relation_mentions = split_mentions(mentions)

    # -- stage 3: canonical nodes + alias mapping (D-phase) ----------------
    nodes_fp = fingerprint("nodes", mentions_fp)

    def _nodes():
        nodes, mapping = canonicalize_entities(entity_mentions)
        # carry the mapping inside one snapshot: tag rows
        n = nodes.select(
            F.lit("node").alias("kind"), "name", "label", "description",
            "aliases", "references", "chunks",
        )
        m = mapping.select(
            F.lit("map").alias("kind"),
            F.col("member").alias("name"),
            F.col("canonical").alias("label"),
            F.lit(None).cast("string").alias("description"),
            F.lit(None).cast("array<string>").alias("aliases"),
            F.lit(None).cast("array<string>").alias("references"),
            F.lit(None).cast("array<int>").alias("chunks"),
        )
        return n.unionByName(m)

    nodes_all = _stage(catalog, "nodes", nodes_fp, mentions_fp, _nodes, args.force)
    nodes = nodes_all.filter(F.col("kind") == "node").drop("kind")
    mapping = nodes_all.filter(F.col("kind") == "map").select(
        F.col("name").alias("member"), F.col("label").alias("canonical")
    )

    # -- stage 4: canonical edges ------------------------------------------
    edges_fp = fingerprint("edges", nodes_fp)
    edges = _stage(
        catalog, "edges", edges_fp, nodes_fp,
        lambda: remap_and_merge_relations(relation_mentions, mapping), args.force,
    )

    # -- stage 5: multimodal image edges -----------------------------------
    img_fp = fingerprint("image_edges", nodes_fp, pages_fp)

    def _image_edges():
        manifest = spark.createDataFrame([(p,) for p in image_manifest()], "path string")
        inst = filter_valid_images(
            extract_image_instances(_texted()), manifest
        )
        top = score_image_entities(describe_images(inst), nodes)
        return link_images(top)

    image_edges = _stage(catalog, "image_edges", img_fp, nodes_fp, _image_edges, args.force)

    # -- stage 5b: images table (only when QA needs it) --------------------
    images = None
    if args.ask:
        from mmkg_rag_spark.operators.mmodal import images_table

        def _images():
            manifest = spark.createDataFrame(
                [(p,) for p in image_manifest()], "path string"
            )
            inst = filter_valid_images(
                extract_image_instances(_texted()), manifest
            )
            return images_table(describe_images(inst))

        images = _stage(catalog, "images", img_fp, nodes_fp, _images, args.force)

    # -- summary -----------------------------------------------------------
    all_edges = edges.select("source", "label", "target").unionByName(
        image_edges.select("source", "label", "target")
    )
    deg = (
        all_edges.select(F.col("source").alias("name"))
        .unionAll(all_edges.select(F.col("target").alias("name")))
        .groupBy("name").count().orderBy(F.desc("count"), "name")
    )
    n_nodes, n_edges, n_img = nodes.count(), edges.count(), image_edges.count()
    print(f"nodes={n_nodes} edges={n_edges} image_edges={n_img}")
    print("top degrees:")
    for r in deg.limit(5).collect():
        print(f"  {r['name']}: {r['count']}")

    # -- optional maintenance: table compaction ------------------------------
    if args.compact:
        for table in ("nodes", "edges", "image_edges"):
            stats = catalog.compact(table)
            print(
                f"[compact] {table}: {stats['files_before']} -> "
                f"{stats['files_after']} files"
                + ("" if stats["compacted"] else " (already compact)")
            )

    # -- optional QA over the built graph (R6 driver) ----------------------
    if args.ask:
        import os as _os

        from mmkg_rag_spark.qa import agent_response

        extractor = None
        if _os.environ.get("MMKG_LLM_BASE_URL"):
            from mmkg_rag_spark.llm import EndpointExtractor

            extractor = EndpointExtractor(
                base_url=_os.environ["MMKG_LLM_BASE_URL"],
                api_key=_os.environ.get("MMKG_LLM_API_KEY", ""),
                model=_os.environ.get("MMKG_LLM_MODEL", "gpt-4o-mini"),
            )
        qa_edges = edges.select(
            "source", "label", "target", "description", "references"
        ).unionByName(
            image_edges.select("source", "label", "target", "description", "references")
        )
        answer = agent_response(args.ask, nodes, qa_edges, images, extractor)
        print(f"question: {args.ask}")
        print(f"answer: {answer}")

    # -- optional evaluation harness over the built graph ------------------
    if args.evaluate:
        import json as _json
        import os as _os

        from mmkg_rag_spark.evaluation import evaluate

        extractor = None
        if _os.environ.get("MMKG_LLM_BASE_URL"):
            from mmkg_rag_spark.llm import EndpointExtractor

            extractor = EndpointExtractor(
                base_url=_os.environ["MMKG_LLM_BASE_URL"],
                api_key=_os.environ.get("MMKG_LLM_API_KEY", ""),
                model=_os.environ.get("MMKG_LLM_MODEL", "gpt-4o-mini"),
            )
        ev_edges = edges.select(
            "source", "label", "target", "description", "references"
        ).unionByName(
            image_edges.select("source", "label", "target", "description", "references")
        )
        judged, stats = evaluate(
            args.evaluate, nodes, ev_edges, images,
            n=args.eval_n, extractor=extractor,
        )
        print(f"evaluated {len(judged)} questions (s vs m, 4 metrics):")
        for metric, counts in stats.items():
            print(
                f"  {metric}: {counts['s']} s wins, {counts['m']} m wins, "
                f"{counts['0']} ties"
            )
        print(_json.dumps({"win_rates": stats}))
    return 0


if __name__ == "__main__":
    # spark-submit runs this file as a bare script (no package context);
    # the package itself arrives via --py-files or the repo root on sys.path.
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
