"""Query-side operators (SURVEY.md §2.6 R2-R4) as DataFrame plans.

The reference's retrieval walks in-memory lists and a networkx graph
(retrieval/search.py). Here:

- R2 fuzzy top-k  : keywords (tiny) are **broadcast** against the scored
  table; rapidfuzz-style token_ratio runs in an Arrow-batched pandas UDF
  over the candidate rows; top-k via global window (result caps are ≤ a few
  rows, per reference defaults max_num=3).
- R3 k-hop        : iterative edges⋈frontier equi-join, both orientations
  (graph is undirected, search.py:46-57); frontier stays small (seeds +
  neighbors), so every iteration is a broadcast join against the big edge
  table — no shuffle of the edges at all.
- R4 composition  : seeds ∪ hop-expansion with set subtraction (anti-join)
  and caps, mirroring search_eris (search.py:277-322).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIMILARITY_THRESHOLD = 15  # search.py:81 default
MAX_NUM = 3                # search.py:277-283


def _token_ratio_udf(spark=None):
    # pair-throughput accounting (metrics.similarity_throughput) — one
    # accumulator add per Arrow batch, no behavior change
    accs = None
    if spark is not None:
        from ..metrics import pair_accumulators

        accs = pair_accumulators(spark, "fuzzy_search")

    @F.pandas_udf("double")
    def _score(keyword: pd.Series, field: pd.Series) -> pd.Series:
        import time as _time

        from ..kernels.similarity import token_ratio

        t0 = _time.perf_counter_ns()
        out = pd.Series(
            [token_ratio(k, f) for k, f in zip(keyword, field)], dtype="float64"
        )
        if accs is not None:
            accs[0].add(len(keyword))
            accs[1].add(_time.perf_counter_ns() - t0)
        return out

    return _score


def fuzzy_topk(
    items: DataFrame,
    keywords: list[str],
    fields_col: str,
    id_cols: list[str],
    max_num: int = MAX_NUM,
    threshold: float = SIMILARITY_THRESHOLD,
) -> DataFrame:
    """R2: score(item) = max over keyword×field token_ratio; top ``max_num``.

    ``fields_col`` is an array<string> column (entity: [name]+aliases,
    search.py:118-128; image: [caption]+texts, search.py:131-148).
    """
    kw = F.array(*[F.lit(k) for k in keywords])
    pairs = items.select(
        *id_cols,
        F.explode(F.col(fields_col)).alias("_field"),
    ).withColumn("_kw", F.explode(kw))
    scored = (
        pairs.withColumn(
            "_s", _token_ratio_udf(items.sparkSession)(F.col("_kw"), F.col("_field"))
        )
        .groupBy(*id_cols)
        .agg(F.max("_s").alias("score"))
        .filter(F.col("score") >= threshold)
    )
    # Global top-k via sort+limit: Catalyst plans this TakeOrderedAndProject
    # (per-partition top-k, merged on the driver) — no single-partition sort
    # of the full scored input, unlike a partition-less row_number window
    # (VERDICT r1 #2). The rank window below runs over ≤ max_num rows only.
    top = scored.orderBy(F.desc("score"), *[F.asc(c) for c in id_cols]).limit(max_num)
    w = Window.orderBy(F.desc("score"), *[F.asc(c) for c in id_cols])
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(*id_cols, F.round("score", 4).alias("score"), "rank")
    )


# Above this many frontier vertices, stop broadcasting it and let AQE pick
# the join strategy — a dense hop-2 frontier at 100× data would otherwise
# blow the broadcast limit / driver memory (VERDICT r1 #3).
BROADCAST_FRONTIER_MAX = 500_000


def khop_neighbors(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int = 1,
    src_col: str = "source",
    dst_col: str = "target",
    seed_col: str = "name",
    broadcast_frontier_max: int = BROADCAST_FRONTIER_MAX,
) -> DataFrame:
    """R3: vertices within ``hops`` undirected hops of the seed set.

    Returns (name, hop) with hop = BFS depth (seeds at 0; min depth wins,
    matching nx.single_source_shortest_path_length semantics,
    search.py:151-215). Each round the frontier is checkpointed and counted;
    small frontiers (the reference regime: a handful of seeds, hop=1) are
    broadcast so the edge table is only scanned, while large frontiers fall
    back to an unhinted equi-join and AQE chooses the strategy — the count
    is against materialized (checkpointed) rows, so it costs no recompute.
    """
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))

    # lazy checkpoints: the count() that follows each checkpoint is the
    # materializing action, so checkpoint-write and frontier-count fuse
    # into ONE driver job per hop instead of two (VERDICT r2 #1 family —
    # per-hop cost is job latency, not data)
    visited = (
        seeds.select(F.col(seed_col).alias("name"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint(eager=False)
    )
    frontier = visited.select("name")
    n_frontier = frontier.count()
    for depth in range(1, hops + 1):
        if n_frontier == 0:
            break
        f = frontier.withColumnRenamed("name", "a")
        if n_frontier <= broadcast_frontier_max:
            f = F.broadcast(f)
        nxt = (
            sym.join(f, "a")
            .select(F.col("b").alias("name"))
            .distinct()
            .join(visited.select("name"), "name", "left_anti")
            .withColumn("hop", F.lit(depth))
        )
        nxt = nxt.localCheckpoint(eager=False)
        visited = visited.unionByName(nxt)
        frontier = nxt.select("name")
        n_frontier = frontier.count()
    return visited


def search_eris(
    nodes: DataFrame,
    edges: DataFrame,
    images: DataFrame,
    keywords: list[str],
    max_num: int = MAX_NUM,
    max_images_num: int = 2,
    similarity_threshold: float = 10,
    hop: int = 1,
) -> dict[str, DataFrame]:
    """R4 (search_eris, search.py:277-322): full retrieval composition.

    1. seed entities  = fuzzy top-k over [name]+aliases (search.py:118-128)
    2. seed images    = fuzzy top-k over [caption]+texts (search.py:131-148)
    3. related        = ``hop``-hop neighbors of the seeds minus the seeds
                        themselves (anti-join ≙ set subtraction,
                        search.py:309-310)
    4. related edges  = edges with either endpoint in seeds ∪ related
    5. images capped at ``max_images_num`` (search.py:312-313)

    Returns small result DataFrames (reference caps everything at ≤ a few
    rows) — the expensive inputs are only scanned, never collected.
    """
    ent_items = nodes.select(
        "name",
        F.array_union(F.array("name"), F.coalesce("aliases", F.array())).alias("fields"),
    )
    # result frames are ≤ a few rows but feed several consumers (expansion,
    # unions, semi-joins) — cache each or every consumer re-runs the fuzzy
    # scoring window and, transitively, whatever produced nodes/edges.
    seed_entities = fuzzy_topk(
        ent_items, keywords, "fields", ["name"], max_num, similarity_threshold
    ).cache()

    img_items = images.select(
        "path",
        F.array_union(F.array("caption"), F.coalesce("texts", F.array())).alias("fields"),
    )
    seed_images = fuzzy_topk(
        img_items, keywords, "fields", ["path"], max_images_num, similarity_threshold
    ).cache()

    # non-image edge universe (image edges are '#image*'-labelled, mmodal.py:293-300)
    plain_edges = edges.filter(~F.col("label").startswith("#image"))
    related = expand_seeds(plain_edges, seed_entities.select("name"), hops=hop).cache()

    universe = (
        seed_entities.select("name").unionByName(related.select("name")).distinct().cache()
    )
    related_edges = plain_edges.join(
        F.broadcast(universe.withColumnRenamed("name", "source")), "source", "semi"
    ).unionByName(
        plain_edges.join(
            F.broadcast(universe.withColumnRenamed("name", "target")), "target", "semi"
        )
    ).dropDuplicates(["source", "label", "target"])

    image_edges = edges.filter(F.col("label").startswith("#image")).join(
        F.broadcast(universe.withColumnRenamed("name", "source")), "source", "semi"
    )

    return {
        "seed_entities": seed_entities,
        "seed_images": seed_images,
        "related_entities": related,
        "related_edges": related_edges,
        "image_edges": image_edges,
    }


def assemble_context(
    seed_entities: DataFrame,
    related_entities: DataFrame,
    related_edges: DataFrame,
    nodes: DataFrame,
) -> str:
    """R5 prompt-context assembly (generate.py:12-32 semantics, LLM-free).

    Builds the knowledge block the reference feeds its answer LLM: one
    ``- name, [aliases], description`` line per seed+related entity and one
    ``- source, target, label, description`` line per relation. The result
    frames are reference-capped to a handful of rows (max_num defaults), so
    the collect here is the intended last step of retrieval — everything
    upstream stayed distributed. Downstream answer generation is an LLM
    driver above the engine (SURVEY.md §2.6 R5).
    """
    universe = (
        seed_entities.select("name")
        .unionByName(related_entities.select("name"))
        .distinct()
    )
    ents = (
        nodes.join(F.broadcast(universe), "name", "semi")
        .select("name", "aliases", "description")
        .orderBy("name")
        .collect()
    )
    ent_lines = "\n".join(
        f"- {e.name}, {list(e.aliases or [])}, {e.description}" for e in ents
    )
    rels = related_edges.select(
        "source", "target", "label", "description"
    ).orderBy("source", "target", "label").collect()
    rel_lines = "\n".join(
        f"- {r.source}, {r.target}, {r.label}, {r.description}" for r in rels
    )
    return (
        "Entities: every entity has a name, aliases, and a description\n"
        + ent_lines
        + "\n\nRelations: every relation has a source, target, label, and a description\n"
        + rel_lines
        + "\n"
    )


def assemble_image_context(
    seed_images: DataFrame,
    image_edges: DataFrame,
    images: DataFrame,
    nodes: DataFrame,
) -> str:
    """Image half of the knowledge block (generate_image_prompts parity,
    generate.py:34-65): images (path, caption, description), entities related
    to them (sources of their '#image*' edges), and the image relations.
    All inputs are reference-capped small frames; collect is the intended
    terminal step (see assemble_context).
    """
    img_rows = (
        images.join(F.broadcast(seed_images.select("path")), "path", "semi")
        .select("path", "caption", "description")
        .orderBy("path")
        .collect()
    )
    images_str = (
        "Images: every image has a path, caption, and a description\n"
        + "\n".join(f"- {r.path}, {r.caption}, {r.description}" for r in img_rows)
        + "\n"
    )
    rel_rows = image_edges.select(
        "source", "target", "label", "description"
    ).orderBy("source", "target", "label").collect()
    ent_names = sorted({r.source for r in rel_rows})
    ent_rows = (
        nodes.filter(F.col("name").isin(ent_names))
        .select("name", "aliases", "description")
        .orderBy("name")
        .collect()
        if ent_names
        else []
    )
    ents_str = (
        "Entities related with the images: every entity has a name, aliases, "
        "and a description\n"
        + "\n".join(
            f"- {e.name}, {list(e.aliases or [])}, {e.description}" for e in ent_rows
        )
        + "\n"
    )
    rels_str = (
        "Image Relations: every image relation has a source, target, label, "
        "and a description\n"
        + "\n".join(
            f"- {r.source}, {r.target}, {r.label}, {r.description}" for r in rel_rows
        )
        + "\n"
    )
    return (
        "The following are the images and their related entities:\n"
        + images_str
        + ents_str
        + rels_str
    )


def expand_seeds(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int = 1,
    max_related: int | None = None,
    src_col: str = "source",
    dst_col: str = "target",
    seed_col: str = "name",
) -> DataFrame:
    """R4 composition: related (non-seed) vertices of the seed set, capped.

    Mirrors search_eris' related-entity set: expansion minus the seeds
    (search.py:309-310) with an optional cap (search.py:312-313).
    """
    related = khop_neighbors(edges, seeds, hops, src_col, dst_col, seed_col).filter(
        F.col("hop") > 0
    )
    if max_related is not None:
        # sort+limit → TakeOrderedAndProject (parallel per-partition top-k),
        # not a single-partition row_number window (VERDICT r1 #2)
        related = related.orderBy(F.asc("hop"), F.asc("name")).limit(max_related)
    return related
