"""Materialization sinks (SURVEY.md §2.5 W1/W2).

- ``write_graph``  : sorted snapshot writes of nodes/edges/images into the
  catalog (reference pipe.py:98-100 global sorts + storage/index.py:50-58
  pickle persistence, re-expressed as sorted partitioned table snapshots;
  on Iceberg the sort becomes the table's sortOrder).
- ``export_eris_jsonl`` : line-JSON export in the reference's exact
  ``origin_str`` field orders — Entity {name,label,description,aliases,
  references} (types/entity.py:40-47) and Relation {source,label,target,
  description,references} (types/relation.py:41-48) — the canonical triple
  schema named by the north star, used for parity diffing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sources.catalog import ParquetCatalog, fingerprint


def write_graph(
    catalog: ParquetCatalog,
    nodes: DataFrame,
    edges: DataFrame,
    input_fp: str,
    images: DataFrame | None = None,
) -> dict[str, str]:
    """Sorted snapshot writes; returns table → snapshot id."""
    out = {}
    snap = fingerprint("graph", input_fp)
    catalog.write(nodes.orderBy("name"), "nodes", snap, meta={"input": input_fp})
    out["nodes"] = snap
    # reference sorts relations by source+target concatenation (pipe.py:99-100)
    catalog.write(
        edges.orderBy(F.concat_ws("", "source", "target")),
        "edges", snap, meta={"input": input_fp},
    )
    out["edges"] = snap
    if images is not None:
        catalog.write(images.orderBy("path"), "images", snap, meta={"input": input_fp})
        out["images"] = snap
    return out


def entity_json(nodes: DataFrame):
    """origin_str-ordered JSON column for entities (entity.py:40-47)."""
    return F.to_json(
        F.struct(
            "name", "label", "description",
            F.coalesce("aliases", F.array()).alias("aliases"),
            F.coalesce("references", F.array()).alias("references"),
        )
    )


def relation_json(edges: DataFrame):
    """origin_str-ordered JSON column for relations (relation.py:41-48)."""
    return F.to_json(
        F.struct(
            "source", "label", "target", "description",
            F.coalesce("references", F.array()).alias("references"),
        )
    )


def export_eris_jsonl(
    nodes: DataFrame, edges: DataFrame, path: str, single_file: bool = True
) -> None:
    """eris.txt analogue (storage/index.py:60-68): one JSON line per record.

    ``single_file`` coalesces for byte-stable parity diffing at test scale;
    leave False for scale runs (one file per partition).
    """
    ents = nodes.orderBy("name").select(entity_json(nodes).alias("line"))
    rels = edges.orderBy(F.concat_ws("", "source", "target")).select(
        relation_json(edges).alias("line")
    )
    out = ents.unionAll(rels)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def read_eris_jsonl(spark, path: str) -> list[str]:
    return [r.value for r in spark.read.text(os.path.join(path)).collect()]
