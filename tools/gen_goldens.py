"""Generate pinned goldens for the genuinely non-SQL queries.

VERDICT r3 item 2 asked for "oracles (or pinned driver-visible goldens)"
for the 8 queries whose semantics SQL cannot recompute (the iterative KG
build + its graph consumers, the native DataSketches HLL estimate, the
rapidfuzz-style retrieval). This tool runs each query at every test SF
and pins the full result set into ``goldens.json`` next to
``__spark_entry__.py``; ``oracle_sql()`` then emits a VALUES-literal twin
keyed on the input table's row count, so the external driver's
hash-compare gate can check these queries like any other.

This is a DETERMINISM/REGRESSION pin, not independent recomputation —
the pytest goldens (tests/test_goldens.py, tests/test_graph.py) remain
the semantic ground truth; this file makes those pins driver-visible.
Regenerate ONLY after an intentional semantic change, with the pytest
goldens updated in the same commit:  python tools/gen_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# query -> the table whose row count keys the golden variant. kg_* derive
# from documents (sf0.001 and sf0.01 share the same 500-doc table, hence
# the same KG); the others vary with their own input table per SF.
GOLDEN_QUERIES = {
    "kg_nodes": "documents",
    "kg_edges": "documents",
    "kg_degree_topk": "documents",
    "kg_pagerank": "documents",
    "kg_communities": "documents",
    "kg_search_eris": "documents",
    "events_distinct_sketch": "events",
    "fuzzy_topk_parts": "part",
}


def main() -> None:
    import __spark_entry__ as se
    from mmkg_rag_spark.session import get_spark

    spark = get_spark(app_name="gen-goldens")
    out: dict[str, dict] = {}
    for name, key_table in GOLDEN_QUERIES.items():
        variants: dict[str, dict] = {}
        for sf_dir in SFS:
            key_n = spark.read.parquet(f"{sf_dir}/{key_table}.parquet").count()
            if str(key_n) in variants:
                continue  # same input table => same result (kg_* at 0.001/0.01)
            df = se.queries()[name](spark, sf_dir)
            rows = [list(r) for r in df.collect()]
            variants[str(key_n)] = {"rows": rows}
            print(f"{name} @ {key_table}={key_n}: {len(rows)} rows")
        out[name] = {
            "key_table": key_table,
            "columns": df.columns,
            "types": [t for _, t in df.dtypes],
            "variants": variants,
        }
    path = os.path.join(REPO, "goldens.json")
    with open(path, "w") as f:
        json.dump(out, f, separators=(",", ":"), default=str)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
