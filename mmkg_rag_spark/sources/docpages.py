"""Adapter: driver testdata ``documents`` table → engine ``pages`` table.

The driver's synthetic ``documents`` text is vocabulary salad with no KG
structure, so the KG pipeline is exercised on pages *derived deterministically
from its doc_ids*: each documents row contributes the planted-grammar page
``sources/pages.page_record(doc_id)`` (same generator the pytest e2e gate
uses), with html rendered so the byte-identical html→text invariant is
exercised end to end. Pure function of doc_id ⇒ reproducible across engines,
rounds, and parallelism levels.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .pages import PAGES_SCHEMA, image_manifest, page_record, render_html


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One planted-grammar page per documents.doc_id (distributed map)."""
    doc_ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id in pdf["doc_id"]:
                r = page_record(int(doc_id))
                r["html"] = render_html(r["url"], r["text"])
                recs.append(r)
            yield pd.DataFrame(recs, columns=["url", "warc_ts", "html", "text", "lang"])

    return doc_ids.mapInPandas(gen, schema=PAGES_SCHEMA)


def manifest_df(spark: SparkSession) -> DataFrame:
    """The asset-manifest table for the M2 existence semi-join."""
    return spark.createDataFrame([(p,) for p in image_manifest()], "path string")
