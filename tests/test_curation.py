"""Training-data curation operators (operators/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mmkg_rag_spark.operators import curation


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-cur")


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different words nothing shared here at all ok"),
            (3, "quick brown fox jumps over repeated in this doc too yes"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over the fence")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_hits for r in curation.decontaminate(docs, bench, n=5).collect()}
    assert 1 in out and 3 in out and 2 not in out
    assert out[1] >= 1  # shares "the quick brown fox jumps" etc.


def test_assign_shards_matches_naive_cumsum(spark):
    """Two-phase distributed prefix sum ≡ the naive global window, including
    across bucket boundaries (bucket_size smaller than the doc count)."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (7 + i % 13))) for i in range(200)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.shard_id)
        for r in curation.assign_shards(
            docs, shard_tokens=50, bucket_size=16
        ).collect()
    }
    cum = 0
    for i in range(200):
        n = 7 + i % 13
        assert out[i] == (n, cum // 50), f"doc {i}"
        cum += n
    # shards are contiguous runs in doc_id order
    shards = [out[i][1] for i in range(200)]
    assert shards == sorted(shards)


def test_assign_shards_string_ids(spark):
    """VERDICT r2 #5: non-numeric doc ids (urls, uuids) must pack
    identically to the naive global cumsum in lexicographic id order,
    including across prefix-bucket boundaries."""
    ids = [f"doc-{i:06d}" for i in range(200)]
    docs = spark.createDataFrame(
        [(d, " ".join(["w"] * (7 + i % 13))) for i, d in enumerate(ids)],
        "doc_id string, text string",
    )
    # prefix_len=8 → buckets 'doc-0000'..'doc-0001' etc (several boundaries)
    out = {
        r.doc_id: (r.n_tokens, r.shard_id)
        for r in curation.assign_shards(
            docs, shard_tokens=50, bucket_prefix_len=8
        ).collect()
    }
    cum = 0
    for i, d in enumerate(sorted(ids)):
        n = 7 + ids.index(d) % 13
        assert out[d] == (n, cum // 50), f"doc {d}"
        cum += n


def test_scrub_pii_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@sub.example.org and bob@ex.io now"),
            (2, "call 555-123-4567 or visit 192.168.0.1 please"),
            (3, "clean text with no personal information at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in curation.scrub_pii(docs).collect()}
    assert rows[1].n_email == 2 and "<EMAIL>" in rows[1].scrubbed
    assert "alice" not in rows[1].scrubbed
    assert rows[2].n_phone == 1 and rows[2].n_ipv4 == 1
    assert "<PHONE>" in rows[2].scrubbed and "<IP>" in rows[2].scrubbed
    assert rows[3].scrubbed == rows[3].text
    assert (rows[3].n_email, rows[3].n_phone, rows[3].n_ipv4) == (0, 0, 0)


def test_asof_join_semantics(spark):
    """kdb/DuckDB ASOF semantics: latest right row at-or-before each left
    row per key; equal timestamps match (inclusive); no prior row → NULL."""
    from mmkg_rag_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [
            (1, 100, 5), (1, 101, 10), (1, 102, 20), (1, 103, 30),
            (2, 200, 7),
        ],
        "user_id long, event_id long, ts long",
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (1, 25, 2.5), (2, 99, 9.0)],
        "user_id long, ts long, purchase_value double",
    )
    out = {
        r.event_id: r.purchase_value
        for r in asof_join(
            left, right, key_cols=["user_id"], value_cols=["purchase_value"]
        ).collect()
    }
    assert out[100] is None          # ts=5: no purchase yet
    assert out[101] == 1.0           # ts=10: equal timestamp matches
    assert out[102] == 2.0           # ts=20 (not the later 25)
    assert out[103] == 2.5           # ts=30: latest prior
    assert out[200] is None          # other key, purchase at 99 > 7


def test_asof_join_null_values_and_row_consistency(spark):
    """DuckDB/kdb contract: ALL values (including NULLs) come from the
    single latest matching right row — a legitimately-NULL right value must
    not be skipped for an older non-null row, and two value columns must
    never mix values from different right rows."""
    from mmkg_rag_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100, 30), (1, 101, 50)],
        "user_id long, event_id long, ts long",
    )
    right = spark.createDataFrame(
        [
            (1, 10, 1.0, "a"),
            (1, 20, None, "b"),   # latest at ts≤30: value NULL, tag "b"
            (1, 40, 4.0, None),   # latest at ts≤50: value 4.0, tag NULL
        ],
        "user_id long, ts long, purchase_value double, tag string",
    )
    out = {
        r.event_id: (r.purchase_value, r.tag)
        for r in asof_join(
            left,
            right,
            key_cols=["user_id"],
            value_cols=["purchase_value", "tag"],
        ).collect()
    }
    assert out[100] == (None, "b")   # NULL carried, not older 1.0/"a"
    assert out[101] == (4.0, None)   # both values from the SAME row


def _sample_docs(spark, n=400, parts=1):
    rows = [(i, f"s{i % 4}", "tok " * (5 + i % 7)) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).repartition(parts)


def test_uniform_ppm_partition_invariant(spark):
    """The hash draw is a pure row function — identical on any layout
    (unlike rand(seed), whose stream depends on the physical split)."""
    a = _sample_docs(spark, parts=1).select(
        "doc_id", curation.uniform_ppm("doc_id").alias("d"))
    b = _sample_docs(spark, parts=7).select(
        "doc_id", curation.uniform_ppm("doc_id").alias("d"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sample_stratified_rates_and_stability(spark):
    docs = _sample_docs(spark, n=2000)
    out = curation.sample_stratified(
        docs, {"s0": 1_000_000, "s1": 500_000, "s2": 0}, default_ppm=250_000
    )
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by.get("s0") == 500            # rate 1.0 keeps everything
    assert by.get("s2") is None           # rate 0 keeps nothing
    assert 150 < by.get("s1", 0) < 350    # ~250 expected
    assert 60 < by.get("s3", 0) < 190     # default ~125

    # superset stability: decisions for existing ids never change
    small = curation.sample_stratified(
        _sample_docs(spark, n=1000),
        {"s0": 1_000_000, "s1": 500_000, "s2": 0}, default_ppm=250_000)
    kept_small = {r["doc_id"] for r in small.select("doc_id").collect()}
    kept_big = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept_small == {i for i in kept_big if i < 1000}


def test_sample_stratified_is_map_only(spark):
    docs = spark.createDataFrame(
        [(1, "s0", "a b c")], "doc_id long, source string, text string"
    )
    out = curation.sample_stratified(docs, {"s0": 500_000})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mixture_plan_budget_math(spark):
    docs = spark.createDataFrame(
        [(1, "a", "t " * 100), (2, "a", "t " * 100),   # a: 200 tokens
         (3, "b", "t " * 10)],                          # b: 10 tokens
        "doc_id long, source string, text string",
    )
    plan = {r["stratum"]: r for r in
            curation.plan_mixture(docs, budget_tokens=50).collect()}
    assert plan["a"]["rate_ppm"] == 250_000       # 50/200
    assert plan["b"]["rate_ppm"] == 1_000_000     # under budget: keep all
    out = curation.sample_mixture(docs, budget_tokens=50)
    assert {r["doc_id"] for r in out.where("source = 'b'").collect()} == {3}


def test_sample_mixture_broadcasts_plan(spark):
    out = curation.sample_mixture(_sample_docs(spark), budget_tokens=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
