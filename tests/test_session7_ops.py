"""Session-7 query classes: sorted-neighborhood ER blocking, per-user
time-weighted average, TPC-H Q18-shaped having-join, and the
referential-integrity audit.

Semantics-level invariants on synthetic micro-inputs (exact,
hand-checkable); exact DuckDB oracle parity for all four classes is
covered by tools/check_oracle.py at three SFs.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(
        master="local[4]", shuffle_partitions=8, app_name="pytest-s7ops"
    )


# ------------------------------------------------ snb_candidate_pairs


def test_snb_micro_exact_pairs(spark):
    """Four names whose sorted adjacency and word-set Jaccard are
    hand-checkable: only the two share-a-word adjacent pairs survive."""
    import __spark_entry__ as se

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "alpha bolt"), (2, "alpha ring"), (3, "beta ring"),
             (4, "zeta cog"), (5, "alpha bolt")],  # dup name: dict dedups
            ["p_partkey", "p_name"],
        ).write.parquet(os.path.join(d, "part.parquet"))
        rows = {
            (r.name_a, r.name_b): (r.n_common, r.n_union)
            for r in se.q_snb_candidate_pairs(spark, d).collect()
        }
    assert rows == {
        ("alpha bolt", "alpha ring"): (1, 3),
        ("alpha ring", "beta ring"): (1, 3),
    }


def test_snb_invariants_sf(spark):
    """Window-bounded candidate volume, threshold respected, and pairs
    oriented low-rank -> high-rank (lexicographically a < b)."""
    import __spark_entry__ as se

    out = se.q_snb_candidate_pairs(spark, SF_DIR).collect()
    n_names = (
        spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select("p_name").distinct().count()
    )
    assert 0 < len(out) <= (se.SNB_WINDOW - 1) * n_names
    for r in out:
        assert r.name_a < r.name_b  # rank order == lexicographic order
        assert 3 * r.n_common >= r.n_union
        assert r.n_union >= r.n_common >= 1


# -------------------------------------------- events_time_weighted_avg


def test_twap_micro_exact(spark):
    """v=10 held 10 s then v=20 held 30 s -> TWAP (100+600)/40 = 17.5;
    the final event contributes no interval."""
    import __spark_entry__ as se

    t0 = dt.datetime(2024, 1, 1)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, t0, 7, "view", 10.0, "{}"),
                (2, t0 + dt.timedelta(seconds=10), 7, "view", 20.0, "{}"),
                (3, t0 + dt.timedelta(seconds=40), 7, "view", 99.0, "{}"),
            ],
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        ).write.parquet(os.path.join(d, "events.parquet"))
        [r] = se.q_events_time_weighted_avg(spark, d).collect()
    assert r.user_id == 7
    assert r.n_intervals == 2
    assert r.span_sec == 40
    assert r.twap == pytest.approx(17.5)


def test_twap_weights_differ_from_plain_avg(spark):
    """On the sf corpus the time weighting must actually change the
    answer vs the unweighted mean for at least one user (else the class
    degenerates), and every span is positive."""
    import __spark_entry__ as se

    out = se.q_events_time_weighted_avg(spark, SF_DIR)
    plain = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.avg("value").alias("plain_avg"))
    )
    j = out.join(plain, "user_id").collect()
    assert all(r.span_sec > 0 for r in j)
    assert any(abs(r.twap - r.plain_avg) > 1e-9 for r in j)


# ------------------------------------------------ large_volume_orders


def test_large_volume_orders_micro(spark):
    """Order straddling the threshold: 301 qualifies, 299 does not."""
    import __spark_entry__ as se

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(10, 1, 150.5, 1), (10, 2, 150.5, 2),   # sum 301 > 300
             (11, 1, 299.0, 1)],                      # sum 299: out
            ["l_orderkey", "l_linenumber", "l_quantity", "l_partkey"],
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        spark.createDataFrame(
            [(10, 5, 1234.567), (11, 5, 50.0)],
            ["o_orderkey", "o_custkey", "o_totalprice"],
        ).write.parquet(os.path.join(d, "orders.parquet"))
        spark.createDataFrame(
            [(5, "Customer#5")], ["c_custkey", "c_name"]
        ).write.parquet(os.path.join(d, "customer.parquet"))
        [r] = se.q_large_volume_orders(spark, d).collect()
    assert (r.c_custkey, r.c_name, r.o_orderkey) == (5, "Customer#5", 10)
    assert r.total_qty == pytest.approx(301.0)
    assert r.o_totalprice == pytest.approx(1234.57)


def test_large_volume_orders_threshold_tight(spark):
    """Every emitted order's recomputed quantity exceeds the threshold,
    and no qualifying order is dropped (completeness vs a direct agg)."""
    import __spark_entry__ as se

    out = se.q_large_volume_orders(spark, SF_DIR)
    direct = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > se.QTY_THRESHOLD)
    )
    got = {r.o_orderkey for r in out.collect()}
    want = {r.l_orderkey for r in direct.collect()}
    assert got == want and len(got) > 0


# ------------------------------------------------ ref_integrity_audit


def test_ref_integrity_consistent_corpus(spark):
    """The synthetic star schema is referentially consistent: zero
    orphans on every edge; the events->customer edge has exactly
    |customer| - |distinct users| unused keys."""
    import __spark_entry__ as se

    rows = {r.relation: r for r in
            se.q_ref_integrity_audit(spark, SF_DIR).collect()}
    assert len(rows) == len(se._FK_RELATIONS)
    assert all(r.orphan_keys == 0 for r in rows.values())
    ev = rows["events.user_id->customer.c_custkey"]
    n_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id").distinct().count()
    )
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert ev.n_fk_keys == n_users
    assert ev.unused_keys == n_cust - n_users


def test_ref_integrity_detects_planted_violations(spark):
    """Planted orphan FK and unused dim key are both counted."""
    import __spark_entry__ as se

    t0 = dt.datetime(2024, 1, 1)
    with tempfile.TemporaryDirectory() as d:
        def w(name, rows, cols):
            spark.createDataFrame(rows, cols).write.parquet(
                os.path.join(d, f"{name}.parquet"))

        w("region", [(0,)], ["r_regionkey"])
        w("nation", [(0, 0)], ["n_nationkey", "n_regionkey"])
        w("customer", [(1, 0), (2, 0)], ["c_custkey", "c_nationkey"])
        w("supplier", [(1, 0), (9, 0)], ["s_suppkey", "s_nationkey"])
        w("part", [(1,)], ["p_partkey"])
        w("orders", [(10, 1)], ["o_orderkey", "o_custkey"])
        # l_partkey=77 is an orphan; supplier 9 is never referenced
        w("lineitem", [(10, 77, 1)],
          ["l_orderkey", "l_partkey", "l_suppkey"])
        w("events", [(1, t0, 1)], ["event_id", "ts", "user_id"])
        rows = {r.relation: r for r in
                se.q_ref_integrity_audit(spark, d).collect()}
    assert rows["lineitem.l_partkey->part.p_partkey"].orphan_keys == 1
    assert rows["lineitem.l_partkey->part.p_partkey"].unused_keys == 1
    assert rows["lineitem.l_suppkey->supplier.s_suppkey"].unused_keys == 1
    assert rows["orders.o_custkey->customer.c_custkey"].unused_keys == 1
    assert rows["nation.n_regionkey->region.r_regionkey"].orphan_keys == 0


# ------------------------------------------- events_value_quantile_sketch


def test_quantile_sketch_micro_exact(spark):
    """Hand-computed histogram: values 1.0 x4, 2.0 x4, 10.0 x2 ->
    bins 4/8/40, cum 4/8/10; p50 lands in bin 8 with 1/4 in-bin offset."""
    import __spark_entry__ as se

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    vals = [1.0] * 4 + [2.0] * 4 + [10.0] * 2
    for i, v in enumerate(vals):
        rows.append((i, t0 + dt.timedelta(seconds=i), 1, "view", v, "{}"))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r.event_type: r for r in
               se.q_events_value_quantile_sketch(spark, d).collect()}
    for k in ("view", "__all__"):
        r = out[k]
        assert r.n_events == 10
        assert r.p50 == pytest.approx(2.0625)
        assert r.p90 == pytest.approx(10.125)
        assert r.p99 == pytest.approx(10.25)


def test_quantile_sketch_merge_property(spark):
    """__all__ must equal the sketch of the union of the per-type
    registers — recompute it independently by re-binning all events."""
    import __spark_entry__ as se

    out = {r.event_type: r for r in
           se.q_events_value_quantile_sketch(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    assert out["__all__"].n_events == n
    assert sum(r.n_events for t, r in out.items() if t != "__all__") == n
    # quantile estimates bracket the exact quantiles within one bin width
    exact = ev.selectExpr(
        "percentile(value, 0.5) AS p50", "percentile(value, 0.99) AS p99"
    ).collect()[0]
    assert abs(out["__all__"].p50 - exact.p50) <= 0.25
    assert abs(out["__all__"].p99 - exact.p99) <= 0.25
    # quantile monotonicity holds for every group
    for r in out.values():
        assert r.p50 <= r.p90 <= r.p99


# ------------------------------------------------ events_type_dow_chisq


def test_chisq_single_type_zero(spark):
    """With one event_type the table is degenerate: every cell has
    observed == column total, so every contribution is exactly 0."""
    import __spark_entry__ as se

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(days=i % 3), 1, "view", 1.0, "{}")
            for i in range(9)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = se.q_events_type_dow_chisq(spark, d).collect()
    assert len(out) == 3
    for r in out:
        assert r.chisq_contrib == 0.0
        assert r.expected_milli == r.observed * 1000


def test_chisq_sf_invariants(spark):
    """Observed counts re-sum to N; expected counts re-sum to ~N
    (exact integer-milli truncation loses < 1 per cell)."""
    import __spark_entry__ as se

    out = se.q_events_type_dow_chisq(spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r.observed for r in out) == n
    exp_sum = sum(r.expected_milli for r in out) / 1000
    assert n - len(out) / 1000 <= exp_sum <= n
    assert all(r.chisq_contrib >= 0 for r in out)
    assert all(0 <= r.dow <= 6 for r in out)


# ------------------------------------------------ region_nation_rollup


def test_rollup_hierarchy_consistency(spark):
    """Detail rows re-aggregate to region subtotals, subtotals to the
    grand total; gid encodes the grouping level (0 detail, 1 region
    subtotal, 3 grand total)."""
    import __spark_entry__ as se

    out = se.q_region_nation_rollup(spark, SF_DIR).collect()
    detail = [r for r in out if r.gid == 0]
    sub = {r.r_name: r for r in out if r.gid == 1}
    [grand] = [r for r in out if r.gid == 3]
    assert {r.gid for r in out} == {0, 1, 3}
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert grand.n_orders == n_orders
    assert sum(r.n_orders for r in detail) == n_orders
    for rn, s in sub.items():
        assert s.n_orders == sum(
            r.n_orders for r in detail if r.r_name == rn
        )
        assert s.revenue == pytest.approx(
            sum(r.revenue for r in detail if r.r_name == rn), abs=0.05
        )


# ------------------------------------- TPC-H Q7/Q9/Q14/Q15/Q19 shapes


def test_volume_shipping_both_directions(spark):
    """The nation-pair filter must keep BOTH directions and nothing
    else; item counts re-sum to a direct count of cross-pair items."""
    import __spark_entry__ as se

    out = se.q_nation_volume_shipping(spark, SF_DIR).collect()
    dirs = {(r.supp_nation, r.cust_nation) for r in out}
    a, b = se._Q7_NATIONS
    assert dirs == {(a, b), (b, a)}
    assert all(r.revenue > 0 and r.n_items > 0 for r in out)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    s = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    direct = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n.selectExpr("n_nationkey as sk", "n_name as sn"),
              F.col("s_nationkey") == F.col("sk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n.selectExpr("n_nationkey as ck", "n_name as cn"),
              F.col("c_nationkey") == F.col("ck"))
        .filter(F.col("sn").isin(a, b) & F.col("cn").isin(a, b)
                & (F.col("sn") != F.col("cn")))
        .count()
    )
    assert sum(r.n_items for r in out) == direct


def test_nation_profit_totals(spark):
    """Group profits re-sum to the global profit under the same exact
    decimal cost model (order-independence of the decimal sums)."""
    import __spark_entry__ as se

    out = se.q_nation_profit(spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    cost = (
        F.col("l_quantity").cast("decimal(12,2)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit(0.1).cast("decimal(2,1)")
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )
    [g] = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(F.sum(rev - cost).cast("double").alias("total"))
        .collect()
    )
    assert sum(r.profit for r in out) == pytest.approx(g.total, abs=0.05)
    # every (nation, year) group is present exactly once
    assert len({(r.nation, r.l_year) for r in out}) == len(out)


def test_promo_share_bounds_and_one_month(spark):
    """Share within [0, 100]; one month recomputed directly."""
    import __spark_entry__ as se

    out = {r.ym: r for r in
           se.q_promo_revenue_share(spark, SF_DIR).collect()}
    assert all(0 <= r.promo_share_pct <= 100 for r in out.values())
    ym0 = sorted(out)[1]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    j = li.join(p, li.l_partkey == p.p_partkey).filter(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")) == ym0
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    [d] = j.agg(
        (F.lit(100)
         * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
         / F.sum(rev)).alias("share")
    ).collect()
    assert out[ym0].promo_share_pct == pytest.approx(d.share, abs=1e-3)


def test_top_supplier_is_argmax(spark):
    """Winners are exactly the argmax set of the direct per-supplier
    quarterly revenue aggregate."""
    import __spark_entry__ as se

    out = se.q_top_supplier_revenue(spark, SF_DIR).collect()
    assert len(out) >= 1
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit(se._Q15_FROM))
        & (F.col("l_shipdate") < F.lit(se._Q15_TO))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per = {r.l_suppkey: r.rev for r in
           li.groupBy("l_suppkey").agg(F.sum(rev).alias("rev")).collect()}
    mx = max(per.values())
    want = {k for k, v in per.items() if v == pytest.approx(mx, rel=1e-12)}
    assert {r.s_suppkey for r in out} == want
    for r in out:
        assert r.total_revenue == pytest.approx(mx, abs=0.01)


def test_disjunctive_filter_matches_direct(spark):
    """The OR-branch revenue equals a direct recompute; each branch
    contributes only rows satisfying its own conjunction."""
    import __spark_entry__ as se

    [r] = se.q_disjunctive_filter_revenue(spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    j = li.join(p, li.l_partkey == p.p_partkey)
    q, sz, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((b == "Brand#1") & sz.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#2") & sz.between(5, 20) & q.between(10, 30))
        | ((b == "Brand#3") & sz.between(20, 40) & q.between(20, 50))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    [d] = j.filter(cond).agg(
        F.sum(rev).alias("rev"), F.count(F.lit(1)).alias("n")
    ).collect()
    assert r.n_items == d.n and d.n > 0
    assert r.revenue == pytest.approx(d.rev, abs=0.05)


# ----------------------------------------- Q8 / Q16 shapes


def test_market_share_bounds_and_direct(spark):
    """Share within [0,100]; numerator and denominator recomputed
    directly for one year."""
    import __spark_entry__ as se

    out = {r.l_year: r for r in
           se.q_nation_market_share(spark, SF_DIR).collect()}
    assert len(out) > 0
    assert all(0 <= r.mkt_share_pct <= 100 for r in out.values())
    y0 = sorted(out)[1]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    s = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    n = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    r_ = spark.read.parquet(f"{SF_DIR}/region.parquet")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n.selectExpr("n_nationkey as ck", "n_regionkey as crk"),
              F.col("c_nationkey") == F.col("ck"))
        .join(r_, F.col("crk") == r_.r_regionkey)
        .filter(F.col("r_name") == se._Q8_REGION)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n.selectExpr("n_nationkey as sk", "n_name as sn"),
              F.col("s_nationkey") == F.col("sk"))
        .filter(F.year("l_shipdate") == y0)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    [d] = j.agg(
        F.sum(rev).alias("tr"),
        F.sum(F.when(F.col("sn") == se._Q8_NATION, rev).otherwise(0.0))
        .alias("nr"),
    ).collect()
    assert out[y0].total_revenue == pytest.approx(d.tr, abs=0.05)
    assert out[y0].mkt_share_pct == pytest.approx(
        100 * d.nr / d.tr, abs=1e-3)


def test_parts_supplier_count_excludes_blacklist(spark):
    """Counts match a direct distinct-pair recompute and blacklisted
    suppliers (names ending '7') never contribute."""
    import __spark_entry__ as se

    out = {(r.p_brand, r.p_type, r.p_size): r.supplier_cnt
           for r in se.q_parts_supplier_count(spark, SF_DIR).collect()}
    assert len(out) > 0
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    s = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    bad = {r.s_suppkey for r in
           s.filter(F.col("s_name").endswith("7")).collect()}
    pairs = (
        li.select("l_suppkey", "l_partkey").distinct()
        .join(p, F.col("l_partkey") == p.p_partkey)
        .filter((F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
                & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .collect()
    )
    want = {}
    for r in pairs:
        if r.l_suppkey in bad:
            continue
        k = (r.p_brand, r.p_type, r.p_size)
        want.setdefault(k, set()).add(r.l_suppkey)
    assert out == {k: len(v) for k, v in want.items()}


# --------------------------------------------- pack_training_sequences


def test_pack_sequences_micro_exact(spark):
    """Three docs of 3/4/2 tokens at L=4: hand-computed spans including
    a doc that straddles a sequence boundary."""
    from mmkg_rag_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, "h i")],
        ["doc_id", "text"],
    )
    rows = {(r.seq_id, r.doc_id): (r.doc_offset, r.n_span)
            for r in pack_sequences(docs, 4).collect()}
    # stream: doc1 [0,3) doc2 [3,7) doc3 [7,9); seqs of 4: [0,4) [4,8) [8,12)
    assert rows == {
        (0, 1): (0, 3),   # doc1 fully in seq0
        (0, 2): (0, 1),   # doc2 first token completes seq0
        (1, 2): (1, 3),   # doc2 rest in seq1
        (1, 3): (0, 1),   # doc3 first token completes seq1
        (2, 3): (1, 1),   # doc3 last token starts seq2
    }


def test_pack_sequences_invariants_sf(spark):
    """Lineage is complete and consistent: per-doc spans re-sum to the
    doc's token count, every sequence except the last is exactly full,
    and offsets tile each document without gaps."""
    import __spark_entry__ as se
    from mmkg_rag_spark.functions.textstats import token_count

    out = se.q_pack_training_sequences(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    want = {r.doc_id: r.n for r in docs.select(
        "doc_id", token_count(F.col("text")).alias("n")).collect()
        if r.n > 0}
    got_per_doc = {}
    for r in out:
        got_per_doc.setdefault(r.doc_id, []).append((r.doc_offset, r.n_span))
    assert set(got_per_doc) == set(want)
    for d, spans in got_per_doc.items():
        spans.sort()
        assert sum(n for _, n in spans) == want[d]
        # spans tile the document: each starts where the previous ended
        pos = 0
        for off, n in spans:
            assert off == pos and n > 0
            pos += n
    per_seq = {}
    for r in out:
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.n_span
    last = max(per_seq)
    for s, n in per_seq.items():
        assert n == se.SEQ_LEN if s != last else 0 < n <= se.SEQ_LEN


# --------------------------------------- shipment_lateness_by_priority


def test_lateness_micro_exact(spark):
    """One order with a 91-day-late item and an on-time item: exact
    counts and rate; the >90 boundary is exclusive."""
    import __spark_entry__ as se

    t0 = dt.datetime(2024, 1, 1)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(10, t0 + dt.timedelta(days=91)),   # late
             (10, t0 + dt.timedelta(days=90)),   # exactly 90: NOT late
             (10, t0 + dt.timedelta(days=1))],
            ["l_orderkey", "l_shipdate"],
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        spark.createDataFrame(
            [(10, 1, t0, "2-HIGH")],
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        ).write.parquet(os.path.join(d, "orders.parquet"))
        [r] = se.q_shipment_lateness_by_priority(spark, d).collect()
    assert (r.o_orderpriority, r.n_items, r.n_late) == ("2-HIGH", 3, 1)
    assert r.late_rate == pytest.approx(round(1 / 3, 4))


def test_lateness_sf_invariants(spark):
    """All five priorities present; counts re-sum to |lineitem| and the
    late split re-derives from a direct recompute."""
    import __spark_entry__ as se

    out = {r.o_orderpriority: r for r in
           se.q_shipment_lateness_by_priority(spark, SF_DIR).collect()}
    assert len(out) == 5
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert sum(r.n_items for r in out.values()) == li.count()
    direct = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.datediff(F.col("l_shipdate").cast("date"),
                           F.col("o_orderdate").cast("date"))
                > se.LATE_DAYS)
        .count()
    )
    assert sum(r.n_late for r in out.values()) == direct
    assert all(0 <= r.late_rate <= 1 for r in out.values())


# ------------------------------------------- sql_round_spark semantics


def test_sql_round_spark_matches_spark_round(spark):
    """Spark rounds a double on its SHORTEST DECIMAL REPR (HALF_UP via
    BigDecimal.valueOf); DuckDB rounds the exact binary value. The
    oracle helper must reproduce Spark on the divergent cases found
    live (repr-tie 0.53275 whose binary value is below the tie) and on
    near-tie reprs a too-small DECIMAL scale would re-round."""
    import struct

    import duckdb

    from mmkg_rag_spark.functions.textstats import sql_round_spark

    cases = [
        struct.unpack(">d", bytes.fromhex("3fe10c49ba5e353f"))[0],  # 0.53275
        0.6347499999999999,
        0.6077499999999999,
        0.03125,       # exactly representable tie
        0.8125, 0.125, 0.0, 1.0, 0.47110000001, 0.0005,
    ]
    df = spark.createDataFrame([(v,) for v in cases], ["x"])
    got_spark = [r.y for r in
                 df.select(F.round("x", 4).alias("y")).collect()]
    got_duck = [
        duckdb.sql(
            f"SELECT {sql_round_spark(f'CAST({v!r} AS DOUBLE)', 4)}"
        ).fetchone()[0]
        for v in cases
    ]
    assert got_spark == got_duck
