"""WARC/WET source: round-trip, gzip layouts, record skipping, lang fallback."""

from __future__ import annotations

import datetime as dt
import gzip
import io

import pytest

from mmkg_rag_spark.sources import pages, warc


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-warc")


@pytest.fixture(scope="module")
def page_rows():
    return pages.gen_pages_local(30)


def _parse_all(blob: bytes, **kw):
    return list(warc.iter_warc_records(io.BytesIO(blob), **kw))


def test_record_roundtrip_three_gzip_layouts(page_rows):
    """Per-member gzip (Common Crawl layout), whole-file gzip, and plain
    bytes all parse to the identical record sequence."""
    per_member = warc.write_warc(page_rows)
    plain = warc.write_warc(page_rows, gzip_per_member=False)
    whole = gzip.compress(plain)
    seqs = [_parse_all(b) for b in (per_member, plain, whole)]
    assert all(len(s) == len(seqs[0]) for s in seqs)
    for recs in zip(*seqs):
        assert all(r == recs[0] for r in recs)
    # warcinfo + (request + response) per page
    types = [h["warc-type"] for h, _ in seqs[0]]
    assert types[0] == "warcinfo"
    assert types.count("response") == len(page_rows)
    assert types.count("request") == len(page_rows)


def test_http_payload_preserves_html_bytes(page_rows):
    recs = _parse_all(warc.write_warc(page_rows))
    bodies = [
        warc._http_payload(block)
        for h, block in recs
        if h["warc-type"] == "response"
    ]
    assert bodies == [bytes(r["html"]) for r in page_rows]


def test_read_warc_matches_pages_table(spark, page_rows, tmp_path_factory):
    """Spark read of a fixture archive reproduces url/ts/html/text exactly;
    the synthetic inverse extractor fires (north-star byte-identity)."""
    d = tmp_path_factory.mktemp("warc")
    # two archive files -> two input tasks
    (d / "part-0.warc.gz").write_bytes(warc.write_warc(page_rows[:17]))
    (d / "part-1.warc.gz").write_bytes(warc.write_warc(page_rows[17:]))
    out = warc.read_warc(spark, str(d / "*.warc.gz")).orderBy("url").collect()
    want = sorted(page_rows, key=lambda r: r["url"])
    assert len(out) == len(want)
    for got, src in zip(out, want):
        assert got.url == src["url"]
        assert got.warc_ts == src["warc_ts"].replace(tzinfo=None)
        assert bytes(got.html) == bytes(src["html"])
        assert got.text == src["text"]  # byte-identical extraction
        assert got.lang == "en"  # no header -> detector (FILLER is English)


def test_read_warc_directory_path(spark, page_rows, tmp_path):
    """A bare directory expands to its *.warc*/*.wet* members (mixed
    formats), instead of raising IsADirectoryError inside a task."""
    (tmp_path / "a.warc.gz").write_bytes(warc.write_warc(page_rows[:3]))
    (tmp_path / "b.wet").write_bytes(warc.write_wet(page_rows[3:5]))
    (tmp_path / "notes.txt").write_text("ignored")
    out = warc.read_warc(spark, str(tmp_path)).orderBy("url").collect()
    assert sorted(r.url for r in out) == sorted(
        r["url"] for r in page_rows[:5]
    )


def test_read_wet_lang_header_wins(spark, page_rows, tmp_path):
    rows = [dict(r, lang="de") for r in page_rows[:5]]
    p = tmp_path / "a.warc.wet.gz"
    p.write_bytes(warc.write_wet(rows))
    out = warc.read_warc(spark, str(p)).orderBy("url").collect()
    assert [r.lang for r in out] == ["de"] * 5  # header beats detector
    assert all(r.html is None for r in out)
    assert sorted(r.text for r in out) == sorted(r["text"] for r in rows[:5])


def test_strip_html_generic_fallback():
    wild = (
        b"<html><head><style>p{color:red}</style>"
        b"<script>var x = '<p>not text</p>';</script></head>"
        b"<body><h1>Title</h1><p>Alpha &amp; beta<br>gamma</p>"
        b"<div>Delta</div></body></html>"
    )
    text = warc.extract_text(wild)
    assert "Title" in text and "Alpha & beta\ngamma" in text and "Delta" in text
    assert "color" not in text and "not text" not in text


def test_lenient_stops_on_truncation(page_rows):
    blob = warc.write_warc(page_rows[:3], gzip_per_member=False)
    cut = blob[: len(blob) - len(blob) // 4]
    with pytest.raises(Exception):
        _parse_all(cut)
    recs = _parse_all(cut, lenient=True)
    assert 0 < len(recs) < 7  # parsed the intact prefix, stopped quietly


def test_header_case_and_nonseekable_stream(page_rows):
    blob = warc.write_warc(page_rows[:2]).replace(b"WARC-Type", b"wArC-tYpE")

    class NoSeek(io.RawIOBase):
        def __init__(self, b):
            self._b = io.BytesIO(b)

        def readable(self):
            return True

        def readinto(self, buf):
            data = self._b.read(len(buf))
            buf[: len(data)] = data
            return len(data)

    recs = list(warc.iter_warc_records(io.BufferedReader(NoSeek(blob))))
    assert [h["warc-type"] for h, _ in recs].count("response") == 2


def test_warc_date_fractional_seconds():
    ts = warc.parse_warc_date("2025-03-01T12:34:56.123456Z")
    assert ts == dt.datetime(
        2025, 3, 1, 12, 34, 56, 123456, tzinfo=dt.timezone.utc
    )


def test_kg_build_from_warc_equals_synthetic(spark, tmp_path_factory):
    """`run.py --warc` produces the same graph as the synthetic generator
    over the same 30 pages: WARC round-trips carry the full KG pipeline."""
    import io as _io
    from contextlib import redirect_stdout

    from mmkg_rag_spark.run import main

    d = tmp_path_factory.mktemp("warc-e2e")
    (d / "crawl.warc.gz").write_bytes(warc.write_warc(pages.gen_pages_local(30)))

    def summary(args):
        buf = _io.StringIO()
        with redirect_stdout(buf):
            assert main(args + ["--master", "local[4]"]) == 0
        lines = buf.getvalue().splitlines()
        return lines[lines.index("top degrees:") - 1 :]

    wh1 = str(tmp_path_factory.mktemp("wh-warc"))
    wh2 = str(tmp_path_factory.mktemp("wh-gen"))
    s_warc = summary(["--warc", str(d / "crawl.warc.gz"), "--warehouse", wh1])
    s_gen = summary(["--n-docs", "30", "--warehouse", wh2])
    assert s_warc == s_gen  # identical node/edge counts and degree ranking


def test_export_warc_cdx_roundtrip_and_ranged_fetch(spark, page_rows, tmp_path_factory):
    """Distributed export mirrors the reader; CDX offsets support ranged
    record fetch; the CDXJ file is globally sorted on (surt, ts)."""
    import json

    d = str(tmp_path_factory.mktemp("warc-out"))
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], "en") for r in page_rows],
        pages.PAGES_SCHEMA,
    ).repartition(3)
    cdx = warc.export_warc(df, d).cache()
    rows = cdx.collect()
    assert len(rows) == len(page_rows)
    assert len({r.filename for r in rows}) == 3  # one archive per partition

    # reader round-trip over the exported archives
    back = warc.read_warc(spark, d + "/*.warc.gz").orderBy("url").collect()
    want = sorted(page_rows, key=lambda r: r["url"])
    assert [b.url for b in back] == [w["url"] for w in want]
    assert all(bytes(b.html) == bytes(w["html"]) for b, w in zip(back, want))
    assert all(b.text == w["text"] for b, w in zip(back, want))

    # ranged fetch: every CDX row resolves to its exact record
    for r in rows[:5]:
        headers, block = warc.fetch_record(d, r)
        assert headers["warc-target-uri"] == r.url
        assert warc._http_payload(block) == bytes(
            next(w for w in page_rows if w["url"] == r.url)["html"]
        )

    # sorted CDXJ artifact
    idx = d + "/index.cdxj"
    warc.write_cdx(cdx, idx)
    lines = open(idx).read().splitlines()
    assert len(lines) == len(page_rows)
    keys = [(ln.split(" ", 2)[0], ln.split(" ", 2)[1]) for ln in lines]
    assert keys == sorted(keys)
    meta = json.loads(lines[0].split(" ", 2)[2])
    assert set(meta) == {"url", "digest", "offset", "length", "filename"}
    assert meta["digest"].startswith("sha1:")

    # distributed shards: concatenation in index order == the single file
    shard_dir = d + "/cdx-shards"
    index = warc.write_cdx_sharded(cdx, shard_dir, shards=4)
    assert index == json.load(open(shard_dir + "/index.json"))
    cat = []
    for m in index:
        cat.extend(open(f"{shard_dir}/{m['filename']}").read().splitlines())
    assert cat == lines
    # boundary index routes lookups: shard ranges are ordered and disjoint
    assert all(m["first_key"] <= m["last_key"] for m in index)
    bounds = [k for m in index for k in (m["first_key"], m["last_key"])]
    assert bounds == sorted(bounds)
    assert sum(m["n"] for m in index) == len(page_rows)


def test_read_cdx_and_distributed_selective_fetch(
    spark, page_rows, tmp_path_factory
):
    """read_cdx parses CDXJ shards back to the exact export frame; a
    filtered index drives fetch_pages_by_cdx to range-read ONLY the
    selected records, byte-identical to the source pages."""
    d = str(tmp_path_factory.mktemp("warc-cdxread"))
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], "en") for r in page_rows],
        pages.PAGES_SCHEMA,
    ).repartition(3)
    cdx = warc.export_warc(df, d).cache()
    warc.write_cdx_sharded(cdx, d + "/cdx-shards", shards=4)

    back = warc.read_cdx(spark, d + "/cdx-shards")
    want = sorted(
        (r.surt_key, r.warc_ts, r.url, r.digest, r.offset, r.length, r.filename)
        for r in cdx.collect()
    )
    got = sorted(
        (r.surt_key, r.warc_ts, r.url, r.digest, r.offset, r.length, r.filename)
        for r in back.collect()
    )
    assert got == want

    # selective fetch: filter the index to a URL subset, fetch only those
    pick = sorted({r["url"] for r in page_rows})[::3]
    sel = back.filter(back["url"].isin(pick))
    fetched = (
        warc.fetch_pages_by_cdx(spark, d, sel).orderBy("url").collect()
    )
    src = {r["url"]: r for r in page_rows}
    assert [f.url for f in fetched] == pick
    for f in fetched:
        assert bytes(f.html) == bytes(src[f.url]["html"])
        assert f.text == src[f.url]["text"]
        assert f.warc_ts == src[f.url]["warc_ts"].replace(tzinfo=None)
        assert f.lang == "en"  # detector fallback (export drops lang)


def test_surt_keys_cluster_by_site():
    assert warc.surt("https://ex3.test/doc/5") == "test,ex3)/doc/5"
    assert warc.surt("http://A.B.example.ORG/x?q=1") == "org,example,b,a)/x?q=1"
    assert warc.surt("https://host.test") == "test,host)/"


def test_ingest_warc_incremental_manifest_diff(spark, page_rows, tmp_path_factory):
    """File-level auto-loader: only new archives parse; no-op when the
    inventory is fully ingested; snapshots union to the full table."""
    from mmkg_rag_spark.sources.catalog import ParquetCatalog

    d = tmp_path_factory.mktemp("warc-inc")
    wh = str(tmp_path_factory.mktemp("wh-inc"))
    catalog = ParquetCatalog(spark, wh)
    (d / "a.warc.gz").write_bytes(warc.write_warc(page_rows[:10]))
    (d / "b.warc.gz").write_bytes(warc.write_warc(page_rows[10:20]))

    glob_pat = str(d / "*.warc.gz")
    new1, all1, n1 = warc.ingest_warc(spark, catalog, glob_pat)
    assert n1 == 2 and new1.count() == 20 and all1.count() == 20

    # no-op call: nothing new, no extra snapshot
    new2, all2, n2 = warc.ingest_warc(spark, catalog, glob_pat)
    assert n2 == 0 and new2 is None and all2.count() == 20
    assert len(catalog.snapshots("pages_warc")) == 1

    # a third archive arrives: only IT parses
    (d / "c.warc.gz").write_bytes(warc.write_warc(page_rows[20:]))
    new3, all3, n3 = warc.ingest_warc(spark, catalog, glob_pat)
    assert n3 == 1 and new3.count() == 10 and all3.count() == 30
    assert len(catalog.snapshots("pages_warc")) == 2
    assert sorted(r.url for r in new3.collect()) == sorted(
        r["url"] for r in page_rows[20:]
    )


def test_stream_warc_matches_batch_read(spark, page_rows, tmp_path_factory):
    """Streaming discovery of a landing dir yields the same pages rows as
    the batch read; non-archive files are glob-filtered out."""
    d = tmp_path_factory.mktemp("warc-stream")
    (d / "a.warc.gz").write_bytes(warc.write_warc(page_rows[:12]))
    (d / "b.wet").write_bytes(warc.write_wet(page_rows[12:20], gzip_per_member=False))
    (d / "ignore.txt").write_bytes(b"not an archive")

    q = (
        warc.stream_warc(spark, str(d), max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("stream_warc_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "select url, text from stream_warc_t order by url"
    ).collect()
    want = (
        warc.read_warc(spark, [str(d / "a.warc.gz"), str(d / "b.wet")])
        .select("url", "text")
        .orderBy("url")
        .collect()
    )
    assert len(got) == 20 and got == want


def test_stream_ingest_warc_exactly_once_and_interop(
    spark, page_rows, tmp_path_factory
):
    """Continuous ingestion commits idempotent snapshots keyed by file
    fingerprints, resumes from the checkpoint (new files only), and
    interoperates with the batch manifest-diff loader on the same table."""
    from mmkg_rag_spark.sources.catalog import ParquetCatalog

    d = tmp_path_factory.mktemp("warc-si")
    wh = str(tmp_path_factory.mktemp("wh-si"))
    ckpt = str(tmp_path_factory.mktemp("ckpt-si"))
    catalog = ParquetCatalog(spark, wh)
    (d / "a.warc.gz").write_bytes(warc.write_warc(page_rows[:10]))
    (d / "b.warc.gz").write_bytes(warc.write_warc(page_rows[10:20]))

    warc.stream_ingest_warc(spark, str(d), wh, ckpt, max_files_per_trigger=1)
    snaps1 = catalog.snapshots("pages_warc")
    assert len(snaps1) == 2  # one file per trigger -> one snapshot per batch
    assert sum(catalog.read("pages_warc", s["id"]).count() for s in snaps1) == 20

    # drained re-run: checkpoint knows both files; no new snapshots
    warc.stream_ingest_warc(spark, str(d), wh, ckpt)
    assert len(catalog.snapshots("pages_warc")) == 2

    # new arrival: exactly one new snapshot with only its rows
    (d / "c.warc.gz").write_bytes(warc.write_warc(page_rows[20:]))
    warc.stream_ingest_warc(spark, str(d), wh, ckpt)
    snaps3 = catalog.snapshots("pages_warc")
    assert len(snaps3) == 3
    newest = max(snaps3, key=lambda s: s["seq"])
    assert catalog.read("pages_warc", newest["id"]).count() == 10

    # interop: the batch loader sees every streamed file as already ingested
    new, all_pages, n = warc.ingest_warc(spark, catalog, str(d / "*.warc.gz"))
    assert n == 0 and new is None and all_pages.count() == 30


def test_http_payload_dechunks_transfer_encoding():
    body = b"5\r\nHello\r\n8\r\n, chunky\r\n0\r\nX-Trailer: t\r\n\r\n"
    block = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Type: text/html\r\n\r\n" + body
    )
    assert warc._http_payload(block) == b"Hello, chunky"
    # chunk extensions ignored; malformed stream falls back to raw bytes
    ext = block.replace(b"5\r\n", b"5;ext=1\r\n")
    assert warc._http_payload(ext) == b"Hello, chunky"
    broken = block[:-20]
    assert warc._http_payload(broken) == body[:-20]
    # non-chunked messages untouched
    plain = b"HTTP/1.1 200 OK\r\n\r\nHello"
    assert warc._http_payload(plain) == b"Hello"


def test_warc_record_framing_property():
    """Hypothesis: arbitrary payload bytes survive the write->parse cycle
    in every gzip layout, including payloads containing CRLFs and fake
    WARC version lines."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        payloads=st.lists(
            st.binary(min_size=0, max_size=400), min_size=1, max_size=4
        ),
        per_member=st.booleans(),
    )
    def check(payloads, per_member):
        import datetime as _dt

        rows = [
            {
                "url": f"https://h{i}.test/p",
                "warc_ts": _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc),
                "html": p,
            }
            for i, p in enumerate(payloads)
        ]
        blob = warc.write_warc(rows, gzip_per_member=per_member,
                               with_requests=False)
        recs = [
            (h, b) for h, b in _parse_all(blob) if h["warc-type"] == "response"
        ]
        assert [warc._http_payload(b) for _, b in recs] == payloads

    check()
