"""WARC / WET source: Common-Crawl-style archive ingestion.

The north-star input is "an Iceberg table of Common-Crawl-style web pages"
(BASELINE.json ``input_hint``); on a real crawl that table is *built* from
WARC archives — the ISO 28500 container Common Crawl actually ships. This
module closes the gap between raw crawl archives and the engine's
``pages(url, warc_ts, html, text, lang)`` table:

- ``iter_warc_records`` — streaming record parser for WARC 1.0/1.1. Handles
  plain concatenated records, whole-file gzip, and Common Crawl's
  member-per-record gzip (``gzip.GzipFile`` reads multi-member streams
  natively, so all three arrive through one code path). O(one record)
  memory per step.
- ``write_warc`` / ``write_wet`` — spec-valid fixture writers (response +
  request/warcinfo records with full HTTP framing; WET ``conversion``
  records) so round-trip tests run hermetically with zero network.
- ``read_warc`` — the Spark entry point: archive inventory → one task per
  file → ``mapInPandas`` parse → the exact ``input_hint`` schema.

Scale design (100 TB): Common Crawl writes archives at ~1 GiB precisely so
the *file inventory* carries the parallelism — a monthly crawl is ~90k
WARC files, far above any executor count, so one-task-per-file saturates a
1000-executor cluster with no intra-file split needed. The reader
distributes *paths* (a few bytes each) and streams bytes inside the task,
so no multi-GiB file body ever crosses a shuffle or lives in a Spark row.
Text extraction runs in the same map stage (no extra pass over the data);
language is metadata-first (``WARC-Identified-Content-Language``, emitted
by recent Common Crawl WET releases) with the engine's native stopword
detector (`functions.textstats.lang_id`) as the in-plan fallback — a
JVM-side expression, not Python.

Reference parity: the reference ingests local files/URLs one at a time
(``src/mrag/index/pipe.py:35-36`` file read → text); WARC is the
web-scale generalization of that source stage, feeding the same
downstream extract→dedup→materialize pipeline.
"""

from __future__ import annotations

import datetime as dt
import glob as _glob
import gzip
import hashlib
import io
import os as _os
import re
from typing import Iterator

from mmkg_rag_spark.sources import pages as _pages

CRLF = b"\r\n"

# --- record-level parser ----------------------------------------------------


def _read_headers(f) -> tuple[str, dict[str, str]] | None:
    """Read one WARC version line + header block; None at clean EOF.

    Header names are case-insensitive per spec — normalized to lowercase.
    Inter-record blank lines (the two CRLFs that close the previous record)
    are tolerated before the version line.
    """
    line = f.readline()
    while line in (CRLF, b"\n"):
        line = f.readline()
    if not line:
        return None
    version = line.strip().decode("ascii", "replace")
    if not version.startswith("WARC/"):
        raise ValueError(f"bad WARC version line: {version!r}")
    headers: dict[str, str] = {}
    last_key = None
    while True:
        line = f.readline()
        if not line:
            raise ValueError("truncated WARC header block")
        if line in (CRLF, b"\n"):
            return version, headers
        text = line.decode("utf-8", "replace").rstrip("\r\n")
        if text[:1] in (" ", "\t") and last_key:  # obs-fold continuation
            headers[last_key] += " " + text.strip()
            continue
        key, _, val = text.partition(":")
        last_key = key.strip().lower()
        headers[last_key] = val.strip()


def iter_warc_records(
    stream, *, lenient: bool = False
) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(headers, block)`` per record from a WARC byte stream.

    ``stream`` is a binary file-like positioned at the start; gzip (single
    stream or Common Crawl's member-per-record) is auto-detected from the
    magic bytes. ``headers`` keys are lowercased; ``block`` is the raw
    record block (``Content-Length`` bytes — for response records this is
    the full HTTP message). With ``lenient=True`` a malformed tail stops
    the file quietly instead of raising (crawl archives do truncate).
    """
    magic = stream.read(2)
    if getattr(stream, "seekable", lambda: False)():
        stream.seek(-len(magic), io.SEEK_CUR)
        head = stream
    else:  # non-seekable: re-prefix the consumed magic
        head = _Prefixed(magic, stream)
    f = gzip.GzipFile(fileobj=head) if magic == b"\x1f\x8b" else head
    f = io.BufferedReader(f) if not isinstance(f, io.BufferedReader) else f
    while True:
        try:
            hdr = _read_headers(f)
            if hdr is None:
                return
            _, headers = hdr
            n = int(headers["content-length"])
            block = f.read(n)
            if len(block) != n:
                raise ValueError("truncated WARC block")
        except Exception:
            if lenient:
                return
            raise
        yield headers, block


class _Prefixed(io.RawIOBase):
    """Re-attach consumed magic bytes in front of a non-seekable stream."""

    def __init__(self, prefix: bytes, stream):
        self._pre = prefix
        self._s = stream

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        if self._pre:
            k = min(len(b), len(self._pre))
            b[:k] = self._pre[:k]
            self._pre = self._pre[k:]
            return k
        data = self._s.read(len(b))
        b[: len(data)] = data
        return len(data)


def _http_payload(block: bytes) -> bytes:
    """HTTP message block → body bytes (headers dropped, chunking removed).

    Content-Length in the HTTP headers is advisory here: the WARC record
    length already bounds the block, and crawlers routinely store truncated
    bodies, so everything after the header terminator is the payload.
    Crawlers also store ``Transfer-Encoding: chunked`` bodies verbatim
    (the WARC block is the wire bytes) — those are de-framed so the caller
    always sees the entity body; a malformed chunk stream falls back to
    the raw bytes rather than dropping the record.
    """
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        sep = block.find(b"\n\n")
        if sep < 0:
            return block
        head, body = block[:sep], block[sep + 2 :]
    else:
        head, body = block[:sep], block[sep + 4 :]
    if b"chunked" in head.lower() and b"transfer-encoding" in head.lower():
        try:
            return _dechunk(body)
        except ValueError:
            return body
    return body


def _dechunk(body: bytes) -> bytes:
    """RFC 9112 §7.1 chunked framing → entity bytes (trailers dropped)."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("bad chunk size line")
        size = int(body[pos:nl].split(b";")[0], 16)  # ignore chunk extensions
        pos = nl + 2
        if size == 0:
            return bytes(out)  # trailers (if any) are ignored
        if pos + size > len(body):
            raise ValueError("truncated chunk")
        out += body[pos : pos + size]
        pos += size + 2  # chunk data CRLF


def parse_warc_date(s: str) -> dt.datetime:
    """WARC-Date (ISO 8601, 'Z' suffix, optional fractional secs) → aware dt."""
    return dt.datetime.fromisoformat(s.replace("Z", "+00:00"))


# --- generic HTML -> text (fallback extractor) ------------------------------

_SCRIPTS = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_BLOCK_BREAK = re.compile(rb"(?i)</(p|div|h[1-6]|li|tr|blockquote)\s*>")
_BR = re.compile(rb"(?i)<br\s*/?>")
_TAG = re.compile(rb"(?s)<[^>]*>")
_BLANKS = re.compile(r"\n{3,}")


def strip_html(html: bytes) -> str:
    """Deterministic generic tag-stripper for arbitrary web HTML.

    Drops script/style bodies, maps block-closers to paragraph breaks and
    ``<br>`` to newlines, removes remaining tags, unescapes entities, and
    collapses whitespace. NOT the byte-identical synthetic inverse — that
    is `pages.html_to_text`, which `extract_text` tries first.
    """
    import html as _h

    b = _SCRIPTS.sub(b"", html)
    b = _BR.sub(b"\n", b)
    b = _BLOCK_BREAK.sub(b"\n\n", b)
    b = _TAG.sub(b" ", b)
    s = _h.unescape(b.decode("utf-8", "replace"))
    lines = [" ".join(ln.split()) for ln in s.split("\n")]
    return _BLANKS.sub("\n\n", "\n".join(lines)).strip()


def extract_text(html: bytes) -> str:
    """Engine text producer for WARC payloads.

    The synthetic-wrapper inverse (`pages.html_to_text`, the byte-identical
    north-star kernel) when the payload matches it; the generic stripper
    for wild HTML.
    """
    try:
        return _pages.html_to_text(html)
    except Exception:  # noqa: BLE001 — not the synthetic wrapper
        return strip_html(html)


# --- fixture writers --------------------------------------------------------


def _record(
    rtype: str,
    headers: list[tuple[str, str]],
    block: bytes,
    version: str = "WARC/1.0",
) -> bytes:
    rid = hashlib.md5(
        (rtype + ":" + str(dict(headers))).encode() + block[:64]
    ).hexdigest()
    lines = [version.encode(), b"WARC-Type: " + rtype.encode()]
    lines += [k.encode() + b": " + v.encode() for k, v in headers]
    lines += [
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
        b"Content-Length: " + str(len(block)).encode(),
    ]
    return CRLF.join(lines) + CRLF * 2 + block + CRLF * 2


def _gzip_member(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(data)
    return buf.getvalue()


def _ts_str(ts: dt.datetime) -> str:
    return ts.astimezone(dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def write_warc(
    rows: list[dict],
    *,
    gzip_per_member: bool = True,
    with_requests: bool = True,
) -> bytes:
    """Rows ``{url, warc_ts, html}`` → a spec-valid .warc(.gz) byte string.

    Emits a leading ``warcinfo`` record, then per page an optional
    ``request`` record (readers must skip it — Common Crawl interleaves
    them) and the ``response`` record with full HTTP/1.1 framing. With
    ``gzip_per_member`` each record is its own gzip member, Common Crawl's
    on-disk layout.
    """
    info = b"software: mmkg-rag-spark fixture writer\r\nformat: WARC File Format 1.0\r\n"
    records = [
        _record(
            "warcinfo",
            [("WARC-Date", _ts_str(dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc))),
             ("Content-Type", "application/warc-fields")],
            info,
        )
    ]
    for r in rows:
        ts = _ts_str(r["warc_ts"])
        if with_requests:
            req = (
                b"GET / HTTP/1.1\r\nHost: fixture\r\nUser-Agent: mmkg-rag-spark\r\n\r\n"
            )
            records.append(
                _record(
                    "request",
                    [("WARC-Target-URI", r["url"]), ("WARC-Date", ts),
                     ("Content-Type", 'application/http; msgtype="request"')],
                    req,
                )
            )
        body = bytes(r["html"])
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        records.append(
            _record(
                "response",
                [("WARC-Target-URI", r["url"]), ("WARC-Date", ts),
                 ("Content-Type", 'application/http; msgtype="response"')],
                http,
            )
        )
    if gzip_per_member:
        return b"".join(_gzip_member(rec) for rec in records)
    return b"".join(records)


def write_wet(rows: list[dict], *, gzip_per_member: bool = True) -> bytes:
    """Rows ``{url, warc_ts, text[, lang]}`` → a .warc.wet(.gz) byte string.

    ``conversion`` records carrying plain-text payloads; ``lang`` (when
    present) rides the ``WARC-Identified-Content-Language`` header exactly
    as recent Common Crawl WET releases emit it.
    """
    records = []
    for r in rows:
        headers = [
            ("WARC-Target-URI", r["url"]),
            ("WARC-Date", _ts_str(r["warc_ts"])),
            ("Content-Type", "text/plain"),
        ]
        if r.get("lang"):
            headers.append(("WARC-Identified-Content-Language", r["lang"]))
        records.append(_record("conversion", headers, r["text"].encode("utf-8")))
    if gzip_per_member:
        return b"".join(_gzip_member(rec) for rec in records)
    return b"".join(records)


# --- Spark entry point ------------------------------------------------------


def _archive_rows(fh, lenient: bool):
    """One archive stream → (url, ts, html, text, lang) page tuples."""
    for headers, block in iter_warc_records(fh, lenient=lenient):
        rtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri", "")
        if rtype == "response":
            html = _http_payload(block)
            text = extract_text(html)
        elif rtype == "conversion":
            html = None
            text = block.decode("utf-8", "replace")
        else:
            continue
        yield (
            url,
            parse_warc_date(headers["warc-date"]),
            html,
            text,
            headers.get("warc-identified-content-language"),
        )


def _local_path(p: str) -> str:
    """Strip a file: URI scheme (binaryFile source emits URIs)."""
    if p.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(p).path)
    return p


def _paths_to_pages_gen(lenient: bool):
    """mapInPandas generator: batches of path strings → pages rows.

    Bytes stream inside the task (records are parsed one at a time from
    the file handle); only path strings cross the shuffle/stream boundary.
    """
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                with open(_local_path(path), "rb") as fh:
                    rows.extend(_archive_rows(fh, lenient))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return gen


def read_warc(spark, paths, *, lenient: bool = False):
    """WARC/WET archives → the ``input_hint`` pages DataFrame.

    ``paths``: a glob, a single path, or an explicit list (on a cluster,
    pass the file inventory — e.g. Common Crawl's ``warc.paths`` listing).
    One task per archive file; bytes are streamed inside the task, so only
    path strings are distributed. ``response`` records yield
    ``(url, warc_ts, html, text=extract_text(html))``; ``conversion``
    (WET) records yield text directly with ``html`` NULL. Every other
    record type (warcinfo/request/metadata/revisit) is skipped. ``lang``
    is the record's ``WARC-Identified-Content-Language`` when present,
    else the native stopword detector — a JVM-side expression appended to
    the same single map stage.
    """
    from pyspark.sql import functions as F

    from mmkg_rag_spark.functions.textstats import lang_id

    if isinstance(paths, str):
        if _glob.has_magic(paths):
            files = sorted(_glob.glob(paths))
        elif _os.path.isdir(paths):
            files = sorted(
                p
                for pat in ("*.warc", "*.warc.gz", "*.wet", "*.wet.gz")
                for p in _glob.glob(_os.path.join(paths, pat))
            )
        else:
            files = [paths]
    else:
        files = list(paths)
    if not files:
        raise ValueError("read_warc: no input files")

    gen = _paths_to_pages_gen(lenient)
    n_part = min(len(files), spark.sparkContext.defaultParallelism)
    inventory = spark.createDataFrame([(p,) for p in files], "path string")
    if len(files) > 1:
        inventory = inventory.repartition(n_part)
    df = inventory.mapInPandas(gen, schema=_pages.PAGES_SCHEMA)
    return df.withColumn("lang", F.coalesce(F.col("lang"), lang_id(F.col("text"))))


# --- streaming (continuous auto-loader) --------------------------------------

# binaryFile's fixed source schema, declared explicitly so the stream needs
# no inference pass; we only ever SELECT ``path`` from it, and the source
# prunes ``content`` — archive bytes never ride the stream, each task
# re-opens its files and parses records one at a time.
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)
_ARCHIVE_GLOB = "*.{warc,warc.gz,wet,wet.gz}"


def stream_warc(spark, input_dir: str, *, lenient: bool = False,
                max_files_per_trigger: int | None = None):
    """Streaming pages DataFrame over a landing directory of crawl archives.

    Auto-loader shape: the ``binaryFile`` file-stream source provides
    exactly-once *file discovery* (seen-files tracked in the stream
    checkpoint); only ``path`` is projected, then the same per-file parser
    as the batch `read_warc` turns each discovered archive into pages rows
    inside the micro-batch task. Downstream this composes with the whole
    streaming KG path (`streaming.stream_build` accepts any pages stream).
    """
    from pyspark.sql import functions as F

    from mmkg_rag_spark.functions.textstats import lang_id

    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("pathGlobFilter", _ARCHIVE_GLOB)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    paths = reader.load(input_dir).select("path")
    df = paths.mapInPandas(_paths_to_pages_gen(lenient), schema=_pages.PAGES_SCHEMA)
    return df.withColumn("lang", F.coalesce(F.col("lang"), lang_id(F.col("text"))))


def stream_ingest_warc(spark, input_dir: str, warehouse: str,
                       checkpoint_dir: str, *, table: str = "pages_warc",
                       lenient: bool = False, available_now: bool = True,
                       max_files_per_trigger: int = 4):
    """Continuous crawl ingestion: archives → catalog snapshots, exactly-once.

    Push-style twin of the poll/diff `ingest_warc`: Spark's file-stream
    checkpoint decides WHICH files form each micro-batch; the snapshot id
    is the content fingerprint of that file set, so a replayed batch
    (restart after crash) finds its snapshot committed and no-ops, and a
    crash mid-write leaves no manifest entry (data-before-manifest commit).
    Snapshots record the same ``files`` meta as `ingest_warc`, so the two
    loaders interoperate on one table: a later batch `ingest_warc` call
    skips files the stream already committed, and vice versa.

    ``available_now=True`` drains the current inventory then stops
    (backfill/test mode); False keeps watching until ``query.stop()``.
    Returns the streaming query.
    """
    from mmkg_rag_spark.sources.catalog import ParquetCatalog

    catalog = ParquetCatalog(spark, warehouse)
    paths = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("pathGlobFilter", _ARCHIVE_GLOB)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
        .select("path")
    )

    def ingest(batch_df, batch_id: int) -> None:
        files = sorted(_local_path(r.path) for r in batch_df.collect())
        if not files:
            return
        sized = [(p, _os.path.getsize(p)) for p in files]
        snap = fingerprint_files(sized)
        if catalog.has_snapshot(table, snap):
            return
        df = read_warc(spark, files, lenient=lenient)
        catalog.write(
            df, table, snap,
            meta={"batch_id": batch_id, "files": [[p, sz] for p, sz in sized]},
        )

    writer = (
        paths.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="2 seconds").start()


# --- distributed export + CDX index ----------------------------------------


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform (the CDX sort key).

    ``https://ex3.test/doc/5`` → ``test,ex3)/doc/5``: scheme and default
    port dropped, host lowercased and label-reversed so one site's records
    sort contiguously. Simplified vs the full IA spec (no www-stripping or
    query normalization) — deterministic and order-compatible for lookups
    written and read by this engine.
    """
    from urllib.parse import urlsplit

    p = urlsplit(url)
    host = (p.hostname or "").lower()
    key = ",".join(reversed(host.split("."))) if host else ""
    path = p.path or "/"
    if p.query:
        path += "?" + p.query
    return key + ")" + path


def export_warc(pages, out_dir: str):
    """pages DataFrame → one ``.warc.gz`` per partition + a CDX index.

    The distributed mirror of `read_warc`: each task streams its partition
    into ``part-<pid>.warc.gz`` (member-per-record gzip — Common Crawl's
    layout) under ``out_dir`` (a shared filesystem path on a cluster) and
    emits one CDX row per record with the byte ``offset``/``length`` of
    that record's gzip member, so any record is retrievable with a ranged
    read + single-member gunzip without touching the rest of the archive.
    Returns the CDX DataFrame ``(surt_key, warc_ts, url, digest, offset,
    length, filename)``; ``digest`` is the Common-Crawl-convention base32
    SHA-1 of the payload. Sort/persist it with `write_cdx`.
    """
    import base64
    import os
    from typing import Iterator as _Iter

    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    src = pages.withColumn("_pid", F.spark_partition_id())

    def gen(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        fh = None
        name = None
        offset = 0
        out_rows = []
        for pdf in batches:
            for url, warc_ts, html, text, lang, pid in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["text"],
                pdf["lang"], pdf["_pid"],
            ):
                if fh is None:
                    name = f"part-{int(pid):05d}.warc.gz"
                    fh = open(os.path.join(out_dir, name), "wb")
                ts = warc_ts.to_pydatetime().replace(tzinfo=dt.timezone.utc)
                body = bytes(html) if html is not None else text.encode()
                if html is not None:
                    http = (
                        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                        b"charset=UTF-8\r\nContent-Length: "
                        + str(len(body)).encode() + b"\r\n\r\n" + body
                    )
                    rec = _record(
                        "response",
                        [("WARC-Target-URI", url), ("WARC-Date", _ts_str(ts)),
                         ("Content-Type", 'application/http; msgtype="response"')],
                        http,
                    )
                else:  # text-only row -> WET-style conversion record
                    headers = [
                        ("WARC-Target-URI", url), ("WARC-Date", _ts_str(ts)),
                        ("Content-Type", "text/plain"),
                    ]
                    if lang:
                        headers.append(("WARC-Identified-Content-Language", lang))
                    rec = _record("conversion", headers, body)
                member = _gzip_member(rec)
                fh.write(member)
                digest = base64.b32encode(hashlib.sha1(body).digest()).decode()
                out_rows.append(
                    (surt(url), ts.replace(tzinfo=None), url,
                     "sha1:" + digest, offset, len(member), name)
                )
                offset += len(member)
        if fh is not None:
            fh.close()
        yield pd.DataFrame(
            out_rows,
            columns=["surt_key", "warc_ts", "url", "digest",
                     "offset", "length", "filename"],
        )

    schema = ("surt_key string, warc_ts timestamp, url string, digest string, "
              "offset long, length long, filename string")
    return src.mapInPandas(gen, schema=schema)


def _cdxj_line(surt_key, warc_ts, url, digest, offset, length, filename) -> str:
    import json

    meta = {
        "url": url, "digest": digest, "offset": str(offset),
        "length": str(length), "filename": filename,
    }
    ts = warc_ts.strftime("%Y%m%d%H%M%S")
    return f"{surt_key} {ts} {json.dumps(meta, sort_keys=True)}"


def write_cdx(cdx, path: str) -> None:
    """CDX rows → one globally sorted CDXJ text file (+ parquet twin).

    Global sort on ``(surt_key, warc_ts)`` — the property CDX lookups
    binary-search on. The text file is the interchange artifact; the
    parquet twin beside it is the queryable form. The driver streams the
    sorted partitions one at a time (``toLocalIterator`` — bounded memory),
    but a single file is still a single writer: past sandbox scale use
    `write_cdx_sharded`, where the tasks write range-partitioned shards.
    """
    ordered = cdx.orderBy("surt_key", "warc_ts")
    ordered.write.mode("overwrite").parquet(path + ".parquet")
    with open(path, "w", encoding="utf-8") as fh:
        for r in ordered.toLocalIterator():
            fh.write(
                _cdxj_line(r.surt_key, r.warc_ts, r.url, r.digest,
                           r.offset, r.length, r.filename) + "\n"
            )


def write_cdx_sharded(cdx, out_dir: str, shards: int = 32) -> list[dict]:
    """CDX rows → range-partitioned CDXJ shards, written by the tasks.

    The crawl-scale form of `write_cdx`: ``repartitionByRange`` on
    ``(surt_key, warc_ts)`` gives globally ordered shards (shard *i*'s keys
    all precede shard *i+1*'s), each internally sorted by
    ``sortWithinPartitions`` — so the concatenation in shard order IS the
    single sorted file, but every byte is written executor-side; the only
    driver work is the |shards|-row boundary index (``index.json``:
    first/last key per shard), which routes a lookup to its shard for the
    binary search. Returns the boundary index rows.
    """
    import json
    import os
    from typing import Iterator as _Iter

    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    ordered = (
        cdx.repartitionByRange(shards, "surt_key", "warc_ts")
        .sortWithinPartitions("surt_key", "warc_ts")
        .withColumn("_pid", F.spark_partition_id())
    )

    def gen(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        fh = None
        name = first = last = None
        n = 0
        for pdf in batches:
            for sk, ts, url, dg, off, ln, fn, pid in zip(
                pdf["surt_key"], pdf["warc_ts"], pdf["url"], pdf["digest"],
                pdf["offset"], pdf["length"], pdf["filename"], pdf["_pid"],
            ):
                if fh is None:
                    name = f"cdx-{int(pid):05d}.cdxj"
                    fh = open(os.path.join(out_dir, name), "w", encoding="utf-8")
                    first = sk
                fh.write(_cdxj_line(sk, ts, url, dg, off, ln, fn) + "\n")
                last = sk
                n += 1
        if fh is None:
            yield pd.DataFrame(
                columns=["filename", "first_key", "last_key", "n"]
            ).astype({"n": "int64"})
            return
        fh.close()
        yield pd.DataFrame(
            [(name, first, last, n)],
            columns=["filename", "first_key", "last_key", "n"],
        )

    meta_schema = "filename string, first_key string, last_key string, n long"
    index = sorted(
        (r.asDict() for r in ordered.mapInPandas(gen, schema=meta_schema).collect()),
        key=lambda m: m["filename"],
    )
    with open(os.path.join(out_dir, "index.json"), "w", encoding="utf-8") as fh:
        json.dump(index, fh, indent=1)
    return index


def fetch_record(archive_dir: str, cdx_row) -> tuple[dict[str, str], bytes]:
    """Ranged-read one record via its CDX row (offset/length/filename).

    The random-access path the index exists for: seek, read ``length``
    bytes, gunzip the single member, parse the one record.
    """
    import os

    with open(os.path.join(archive_dir, cdx_row.filename), "rb") as fh:
        fh.seek(cdx_row.offset)
        member = fh.read(cdx_row.length)
    recs = list(iter_warc_records(io.BytesIO(member)))
    if len(recs) != 1:
        raise ValueError("CDX range did not contain exactly one record")
    return recs[0]


def read_cdx(spark, path: str):
    """CDXJ shards / single file → the CDX DataFrame, parsed JVM-side.

    The read twin of `write_cdx` / `write_cdx_sharded`: ``spark.read.text``
    over the shard directory (one task per split — the inventory carries
    the parallelism, same rule as `read_warc`), then pure native parsing —
    two ``regexp_extract`` + one ``from_json`` + ``to_timestamp`` with an
    explicit pattern under the engine's pinned UTC session zone. No Python
    runs per line, so a 90k-shard crawl index scans at parquet-like rates;
    schema matches `export_warc`'s output so the same frame feeds
    `fetch_pages_by_cdx` or joins directly against dedup/curation outputs.
    """
    from pyspark.sql import functions as F

    if _os.path.isdir(path):
        src = _os.path.join(path, "*.cdxj")
    else:
        src = path
    meta = (
        "url string, digest string, offset string, length string, "
        "filename string"
    )
    line = F.col("value")
    m = F.from_json(F.regexp_extract(line, r"^\S+ \d{14} (.*)$", 1), meta)
    return (
        spark.read.text(src)
        .filter(F.length(F.trim(line)) > 0)
        .select(
            F.regexp_extract(line, r"^(\S+) ", 1).alias("surt_key"),
            F.to_timestamp(
                F.regexp_extract(line, r"^\S+ (\d{14}) ", 1), "yyyyMMddHHmmss"
            ).alias("warc_ts"),
            m["url"].alias("url"),
            m["digest"].alias("digest"),
            m["offset"].cast("long").alias("offset"),
            m["length"].cast("long").alias("length"),
            m["filename"].alias("filename"),
        )
    )


def fetch_pages_by_cdx(spark, archive_dir: str, cdx, *, lenient: bool = False):
    """Index-driven selective fetch: CDX rows → pages rows, distributed.

    THE Common-Crawl access pattern the index exists for: filter the
    (tiny, columnar) CDX frame — by SURT prefix, language, digest
    anti-join, crawl date — and range-read ONLY the matching records
    instead of re-scanning archives. `fetch_record` is the driver-side
    single-record probe; this is its cluster form: repartition by
    ``filename`` so each archive is owned by one task, sort by
    ``(filename, offset)`` within the task so member reads are sequential
    and each file is opened exactly once per run, then seek/read/gunzip
    the single gzip member and parse the one record. Only CDX rows (a few
    hundred bytes each) cross the shuffle — never archive bytes. ``lang``
    falls back to the native stopword detector like `read_warc`.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from mmkg_rag_spark.functions.textstats import lang_id

    src = cdx.select("filename", "offset", "length").repartition(
        "filename"
    ).sortWithinPartitions("filename", "offset")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cur, fh = None, None
        try:
            for pdf in batches:
                rows = []
                for fn, off, ln in zip(
                    pdf["filename"], pdf["offset"], pdf["length"]
                ):
                    if fn != cur:
                        if fh is not None:
                            fh.close()
                        fh = open(_os.path.join(archive_dir, fn), "rb")
                        cur = fn
                    fh.seek(int(off))
                    member = fh.read(int(ln))
                    rows.extend(_archive_rows(io.BytesIO(member), lenient))
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "text", "lang"]
                )
        finally:
            if fh is not None:
                fh.close()

    df = src.mapInPandas(gen, schema=_pages.PAGES_SCHEMA)
    return df.withColumn(
        "lang", F.coalesce(F.col("lang"), lang_id(F.col("text")))
    )


# --- incremental (manifest-diff) ingestion ----------------------------------


def ingest_warc(spark, catalog, paths, *, table: str = "pages_warc",
                lenient: bool = False):
    """Idempotent file-level incremental ingestion of crawl archives.

    Auto-loader pattern over the snapshot catalog: each call lists the
    archive inventory, diffs it against the union of files recorded in
    ``table``'s committed snapshot metadata, parses ONLY the new files
    (`read_warc`), and commits them as one new snapshot whose meta records
    exactly which ``(path, size)`` pairs it covers. Crash-safe by the
    catalog's data-before-manifest commit: a death mid-ingest leaves no
    manifest entry, and the re-run re-parses the same new files into the
    same snapshot id (overwrite-idempotent). Archives are immutable by
    convention (Common Crawl never rewrites), so ``(path, size)`` is the
    identity; a size change is treated as a new file.

    Returns ``(new_pages, all_pages, n_new_files)`` — ``new_pages`` is None
    when the inventory is fully ingested (a no-op call). Feed ``new_pages``
    through extract → `operators.incremental.incremental_canonicalize` for
    O(batch + graph) KG growth, never O(corpus).
    """
    import os

    if isinstance(paths, str):
        files = sorted(_glob.glob(paths)) if _glob.has_magic(paths) else [paths]
    else:
        files = sorted(paths)
    inventory = [(p, os.path.getsize(p)) for p in files]

    seen: set[tuple[str, int]] = set()
    for snap in catalog.snapshots(table):
        # catalog spreads meta into the manifest entry (catalog.py:_commit)
        for p, sz in snap.get("files", []):
            seen.add((p, int(sz)))
    new = [(p, sz) for p, sz in inventory if (p, sz) not in seen]

    def _all_pages():
        snaps = catalog.snapshots(table)
        if not snaps:
            return None
        dfs = [catalog.read(table, s["id"]) for s in snaps]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    if not new:
        return None, _all_pages(), 0

    snap_id = fingerprint_files(new)
    df = read_warc(spark, [p for p, _ in new], lenient=lenient)
    catalog.write(df, table, snap_id, meta={"files": [[p, sz] for p, sz in new]})
    return catalog.read(table, snap_id), _all_pages(), len(new)


def fingerprint_files(files: list[tuple[str, int]]) -> str:
    """Deterministic snapshot id for a set of (path, size) pairs."""
    raw = "\n".join(f"{p}:{sz}" for p, sz in sorted(files))
    return hashlib.sha256(raw.encode()).hexdigest()[:16]
