"""Multimodal binary-column operators (training-data pipeline).

Images/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata — the Spark-side plumbing (schema, partition sizing, Arrow
batch shape, UDF signatures) is real and tested; the codec kernels are
STUBBED behind deterministic fakes because no image/audio libraries exist in
this container. Swap ``_decode_image_stub``/... for PIL/ffmpeg calls on a
real cluster; nothing else changes.

Scale notes:
- Binary payloads make *bytes per row* huge and rows per task few: these
  operators repartition by target bytes-per-partition (not row count) and
  cap Arrow batch size so a batch of decoded frames fits executor memory.
- Decode/resize/embed are map-only `mapInPandas` stages — no shuffle; the
  only shuffle here is the explicit byte-balancing repartition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, url string, media_type string, content binary, "
    "meta map<string,string>"
)

DECODED_IMAGE_SCHEMA = (
    "media_id long, url string, width int, height int, channels int, "
    "decode_ok boolean, decode_error string"
)

THUMB_SCHEMA = (
    "media_id long, url string, thumb_width int, thumb_height int, "
    "thumb binary"
)

EMBED_DIM = 64
EMBED_SCHEMA = f"media_id long, url string, embedding array<float>"

FRAME_SCHEMA = (
    "media_id long, url string, frame_index int, ts_ms long, frame binary"
)


def balance_by_bytes(
    media: DataFrame, target_partition_bytes: int = 64 * 1024 * 1024
) -> DataFrame:
    """Repartition a binary-column table to ~target bytes per partition.

    Row-count partitioning is wrong for media: one partition of 4K videos and
    one of icons differ by 10^4× in bytes. One pass computes total payload
    size (cheap: length() is a parquet-metadata-friendly projection), then
    repartitions to ceil(total/target).
    """
    total = media.select(F.sum(F.length("content")).alias("b")).collect()[0].b or 0
    n = max(1, int(total / target_partition_bytes) + 1)
    return media.repartition(n)


# --- stub codecs (deterministic fakes; replace with PIL/ffmpeg on cluster) --

def _decode_image_stub(content: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from a content hash.

    A real implementation returns PIL.Image dimensions; raising on invalid
    bytes is part of the contract (exercised by the error-channel test).
    """
    if not content:
        raise ValueError("empty image payload")
    if content[:4] == b"!bad":
        raise ValueError("corrupt image header")
    h = hashlib.sha256(content).digest()
    w = 64 + int.from_bytes(h[0:2], "big") % 1984
    ht = 64 + int.from_bytes(h[2:4], "big") % 1984
    return w, ht, 3


def _embed_stub(content: bytes, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic fake feature extractor: hash-seeded unit vector."""
    h = hashlib.sha256(b"embed:" + content).digest()
    seed = int.from_bytes(h[:8], "big") % 2**32
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


# --- operators --------------------------------------------------------------

def decode_images(media: DataFrame) -> DataFrame:
    """Decode metadata per image with a per-row error channel (no task kills).

    Bad payloads land as decode_ok=false + message — at 10^12 rows a single
    corrupt file must never fail a task, so the UDF catches per row.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, url, content in zip(pdf["media_id"], pdf["url"], pdf["content"]):
                try:
                    w, h, c = _decode_image_stub(bytes(content) if content is not None else b"")
                    rows.append((int(mid), url, w, h, c, True, None))
                except Exception as exc:  # noqa: BLE001 — per-row error channel
                    rows.append((int(mid), url, None, None, None, False, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "url", "width", "height", "channels",
                    "decode_ok", "decode_error",
                ],
            )

    return media.select("media_id", "url", "content").mapInPandas(
        gen, schema=DECODED_IMAGE_SCHEMA
    )


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Thumbnail stub: emits scaled dimensions + a deterministic payload.

    Real impl: PIL thumbnail bytes. The fake payload is sha256(content) so
    downstream dedup-on-thumb tests are meaningful.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, url, content in zip(pdf["media_id"], pdf["url"], pdf["content"]):
                try:
                    w, h, _ = _decode_image_stub(bytes(content))
                except Exception:  # noqa: BLE001
                    continue
                scale = min(1.0, max_side / max(w, h))
                rows.append(
                    (int(mid), url, int(w * scale), int(h * scale),
                     hashlib.sha256(bytes(content)).digest())
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "url", "thumb_width", "thumb_height", "thumb"],
            )

    return media.select("media_id", "url", "content").mapInPandas(gen, schema=THUMB_SCHEMA)


def embed_images(media: DataFrame) -> DataFrame:
    """Feature-extraction stub → array<float> column (feeds operators/ann.py)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, urls, vecs = [], [], []
            for mid, url, content in zip(pdf["media_id"], pdf["url"], pdf["content"]):
                ids.append(int(mid))
                urls.append(url)
                vecs.append(_embed_stub(bytes(content)).tolist())
            yield pd.DataFrame({"media_id": ids, "url": urls, "embedding": vecs})

    return media.select("media_id", "url", "content").mapInPandas(gen, schema=EMBED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling stub: one row per sampled frame.

    Real impl: ffmpeg keyframe extraction. The fake derives a duration from
    the payload hash and emits sha256(content||index) frame payloads —
    the fan-out shape (one input row → ≤ max_frames output rows through
    mapInPandas) is the part that matters for the engine.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, url, content, mtype in zip(
                pdf["media_id"], pdf["url"], pdf["content"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                c = bytes(content)
                duration = 500 + int.from_bytes(hashlib.sha256(c).digest()[:3], "big") % 20000
                n = min(max_frames, max(1, duration // every_ms))
                for i in range(int(n)):
                    rows.append(
                        (int(mid), url, i, i * every_ms,
                         hashlib.sha256(c + i.to_bytes(4, "big")).digest())
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "url", "frame_index", "ts_ms", "frame"]
            )

    return media.select("media_id", "url", "content", "media_type").mapInPandas(
        gen, schema=FRAME_SCHEMA
    )
