"""Real baseline-JPEG codec + MJPEG-AVI video path (round-3).

The reference has no JPEG/video handling; these kernels exist for the
training-data pipeline's multimodal columns. Everything here is
self-contained: fixtures come from the repo's own encoders.
"""

from __future__ import annotations

import numpy as np
import pytest

from mmkg_rag_spark.kernels.avi import decode_avi_mjpeg, encode_avi_mjpeg
from mmkg_rag_spark.kernels.jpeg import decode_jpeg, encode_jpeg
from mmkg_rag_spark.operators import media


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-jpeg")


def _smooth_rgb(h: int, w: int, seed: int = 7) -> np.ndarray:
    """JPEG-friendly fixture: gradients + mild noise (no hard edges)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (w + h)], axis=2
    ) + rng.standard_normal((h, w, 3)) * 3
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / mse)


# --- JPEG codec -------------------------------------------------------------

def test_jpeg_roundtrip_444_odd_dims():
    img = _smooth_rgb(37, 53)  # non-multiple-of-8: MCU pad + crop
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 35


def test_jpeg_roundtrip_420_subsampled():
    img = _smooth_rgb(37, 53, seed=11)
    b = encode_jpeg(img, quality=90, subsample="420")
    # the stream really declares 2x2 luma sampling (0x22 after comp id 1)
    sof = b.index(b"\xff\xc0")
    assert b[sof + 2 + 2 + 6 + 1] == 0x22
    dec = decode_jpeg(b)
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 33  # chroma loss, luma intact


def test_jpeg_restart_markers():
    img = _smooth_rgb(37, 53, seed=13)
    plain = encode_jpeg(img, quality=90)
    with_rst = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst
    # restart segmentation must not change the decoded pixels
    assert (decode_jpeg(with_rst) == decode_jpeg(plain)).all()


def test_jpeg_grayscale_roundtrip():
    img = _smooth_rgb(24, 40, seed=17)[:, :, :1]
    dec = decode_jpeg(encode_jpeg(img, quality=85))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 35


def test_jpeg_rejects_malformed():
    img = _smooth_rgb(16, 16)
    good = bytearray(encode_jpeg(img))
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[: len(good) // 2]))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no frame at all
    # a baseline interleaved scan header inside a SOF2 frame is invalid:
    # progressive scans must be spectral-selected (DC Se=0 / AC 1-component)
    fake_prog = bytearray(good)
    fake_prog[fake_prog.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(fake_prog))
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(img, progressive=True, restart_interval=2)


def test_jpeg_progressive_roundtrip_matches_baseline():
    """SOF2 spectral-selection + successive-approximation scans decode to the
    SAME pixels as the baseline encode (identical quantized coefficients,
    lossless entropy stage on both paths)."""
    img = _smooth_rgb(37, 53, seed=29)  # odd dims: MCU pad + crop
    prog = encode_jpeg(img, quality=90, progressive=True)
    assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
    assert prog.count(b"\xff\xda") > 1  # really multi-scan
    assert (decode_jpeg(prog) == decode_jpeg(encode_jpeg(img, quality=90))).all()


def test_jpeg_progressive_420_and_grayscale():
    img = _smooth_rgb(37, 53, seed=31)
    p420 = encode_jpeg(img, quality=90, subsample="420", progressive=True)
    b420 = encode_jpeg(img, quality=90, subsample="420")
    assert (decode_jpeg(p420) == decode_jpeg(b420)).all()
    gray = img[:, :, :1]
    pg = encode_jpeg(gray, quality=85, progressive=True)
    assert (decode_jpeg(pg) == decode_jpeg(encode_jpeg(gray, quality=85))).all()


def test_jpeg_flows_through_decode_operator(spark):
    """decode_images reports REAL JPEG dimensions (stub would hash-derive)."""
    img = _smooth_rgb(12, 34)
    df = spark.createDataFrame(
        [(1, "u1", "image", bytearray(encode_jpeg(img)), {})],
        media.MEDIA_SCHEMA,
    )
    row = media.decode_images(df).collect()[0]
    assert (row.width, row.height, row.channels, row.decode_ok) == (34, 12, 3, True)


def test_jpeg_near_duplicate_embeddings_land_close():
    """Recompression at different quality = near-dup → high cosine."""
    img = _smooth_rgb(64, 64, seed=23)
    a = media.decode_image_array(encode_jpeg(img, quality=95))
    b = media.decode_image_array(encode_jpeg(img, quality=60))
    va, vb = media._embed_pixels(a), media._embed_pixels(b)
    other = media._embed_pixels(_smooth_rgb(64, 64, seed=99)[::-1, :, :])
    assert float(va @ vb) > 0.99
    assert float(va @ vb) > float(va @ other)


# --- MJPEG AVI container ----------------------------------------------------

def _make_avi(n_frames: int = 6, fps: float = 4.0, seed: int = 3) -> bytes:
    rng = np.random.RandomState(seed)
    frames = []
    for i in range(n_frames):
        img = np.clip(
            np.full((24, 32, 3), 40.0 * i) + rng.standard_normal((24, 32, 3)) * 5,
            0, 255,
        ).astype(np.uint8)
        frames.append(encode_jpeg(img, quality=90))
    return encode_avi_mjpeg(frames, 32, 24, fps=fps)


def test_avi_roundtrip_timestamps_and_frames():
    avi = _make_avi(n_frames=5, fps=4.0)
    frames, fps = decode_avi_mjpeg(avi)
    assert fps == 4.0
    assert [ts for ts, _ in frames] == [0, 250, 500, 750, 1000]
    # every payload is a real decodable JPEG, brightness tracks frame index
    means = [float(decode_jpeg(f).mean()) for _, f in frames]
    assert all(b > a for a, b in zip(means, means[1:]))


def test_avi_rejects_malformed():
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")  # not AVI
    avi = bytearray(_make_avi(2))
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bytes(avi[:40]))  # truncated chunk tree


def test_sample_frames_real_avi_path(spark):
    """AVI rows get REAL frames + container timestamps; stub rows keep the
    hash-derived fan-out; both coexist in one DataFrame."""
    avi = _make_avi(n_frames=8, fps=4.0)  # frame every 250 ms
    df = spark.createDataFrame(
        [
            (1, "real", "video", bytearray(avi), {}),
            (2, "stub", "video", bytearray(b"video-bytes-" * 500), {}),
            (3, "img", "image", bytearray(b"not-a-video"), {}),
        ],
        media.MEDIA_SCHEMA,
    )
    out = media.sample_frames(df, every_ms=500, max_frames=3).collect()
    real = sorted((r for r in out if r.media_id == 1), key=lambda r: r.frame_index)
    # every_ms=500 over 250ms frames → frames 0, 2, 4; capped at 3
    assert [r.ts_ms for r in real] == [0, 500, 1000]
    assert [r.frame_index for r in real] == [0, 1, 2]
    for r in real:
        assert bytes(r.frame)[:2] == b"\xff\xd8"
        assert media.decode_image_array(bytes(r.frame)).shape == (24, 32, 3)
    stub = [r for r in out if r.media_id == 2]
    assert stub and all(len(bytes(r.frame)) == 32 for r in stub)  # sha256 payloads
    assert not [r for r in out if r.media_id == 3]


def test_sampled_frames_compose_with_image_operators(spark):
    """Frame payloads feed decode/resize/embed unchanged — the video path
    terminates in the same image pipeline."""
    avi = _make_avi(n_frames=4, fps=2.0)
    df = spark.createDataFrame(
        [(1, "v", "video", bytearray(avi), {})], media.MEDIA_SCHEMA
    )
    frames = media.sample_frames(df, every_ms=500, max_frames=4)
    as_media = frames.selectExpr(
        "media_id * 100 + frame_index as media_id",
        "url",
        "'image' as media_type",
        "frame as content",
        "map() as meta",
    )
    decoded = media.decode_images(as_media).collect()
    assert decoded and all(r.decode_ok and r.width == 32 for r in decoded)
    emb = media.embed_images(as_media).collect()
    assert all(len(r.embedding) == media.EMBED_DIM for r in emb)
