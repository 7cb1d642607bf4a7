"""YUV4MPEG2 codec: round-trip fidelity, chroma modes, frame timestamps."""

from __future__ import annotations

import numpy as np
import pytest

from mmkg_rag_spark.kernels import y4m
from mmkg_rag_spark.operators import media


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-y4m")


def _frames(n=4, h=12, w=16, seed=3):
    rng = np.random.default_rng(seed)
    # smooth-ish content (block colors) so 4:2:0 subsampling stays faithful
    base = rng.integers(0, 256, (n, h // 4, w // 4, 3), np.uint8)
    return [np.repeat(np.repeat(f, 4, axis=0), 4, axis=1) for f in base]


@pytest.mark.parametrize("chroma,tol", [("444", 2), ("422", 3), ("420", 3)])
def test_roundtrip_chroma_modes(chroma, tol):
    frames = _frames()
    blob = y4m.encode_y4m(frames, fps=(30, 1), chroma=chroma)
    dec, fps = y4m.decode_y4m(blob)
    assert fps == 30.0 and len(dec) == len(frames)
    assert [t for t, _ in dec] == [0, 33, 67, 100]  # round(i*1000/30)
    for (_, got), want in zip(dec, frames):
        assert got.shape == want.shape
        assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= tol


def test_mono_roundtrip_grayscale():
    gray = np.repeat(
        np.linspace(0, 255, 16, dtype=np.uint8).reshape(1, 16, 1), 8, axis=0
    )
    frame = np.repeat(gray, 3, axis=2)
    blob = y4m.encode_y4m([frame], chroma="mono")
    (ts, got), = y4m.decode_y4m(blob)[0]
    assert ts == 0
    assert int(np.abs(got.astype(int) - frame.astype(int)).max()) <= 2


def test_chroma_420_variants_and_errors():
    frames = _frames(n=1)
    blob = y4m.encode_y4m(frames)
    # the three 420 aliases share the plane layout
    for alias in (b"C420jpeg", b"C420mpeg2", b"C420paldv"):
        dec, _ = y4m.decode_y4m(blob.replace(b"C420", alias))
        assert (dec[0][1] == y4m.decode_y4m(blob)[0][0][1]).all()
    with pytest.raises(ValueError):
        y4m.decode_y4m(b"NOTY4M")
    with pytest.raises(ValueError):
        y4m.decode_y4m(blob[: len(blob) - 5])  # truncated frame payload
    with pytest.raises(ValueError):
        y4m.encode_y4m([np.zeros((7, 8, 3), np.uint8)], chroma="420")  # odd h


def test_y4m_through_sample_frames(spark):
    frames = _frames(n=6, seed=11)
    blob = y4m.encode_y4m(frames, fps=(10, 1))  # 100 ms cadence
    df = spark.createDataFrame(
        [(1, "clip.y4m", "video", bytearray(blob), {})], media.MEDIA_SCHEMA
    )
    out = sorted(
        media.sample_frames(df, every_ms=200, max_frames=3).collect(),
        key=lambda r: r.frame_index,
    )
    assert [r.ts_ms for r in out] == [0, 200, 400]
    for r, want in zip(out, (frames[0], frames[2], frames[4])):
        arr = media.decode_image_array(bytes(r.frame))
        assert int(np.abs(arr.astype(int) - want.astype(int)).max()) <= 3
