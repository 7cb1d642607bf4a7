"""Multimodal binary-column plumbing: schema, batch shape, error channel."""

from __future__ import annotations

import hashlib

import pytest

from mmkg_rag_spark.operators import ann, media


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-med")


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, "u0", "image", b"payload-zero-" * 100, {"src": "crawl"}),
        (1, "u1", "image", b"payload-one-" * 2000, {}),
        (2, "u2", "image", b"!bad corrupt bytes", {}),
        (3, "u3", "video", b"video-bytes-" * 500, {}),
        (4, "u4", "image", b"payload-zero-" * 100, {}),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, media.MEDIA_SCHEMA)


def test_decode_error_channel(media_df):
    out = {r.media_id: r for r in media.decode_images(media_df).collect()}
    assert out[0].decode_ok and out[0].width >= 64 and out[0].channels == 3
    assert not out[2].decode_ok and "corrupt" in out[2].decode_error
    assert out[0].width == out[4].width  # deterministic per content
    assert len(out) == 5  # bad rows kept, never dropped silently


def test_resize_drops_bad_and_scales(media_df):
    out = {r.media_id: r for r in media.resize_images(media_df, max_side=128).collect()}
    assert 2 not in out  # undecodable dropped here (decode_images keeps them)
    assert max(out[0].thumb_width, out[0].thumb_height) <= 128
    assert bytes(out[0].thumb) == hashlib.sha256(b"payload-zero-" * 100).digest()


def test_embed_feeds_ann(media_df, spark):
    emb = media.embed_images(media_df)
    rows = emb.collect()
    assert all(len(r.embedding) == media.EMBED_DIM for r in rows)
    # dup payloads → identical embeddings; ANN finds the planted duplicate
    q = emb.filter("media_id = 0").selectExpr(
        "media_id as query_id", "embedding as query_vec"
    )
    top = ann.brute_topk_cosine(
        emb, q, k=1, id_col="media_id", vec_col="embedding"
    ).collect()
    assert top[0].nn_id == 4 and top[0].score == 1.0


def test_frame_sampling_fanout(media_df):
    frames = media.sample_frames(media_df, every_ms=1000, max_frames=8).collect()
    assert frames and all(r.media_id == 3 for r in frames)
    idx = sorted(r.frame_index for r in frames)
    assert idx == list(range(len(idx)))
    assert all(r.ts_ms == r.frame_index * 1000 for r in frames)
    # deterministic frame payloads
    assert len({bytes(r.frame) for r in frames}) == len(frames)


def test_balance_by_bytes(media_df):
    out = media.balance_by_bytes(media_df, target_partition_bytes=10_000)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == 5


def _make_ppm(w, h, fn):
    import numpy as np

    arr = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            arr[y, x] = fn(x, y)
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + arr.tobytes(), arr


def _make_bmp(w, h, fn):
    """Uncompressed 24-bit bottom-up BMP."""
    import struct

    import numpy as np

    arr = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            arr[y, x] = fn(x, y)
    row_bytes = (w * 3 + 3) & ~3
    raster = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        raster += row + b"\x00" * (row_bytes - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + info + raster, arr


def test_real_codec_decode(spark):
    import numpy as np

    ppm, parr = _make_ppm(6, 4, lambda x, y: (x * 40, y * 60, 10))
    bmp, barr = _make_bmp(5, 3, lambda x, y: (x * 50, y * 80, 200))
    got_p = media.decode_image_array(ppm)
    got_b = media.decode_image_array(bmp)
    assert got_p.shape == (4, 6, 3) and np.array_equal(got_p, parr)
    assert got_b.shape == (3, 5, 3) and np.array_equal(got_b, barr)

    df = spark.createDataFrame(
        [
            (10, "p", "image", ppm, {}),
            (11, "b", "image", bmp, {}),
            (12, "bad", "image", b"P6\n6 4\n255\n" + b"\x00" * 5, {}),  # truncated
        ],
        media.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in media.decode_images(df).collect()}
    assert (out[10].width, out[10].height, out[10].channels) == (6, 4, 3)
    assert (out[11].width, out[11].height) == (5, 3)
    assert not out[12].decode_ok and "truncated" in out[12].decode_error


def test_real_codec_resize_roundtrip(spark):
    ppm, _ = _make_ppm(64, 32, lambda x, y: (x * 4, y * 8, 0))
    df = spark.createDataFrame([(20, "p", "image", ppm, {})], media.MEDIA_SCHEMA)
    out = media.resize_images(df, max_side=16).collect()[0]
    assert (out.thumb_width, out.thumb_height) == (16, 8)
    thumb_arr = media.decode_image_array(bytes(out.thumb))  # thumb is valid PPM
    assert thumb_arr.shape == (8, 16, 3)


def test_real_codec_embedding_similarity(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, size=(32, 32, 3)).astype("uint8")
    noisy = np.clip(
        base.astype(int) + rng.integers(-8, 9, size=base.shape), 0, 255
    ).astype("uint8")
    other = rng.integers(0, 255, size=(32, 32, 3)).astype("uint8")

    def ppm(a):
        return b"P6\n%d %d\n255\n" % (a.shape[1], a.shape[0]) + a.tobytes()

    df = spark.createDataFrame(
        [
            (0, "base", "image", ppm(base), {}),
            (1, "noisy", "image", ppm(noisy), {}),
            (2, "other", "image", ppm(other), {}),
        ],
        media.MEDIA_SCHEMA,
    )
    vecs = {r.media_id: np.array(r.embedding) for r in media.embed_images(df).collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(vecs[0], vecs[1]) > 0.9   # near-duplicate embeds close
    assert cos(vecs[0], vecs[2]) < 0.5   # unrelated image does not


def _make_wav(freq, sr=8000, ms=200, amp=0.5, noise=0.0, seed=3):
    import io
    import wave

    import numpy as np

    t = np.arange(int(sr * ms / 1000)) / sr
    x = amp * np.sin(2 * np.pi * freq * t)
    if noise:
        x = x + noise * np.random.default_rng(seed).standard_normal(len(t))
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm)
    return buf.getvalue()


def test_audio_decode_real_and_stub(spark):
    wav = _make_wav(440)
    df = spark.createDataFrame(
        [
            (0, "w", "audio", wav, {}),
            (1, "s", "audio", b"not-riff-payload" * 10, {}),
            (2, "bad", "audio", b"RIFF" + b"\x00" * 10, {}),  # malformed RIFF
        ],
        media.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in media.decode_audio(df).collect()}
    assert out[0].decode_ok and out[0].sample_rate == 8000
    assert out[0].n_samples == 1600 and out[0].duration_ms == 200
    assert out[1].decode_ok  # stub path for unknown formats
    assert not out[2].decode_ok  # malformed recognized format -> error channel


def test_audio_embedding_similarity(spark):
    import numpy as np

    df = spark.createDataFrame(
        [
            # same envelope, light noise + re-leveled -> near-dup
            (0, "a", "audio", _make_wav(440, amp=0.5), {}),
            (1, "b", "audio", _make_wav(440, amp=0.4, noise=0.01), {}),
            # different envelope (amplitude ramps vs constant): distinguishable
            (2, "c", "audio", _make_wav(5, amp=0.9), {}),
        ],
        media.MEDIA_SCHEMA,
    )
    vecs = {r.media_id: np.array(r.embedding) for r in media.embed_audio(df).collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(vecs[0], vecs[1]) > 0.95
    assert cos(vecs[0], vecs[2]) < cos(vecs[0], vecs[1])


def _raw_wav(fmt_tag, bits, data, nch=1, sr=8000):
    """Hand-rolled RIFF/WAVE for the formats stdlib ``wave`` can't write."""
    import struct

    block = max(1, nch * bits // 8)
    fmt = struct.pack("<HHIIHH", fmt_tag, nch, sr, sr * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_g711_tables_match_published_anchors():
    """Spec anchor points: µ-law ±0 at 0xFF/0x7F, max magnitude 8031/8159;
    A-law smallest step ±8 at 0xD5/0x55, full scale ±32256."""
    import numpy as np

    mu, al = media._g711_mulaw_table(), media._g711_alaw_table()
    assert mu[0xFF] == 0.0 and mu[0x7F] == 0.0
    assert abs(mu[0x80] * 8159 - 8031) < 1e-9 and abs(mu[0x00] * 8159 + 8031) < 1e-9
    assert abs(al[0xD5] * 32256 - 8) < 1e-9 and abs(al[0x55] * 32256 + 8) < 1e-9
    assert abs(al[0xAA] * 32256 - 32256) < 1e-9 and abs(al[0x2A] * 32256 + 32256) < 1e-9
    # nearest-codeword encode makes every codeword a fixed point
    for tbl in (mu, al):
        assert (tbl[media._g711_encode(tbl, tbl)] == tbl).all()


def test_wav_g711_and_float_decode():
    """µ-law / A-law / IEEE-float WAVs decode within companding error;
    stdlib wave rejects all three (they hit the manual chunk walk)."""
    import numpy as np

    t = np.arange(1600) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    mu, al = media._g711_mulaw_table(), media._g711_alaw_table()
    for tag, codes in (
        (7, media._g711_encode(x, mu).tobytes()),
        (6, media._g711_encode(x, al).tobytes()),
    ):
        dec, sr = media.decode_audio_array(_raw_wav(tag, 8, codes))
        assert sr == 8000 and len(dec) == 1600
        assert float(np.abs(dec - x).max()) < 0.02  # G.711 quantization bound
    stereo = np.stack([x, -x], axis=1).astype("<f4")
    dec, _ = media.decode_audio_array(_raw_wav(3, 32, stereo.tobytes(), nch=2))
    assert float(np.abs(dec).max()) < 1e-6  # mono mixdown of x and -x
    with pytest.raises(ValueError, match="unsupported WAV format"):
        media.decode_audio_array(_raw_wav(2, 4, b"\x00" * 64))  # ADPCM


def test_audio_embedding_spectral_discrimination():
    """Same energy envelope, different pitch → separated (envelope-only
    embeddings cannot do this); G.711 recompression → near-dup cosine."""
    import numpy as np

    t = np.arange(1600) / 8000.0
    a = 0.5 * np.sin(2 * np.pi * 440 * t)
    b = 0.5 * np.sin(2 * np.pi * 880 * t)  # identical RMS envelope
    mu = media._g711_mulaw_table()
    recompressed = mu[media._g711_encode(a, mu)]
    ea = media._embed_audio_samples(a, sr=8000)
    eb = media._embed_audio_samples(b, sr=8000)
    er = media._embed_audio_samples(recompressed, sr=8000)
    assert float(ea @ eb) < 0.6  # pitch separates despite equal envelopes
    assert float(ea @ er) > 0.99  # lossy re-encode stays a near-dup
    assert abs(float(np.linalg.norm(ea)) - 1.0) < 1e-5


# --- real PNG codec (stdlib zlib; round-3) ----------------------------------

def _png_filter_rows(arr, filters):
    """Apply PNG scanline filters (encoder side) to a raster — the inverse
    of _parse_png's reconstruction, used to exercise every filter type."""
    import numpy as np

    h, w, nch = arr.shape
    stride = w * nch
    flat = arr.reshape(h, stride).astype(np.int32)
    out = []
    for y, f in enumerate(filters):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        filt = np.empty(stride, np.int32)
        for i in range(stride):
            a = cur[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (cur[i] - pred) & 0xFF
        out.append(bytes([f]) + filt.astype(np.uint8).tobytes())
    return b"".join(out)


def _make_png(arr, filters=None, ctype=None, plte=None):
    import struct
    import zlib

    import numpy as np

    h, w, nch = arr.shape
    if ctype is None:
        ctype = {1: 0, 3: 2, 4: 6}[nch]
    raw = _png_filter_rows(arr, filters or [0] * h)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    body = chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    if plte is not None:
        body += chunk(b"PLTE", np.asarray(plte, np.uint8).tobytes())
    body += chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def test_png_roundtrip_all_channel_layouts():
    import numpy as np

    rng = np.random.default_rng(3)
    for nch in (1, 3, 4):
        arr = rng.integers(0, 256, (9, 7, nch), dtype=np.uint8)
        dec = media.decode_image_array(media.encode_png(arr))
        want = arr[:, :, :3] if nch == 4 else arr  # alpha dropped
        assert dec.shape == want.shape and (dec == want).all()


def test_png_all_filter_types_reconstruct():
    import numpy as np

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    png = _make_png(arr, filters=[0, 1, 2, 3, 4])
    dec = media.decode_image_array(png)
    assert (dec == arr).all()


def test_png_palette():
    import numpy as np

    plte = [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    idx = np.array([[[0], [1]], [[2], [1]]], dtype=np.uint8)
    dec = media.decode_image_array(_make_png(idx, ctype=3, plte=plte))
    assert dec.shape == (2, 2, 3)
    assert dec[0, 0].tolist() == [255, 0, 0] and dec[1, 0].tolist() == [0, 0, 255]


def test_png_rejects_corruption_and_unsupported():
    import struct
    import numpy as np

    arr = np.zeros((3, 3, 3), dtype=np.uint8)
    good = media.encode_png(arr)
    # flip a byte inside the IDAT payload → CRC mismatch must raise
    bad = bytearray(good)
    bad[len(good) - 20] ^= 0xFF
    with pytest.raises(ValueError):
        media.decode_image_array(bytes(bad))
    # 16-bit depth is declared unsupported, not mis-decoded
    hdr_at = good.index(b"IHDR") - 4
    bad16 = bytearray(good)
    bad16[hdr_at + 4 + 4 + 8] = 16  # depth byte inside IHDR
    with pytest.raises(ValueError):
        media.decode_image_array(bytes(bad16))


def test_png_flows_through_decode_operator(spark):
    """decode_images reports the REAL dimensions for PNG payloads (the
    stub would hash-derive different ones)."""
    import numpy as np

    arr = np.full((12, 34, 3), 7, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "u1", "image", bytearray(media.encode_png(arr)), {})],
        media.MEDIA_SCHEMA,
    )
    row = media.decode_images(df).collect()[0]
    assert (row.width, row.height, row.channels, row.decode_ok) == (34, 12, 3, True)


# --- real GIF codec (LZW; round-3) ------------------------------------------

def test_gif_roundtrip():
    import numpy as np

    rng = np.random.default_rng(7)
    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [200, 100, 50]],
        dtype=np.uint8,
    )
    arr = palette[rng.integers(0, 5, (11, 13))]
    dec = media.decode_image_array(media.encode_gif(arr))
    assert dec.shape == (11, 13, 3) and (dec == arr).all()


def test_gif_interlaced_and_extensions():
    """Interlace row order is undone, and extension blocks are skipped."""
    import numpy as np

    arr = np.stack(
        [np.full((6, 3), 40 * i, dtype=np.uint8) for i in range(8)]
    ).reshape(8, 6, 3)
    # rows in the 4-pass interlace arrival order, flag patched on
    order = np.concatenate(
        [np.arange(0, 8, 8), np.arange(4, 8, 8), np.arange(2, 8, 4),
         np.arange(1, 8, 2)]
    )
    gif = bytearray(media.encode_gif(arr[order]))
    n = 2 << (gif[10] & 0x07)
    ipacked_at = 13 + 3 * n + 9
    assert gif[13 + 3 * n] == 0x2C and gif[ipacked_at] == 0
    gif[ipacked_at] = 0x40
    # splice a graphic-control extension before the image descriptor
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    gif2 = bytes(gif[: 13 + 3 * n]) + ext + bytes(gif[13 + 3 * n :])
    dec = media.decode_image_array(gif2)
    assert (dec == arr).all()


def test_gif_rejects_truncation():
    import numpy as np

    good = media.encode_gif(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        media.decode_image_array(good[: len(good) // 2])
    with pytest.raises(ValueError):
        media.decode_image_array(b"GIF89a\x00")


# --- animated GIF (round-3) --------------------------------------------------

def _gif_pal():
    import numpy as np

    return np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )


def test_gif_animated_roundtrip_delays_and_pixels():
    import numpy as np

    pal = _gif_pal()
    rng = np.random.default_rng(4)
    frames = [pal[rng.integers(0, 4, (9, 14))] for _ in range(5)]
    gif = media.encode_gif_animated(frames, delay_ms=250)
    dec = media._parse_gif_frames(gif)
    assert [d for d, _ in dec] == [250] * 5
    for (_, got), want in zip(dec, frames):
        assert (got == want).all()
    # still-image decode of an animation = first frame
    assert (media.decode_image_array(gif) == frames[0]).all()


def _hand_gif(image_blocks: list, sw: int = 2, sh: int = 2) -> bytes:
    """Hand-assembled GIF: 4-color GCT; blocks = (gce|None, rect, indices).

    gce = (disposal, transparent_idx|None); rect = (left, top, w, h).
    """
    import struct

    import numpy as np

    pal = np.zeros((4, 3), np.uint8)
    pal[:4] = _gif_pal()
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0x80 | 1, 0, 0))
    out += pal.tobytes()
    for gce, (left, top, w, h), idx in image_blocks:
        if gce is not None:
            disposal, tidx = gce
            flags = (disposal << 2) | (1 if tidx is not None else 0)
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", flags, 10, tidx if tidx is not None else 0
            ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        out += bytes([2]) + media._gif_lzw_blocks(np.array(idx), 2) + b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_transparency_composites_over_previous_frame():
    import numpy as np

    pal = _gif_pal()
    gif = _hand_gif(
        [
            (None, (0, 0, 2, 2), [1, 1, 1, 1]),  # full red
            # full-screen delta: top row transparent (idx 2), bottom blue
            ((0, 2), (0, 0, 2, 2), [2, 2, 3, 3]),
        ]
    )
    dec = media._parse_gif_frames(gif)
    assert len(dec) == 2
    want = np.stack([[pal[1], pal[1]], [pal[3], pal[3]]])
    assert (dec[1][1] == want).all()


def test_gif_disposal_background_and_previous():
    import numpy as np

    pal = _gif_pal()
    # f1 full red; f2 green 1x1 at (0,0) with disposal=2 (restore bg);
    # f3 fully transparent -> shows canvas: bg at (0,0), red elsewhere
    gif = _hand_gif(
        [
            (None, (0, 0, 2, 2), [1, 1, 1, 1]),
            ((2, None), (0, 0, 1, 1), [2]),
            ((0, 0), (0, 0, 2, 2), [0, 0, 0, 0]),  # idx 0 transparent
        ]
    )
    dec = media._parse_gif_frames(gif)
    assert (dec[1][1][0, 0] == pal[2]).all()  # green drawn
    f3 = dec[2][1]
    assert (f3[0, 0] == pal[0]).all()  # restored to background
    assert (f3[1, 1] == pal[1]).all()  # red untouched
    # disposal=3 (restore previous): f3 equals f1
    gif3 = _hand_gif(
        [
            (None, (0, 0, 2, 2), [1, 1, 1, 1]),
            ((3, None), (0, 0, 1, 1), [2]),
            ((0, 0), (0, 0, 2, 2), [0, 0, 0, 0]),
        ]
    )
    dec3 = media._parse_gif_frames(gif3)
    assert (dec3[2][1] == dec3[0][1]).all()


def test_gif_animation_through_sample_frames(spark):
    """Animated GIFs ride the video path: container delays become
    timestamps, payloads are PNG canvases that feed the image operators."""
    import numpy as np

    pal = _gif_pal()
    rng = np.random.default_rng(9)
    frames = [pal[rng.integers(0, 4, (8, 10))] for _ in range(6)]
    gif = media.encode_gif_animated(frames, delay_ms=250)
    df = spark.createDataFrame(
        [
            (1, "anim", "video", bytearray(gif), {}),
            (2, "still-typed-video", "video", bytearray(b"GIF89a\x00"), {}),
        ],
        media.MEDIA_SCHEMA,
    )
    out = sorted(
        (r for r in media.sample_frames(df, every_ms=500, max_frames=3).collect()),
        key=lambda r: r.frame_index,
    )
    # malformed GIF row dropped; 250 ms frames sampled at 500 ms -> 0,2,4
    assert [r.media_id for r in out] == [1, 1, 1]
    assert [r.ts_ms for r in out] == [0, 500, 1000]
    for r, want in zip(out, (frames[0], frames[2], frames[4])):
        arr = media.decode_image_array(bytes(r.frame))
        assert (arr == want).all()
