"""Multimodal binary-column operators (training-data pipeline).

Images/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata. Codec status:

- **REAL** (stdlib + numpy, no external libs): PPM/PGM (P6/P5),
  uncompressed 24-bit BMP, **PNG** (8-bit gray / RGB / palette /
  gray+alpha / RGBA, non-interlaced — full chunk+CRC parsing, zlib
  inflate, all five scanline filters reconstructed; plus a PNG encoder),
  **GIF** (87a/89a LZW incl. interlace; plus an encoder), **baseline
  JPEG** (`kernels/jpeg.py`: SOF0 Huffman + numpy IDCT, 4:4:4/4:2:2/
  4:2:0, restart markers; plus an encoder), and **MJPEG AVI video**
  (`kernels/avi.py`: RIFF container parse, real frame timestamps from
  the stream header, per-frame JPEG decode; plus a writer) — full decode
  to pixel arrays, nearest-neighbor resize with PPM-encoded thumbnails,
  and content-based embeddings (8×8 mean-pooled luminance grid,
  L2-normalized — near-duplicate images embed near each other, which is
  what the ANN operators consume).
- **STUBBED** (deterministic fakes): progressive JPEG and inter-frame
  video codecs (H.264/VP9/...) genuinely need libjpeg/ffmpeg, absent in
  this container. The stubs keep the schema, batch shape, and
  error-channel contracts identical, so swapping them for real codecs on
  a cluster changes nothing else.

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


# --- real codecs (stdlib + numpy): PPM/PGM and uncompressed 24-bit BMP -----

def _parse_pnm(b: bytes) -> np.ndarray:
    """Decode binary PPM (P6, RGB) / PGM (P5, gray) → uint8 array (H,W,C).

    Netpbm header: magic, then whitespace-separated width/height/maxval with
    ``#`` comments allowed, one whitespace byte, then the raster.
    """
    magic = b[:2]
    channels = 3 if magic == b"P6" else 1
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        fields.append(int(b[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError("unsupported PNM (maxval > 255 or bad dims)")
    need = w * h * channels
    raster = b[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated PNM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, channels)


def _parse_bmp(b: bytes) -> np.ndarray:
    """Decode uncompressed 24-bit BMP → uint8 array (H,W,3).

    BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER: rows bottom-up, BGR order,
    each row padded to 4 bytes.
    """
    import struct

    if len(b) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flipped = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    need = data_off + row_bytes * h
    if len(b) < need or w <= 0 or h == 0:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(
        b[data_off : data_off + row_bytes * h], dtype=np.uint8
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if flipped:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → raw channels per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_png(b: bytes) -> np.ndarray:
    """Decode PNG → uint8 array (H,W,C) — REAL, stdlib zlib only.

    Supported: 8-bit depth, color types 0 (gray) / 2 (RGB) / 3 (palette) /
    4 (gray+alpha) / 6 (RGBA), non-interlaced — i.e. what encoders emit for
    web images at 8-bit. Chunk CRCs are verified; all five scanline filters
    (None/Sub/Up/Average/Paeth) are reconstructed. Alpha is dropped
    (gray+alpha → gray, RGBA → RGB) so downstream thumbnail/embedding
    paths see 1- or 3-channel arrays like the other codecs. Interlaced or
    16-bit inputs raise into the per-row error channel.
    """
    import struct
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 12 <= len(b):
        ln, typ = struct.unpack_from(">I4s", b, pos)
        data = b[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", b, pos + 8 + ln)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG {typ.decode()} chunk CRC mismatch")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})"
        )
    nch = _PNG_CHANNELS.get(ctype)
    if nch is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if w <= 0 or h <= 0 or len(raw) != h * (stride + 1):
        raise ValueError("bad PNG raster size")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = nch
    for y in range(h):
        f = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up — fully vectorized
            rec = (line + prev) & 0xFF
        elif f == 1:  # Sub — sequential in-row (left-neighbor recurrence)
            rec = line
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif f == 3:  # Average
            rec = line
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                up = prev[i]
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = rec.astype(np.uint8)
    arr = out.reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        arr = plte[arr[:, :, 0]]
    elif ctype == 4:
        arr = arr[:, :, :1]
    elif ctype == 6:
        arr = arr[:, :, :3]
    return np.ascontiguousarray(arr)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (H,W,1|3|4) uint8 array as a valid PNG (filter 0, one IDAT)."""
    import struct
    import zlib

    h, w = arr.shape[:2]
    ctype = {1: 0, 3: 2, 4: 6}[arr.shape[2]]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes, clear/EOI, 12-bit cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    init = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(init)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = pos = 0
    while len(out) < expected:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(init)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or code > eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out)


def _parse_gif_frames(
    b: bytes, max_frames: int | None = None
) -> list[tuple[int, np.ndarray]]:
    """Decode GIF (87a/89a) → [(delay_ms, composited RGB frame)] — REAL LZW.

    Handles global/local color tables, interlacing (the four-pass row
    order), and for animations the graphic-control extension: per-frame
    delay, transparency index, and disposal methods 0/1 (leave in place),
    2 (restore background) and 3 (restore previous). Each emitted frame is
    the full logical-screen canvas after compositing, so sub-rectangle
    delta frames come out as complete images. Malformed streams raise into
    the per-row error channel.
    """
    import struct

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg, _ = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
        if len(gct) != n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:] = bg_rgb
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms, transparent, disposal = 0, None, 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            if not frames:
                raise ValueError("GIF contains no image data")
            return frames
        if block == 0x21:  # extension: label + sub-blocks
            label = b[pos] if pos < len(b) else 0
            pos += 1
            if label == 0xF9 and pos < len(b) and b[pos] == 4 and pos + 5 <= len(b):
                gpacked, delay_cs, tidx = struct.unpack_from("<BHB", b, pos + 1)
                disposal = (gpacked >> 2) & 0x07
                transparent = tidx if gpacked & 0x01 else None
                delay_ms = delay_cs * 10
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(b):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
            if len(palette) != n:
                raise ValueError("truncated GIF local color table")
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image with no color table")
        if w <= 0 or h <= 0:
            raise ValueError("bad GIF dimensions")
        min_code_size = b[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad GIF LZW min code size {min_code_size}")
        chunks = []
        while pos < len(b) and b[pos] != 0:
            ln = b[pos]
            chunks.append(b[pos + 1 : pos + 1 + ln])
            if len(chunks[-1]) != ln:
                raise ValueError("truncated GIF data sub-block")
            pos += 1 + ln
        pos += 1  # sub-block terminator
        idx = np.frombuffer(
            _lzw_decode(b"".join(chunks), min_code_size, w * h), np.uint8
        )
        if len(idx) < w * h:
            raise ValueError("short GIF pixel data")
        grid = idx[: w * h].reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            de = np.empty_like(grid)
            de[order] = grid
            grid = de
        if int(grid.max(initial=0)) >= len(palette):
            raise ValueError("GIF index outside color table")
        y1, x1 = min(top + h, sh), min(left + w, sw)  # clamp to screen
        sub = grid[: y1 - top, : x1 - left]
        saved = canvas.copy() if disposal == 3 else None
        px = palette[sub]
        if transparent is not None:
            mask = sub != transparent
            canvas[top:y1, left:x1][mask] = px[mask]
        else:
            canvas[top:y1, left:x1] = px
        frames.append((delay_ms, canvas.copy()))
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:
            canvas[top:y1, left:x1] = bg_rgb
        elif disposal == 3 and saved is not None:
            canvas = saved
        delay_ms, transparent, disposal = 0, None, 0  # GCE scopes one image
    if frames:
        return frames  # lenient: image data present, trailer missing
    raise ValueError("truncated GIF (no trailer)")


def _parse_gif(b: bytes) -> np.ndarray:
    """First frame of a GIF, composited on the logical screen (H,W,3).

    Animations beyond frame one ride the video operators
    (`sample_frames`); this is the still-image decode entry point.
    """
    return _parse_gif_frames(b, max_frames=1)[0][1]


def _gif_lzw_blocks(indices: np.ndarray, min_code: int) -> bytes:
    """Palette indices → length-prefixed LZW data sub-blocks.

    Uses the classic clear-code-per-symbol stream (code width never grows)
    — byte-inefficient but spec-valid and dependency-free; exists to
    produce real fixtures for the decoder and round-trip tests.
    """
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    cs = min_code + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += cs
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in indices.astype(np.int64):
        emit(int(v))
        emit(clear)  # reset each step: code width stays fixed
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return b"".join(
        bytes([len(out[i : i + 255])]) + bytes(out[i : i + 255])
        for i in range(0, len(out), 255)
    )


def _gif_palettize(flat: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """(N,3) pixels → (padded palette, indices, size_bits); ≤256 colors."""
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("GIF encode needs ≤256 distinct colors")
    size_bits = max(2, int(np.ceil(np.log2(max(2, len(palette))))))
    pal = np.zeros((1 << size_bits, 3), np.uint8)
    pal[: len(palette)] = palette
    return pal, inverse, size_bits


def encode_gif(arr: np.ndarray) -> bytes:
    """Encode a (H,W,3) uint8 array (≤256 distinct colors) as a valid GIF."""
    import struct

    h, w = arr.shape[:2]
    pal, inverse, size_bits = _gif_palettize(arr.reshape(-1, 3))
    min_code = size_bits
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
        + pal.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code]) + _gif_lzw_blocks(inverse, min_code) + b"\x00\x3b"
    )


def encode_gif_animated(
    frames: list[np.ndarray], delay_ms: int = 100, loop: int = 0
) -> bytes:
    """Encode (H,W,3) uint8 frames as an animated GIF89a.

    One global palette over the union of colors (≤256 total), a NETSCAPE2.0
    looping block, and per-frame graphic-control extensions carrying the
    delay (centisecond resolution) with disposal method 1 (leave in place).
    Fixture encoder for the animation decode path in `sample_frames`.
    """
    import struct

    if not frames:
        raise ValueError("encode_gif_animated needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    pal, inverse, size_bits = _gif_palettize(stacked)
    min_code = size_bits
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    out += pal.tobytes()
    out += (  # NETSCAPE2.0 application extension: loop count
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    )
    per = h * w
    for i in range(len(frames)):
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 1 << 2, max(1, delay_ms // 10), 0  # disposal 1, no transparency
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        out += _gif_lzw_blocks(inverse[i * per : (i + 1) * per], min_code)
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_image_array(content: bytes) -> np.ndarray | None:
    """Pixel array for formats this engine decodes natively, else None.

    None = "not a format we decode here" (falls back to the deterministic
    stub); malformed data in a RECOGNIZED format raises — that is the
    per-row error-channel contract.
    """
    if content[:2] in (b"P6", b"P5"):
        return _parse_pnm(content)
    if content[:2] == b"BM":
        return _parse_bmp(content)
    if content[:8] == _PNG_SIG:
        return _parse_png(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return _parse_gif(content)
    if content[:2] == b"\xff\xd8":
        from mmkg_rag_spark.kernels.jpeg import decode_jpeg

        return decode_jpeg(content)
    return None


def _resize_nearest(arr: np.ndarray, max_side: int) -> np.ndarray:
    h, w = arr.shape[:2]
    scale = min(1.0, max_side / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return arr[yi][:, xi]


def _encode_ppm(arr: np.ndarray) -> bytes:
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _embed_pixels(arr: np.ndarray, dim: int = 64) -> np.ndarray:
    """Content-based embedding: 8×8 mean-pooled luminance grid, L2-normed.

    Grid mean-pooling is translation-stable enough that near-duplicate
    images (recompressed / lightly noised / rescaled) land at high cosine —
    the property operators/ann.py + embedding_near_duplicates consume.
    """
    g = arr.astype(np.float64).mean(axis=2)
    side = int(dim ** 0.5)
    h, w = g.shape
    ys = np.linspace(0, h, side + 1).astype(np.int64)
    xs = np.linspace(0, w, side + 1).astype(np.int64)
    pooled = np.empty((side, side), dtype=np.float64)
    for i in range(side):
        for j in range(side):
            block = g[ys[i]:max(ys[i] + 1, ys[i + 1]), xs[j]:max(xs[j] + 1, xs[j + 1])]
            pooled[i, j] = block.mean()
    v = pooled.ravel() - pooled.mean()
    n = np.linalg.norm(v)
    if n < 1e-12:  # flat image: fall back to a constant unit direction
        v = np.ones(dim, dtype=np.float64)
        n = np.linalg.norm(v)
    return (v / n).astype(np.float32)


# --- stub codecs (compressed formats; replace with PIL/ffmpeg on cluster) --

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


# --- real audio codec (stdlib wave): PCM RIFF/WAVE --------------------------

AUDIO_SCHEMA = (
    "media_id long, url string, sample_rate int, n_channels int, "
    "n_samples long, duration_ms long, decode_ok boolean, decode_error string"
)

AUDIO_EMBED_DIM = 64


def _g711_mulaw_table() -> np.ndarray:
    """All 256 µ-law codewords → linear values in [-1, 1] (G.711 decode)."""
    codes = np.arange(256, dtype=np.int64)
    u = ~codes & 0xFF  # µ-law bytes are transmitted complemented
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 1) + 33) << exp) - 33  # 14-bit magnitude, max 8159
    return np.where(sign, -mag, mag) / 8159.0


def _g711_alaw_table() -> np.ndarray:
    """All 256 A-law codewords → linear values in [-1, 1] (G.711 decode)."""
    codes = np.arange(256, dtype=np.int64)
    a = codes ^ 0x55  # even bits are inverted on the wire
    positive = (a & 0x80) != 0  # A-law sign bit is 1 for positive
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(positive, mag, -mag) / 32256.0


def _g711_encode(x: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Nearest-codeword companding encode (uint8) for a 256-entry decode table.

    Argmin over the decode table is exactly the optimal quantizer, so
    encode∘decode is identity on codewords by construction — no subtle
    segment-boundary bugs to get wrong.
    """
    order = np.argsort(table)
    sorted_vals = table[order]
    idx = np.searchsorted(sorted_vals, x).clip(1, 255)
    lo, hi = sorted_vals[idx - 1], sorted_vals[idx]
    nearest = np.where(np.abs(x - lo) <= np.abs(hi - x), idx - 1, idx)
    return order[nearest].astype(np.uint8)


def _parse_wav_chunks(content: bytes) -> tuple[dict, bytes]:
    """RIFF/WAVE chunk walk → (fmt fields, raw data bytes). For the formats
    stdlib ``wave`` rejects (µ-law / A-law / IEEE float)."""
    import struct

    if content[8:12] != b"WAVE":
        raise ValueError("RIFF is not a WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            tag, nch, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            fmt = {"tag": tag, "nch": nch, "sr": sr, "bits": bits}
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return fmt, data


def decode_audio_array(content: bytes) -> tuple[np.ndarray, int] | None:
    """WAV → (mono float64 samples in [-1,1], sample_rate); None if not RIFF.

    stdlib ``wave`` handles 8/16/32-bit integer PCM; µ-law (fmt 7), A-law
    (fmt 6) and IEEE float (fmt 3) are decoded by the chunk walk above —
    G.711 telephony WAVs are common in scraped web corpora and stdlib
    ``wave`` rejects them. Malformed RIFF raises into the per-row error
    channel (same contract as the image codecs).
    """
    if content[:4] != b"RIFF":
        return None
    import io
    import wave

    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            sr = w.getframerate()
            nch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except wave.Error:
        fmt, raw = _parse_wav_chunks(content)
        sr, nch = fmt["sr"], max(fmt["nch"], 1)
        if fmt["tag"] == 7 and fmt["bits"] == 8:  # G.711 µ-law
            x = _g711_mulaw_table()[np.frombuffer(raw, np.uint8)]
        elif fmt["tag"] == 6 and fmt["bits"] == 8:  # G.711 A-law
            x = _g711_alaw_table()[np.frombuffer(raw, np.uint8)]
        elif fmt["tag"] == 3 and fmt["bits"] in (32, 64):  # IEEE float
            dt = "<f4" if fmt["bits"] == 32 else "<f8"
            x = np.frombuffer(raw[: len(raw) // (fmt["bits"] // 8) * (fmt["bits"] // 8)], dt)
            x = np.clip(x.astype(np.float64), -1.0, 1.0)
        else:
            raise ValueError(
                f"unsupported WAV format tag {fmt['tag']} ({fmt['bits']}-bit)"
            )
        if nch > 1:
            x = x[: len(x) // nch * nch].reshape(-1, nch).mean(axis=1)
        return x, sr
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2**31
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


def _center_unit(feats: np.ndarray) -> np.ndarray:
    """Mean-center + L2-normalize; flat vectors fall back to a constant
    unit direction (keeps cosine defined for silence)."""
    v = feats - feats.mean()
    n = np.linalg.norm(v)
    if n < 1e-12:
        v = np.ones(len(feats), dtype=np.float64)
        n = np.linalg.norm(v)
    return v / n


def _embed_audio_samples(
    x: np.ndarray, sr: int | None = None, dim: int = AUDIO_EMBED_DIM
) -> np.ndarray:
    """Content-based audio embedding: RMS envelope ⊕ log-band spectrum.

    Two equally-weighted halves of ``dim``/2 each, L2-normed per half:

    - **envelope**: RMS over equal time windows — captures temporal energy
      shape (speech rhythm, onsets).
    - **spectrum**: Hann-windowed power spectra (1024-pt frames, hop 512)
      averaged over the clip, log-pooled into geometric bands from 50 Hz to
      min(sr/2, 8 kHz) — captures timbre/pitch, so two constant-level clips
      with different spectral content (e.g. a 440 Hz vs an 880 Hz tone) are
      separated, which an envelope-only embedding cannot do. Absolute-Hz
      band edges make the vector comparable across sample rates; without
      ``sr`` the bands span normalized frequency instead.

    Both halves are invariant to re-leveling (gain scales RMS linearly and
    shifts log-power by a constant; mean-center + L2 removes both), so
    re-encoded/re-leveled copies land at high cosine — the property
    operators/ann.py and embedding_near_duplicates consume.
    """
    half = dim // 2
    n = len(x)
    if n == 0:
        v = np.ones(dim, dtype=np.float64)
        return (v / np.linalg.norm(v)).astype(np.float32)
    bounds = np.linspace(0, n, half + 1).astype(np.int64)
    env = np.empty(half, dtype=np.float64)
    for i in range(half):
        seg = x[bounds[i]:max(bounds[i] + 1, bounds[i + 1])]
        env[i] = np.sqrt(np.mean(seg * seg))

    nfft = 1024
    if n < nfft:
        frames = np.pad(x, (0, nfft - n))[None, :]
    else:
        hop = nfft // 2
        starts = np.arange(0, n - nfft + 1, hop)
        frames = np.stack([x[s : s + nfft] for s in starts])
    psd = np.abs(np.fft.rfft(frames * np.hanning(nfft), axis=1)) ** 2
    psd = psd.mean(axis=0)  # average power spectrum over the clip
    nyq = (sr / 2.0) if sr else 1.0
    lo_hz = 50.0 if sr else nyq / 160.0
    hi_hz = min(nyq, 8000.0) if sr else nyq
    edges_hz = np.geomspace(lo_hz, hi_hz, half + 1)
    edges = np.clip((edges_hz / nyq * (len(psd) - 1)).astype(np.int64), 0, len(psd) - 1)
    # floor each band 20 dB below the clip's mean power: bands that are
    # "quiet relative to this clip" all read the same, so low-level noise
    # from re-encoding (the near-dup case) can't swing empty bands, and the
    # relative floor keeps the vector gain-invariant
    floor = 1e-2 * psd.mean() + 1e-30
    spec = np.empty(half, dtype=np.float64)
    for i in range(half):
        band = psd[edges[i]:max(edges[i] + 1, edges[i + 1])]
        spec[i] = np.log10(band.mean() + floor)

    v = np.concatenate([_center_unit(env), _center_unit(spec)]) / np.sqrt(2.0)
    return v.astype(np.float32)


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
                    b = bytes(content) if content is not None else b""
                    arr = decode_image_array(b)
                    if arr is not None:
                        h, w, c = arr.shape
                    else:
                        w, h, c = _decode_image_stub(b)
                    rows.append((int(mid), url, int(w), int(h), int(c), True, None))
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
                b = bytes(content)
                try:
                    arr = decode_image_array(b)
                except Exception:  # noqa: BLE001
                    continue
                if arr is not None:
                    # real path: nearest-neighbor downscale, PPM thumbnail
                    small = _resize_nearest(arr, max_side)
                    rows.append(
                        (int(mid), url, int(small.shape[1]), int(small.shape[0]),
                         _encode_ppm(small))
                    )
                    continue
                try:
                    w, h, _ = _decode_image_stub(b)
                except Exception:  # noqa: BLE001
                    continue
                scale = min(1.0, max_side / max(w, h))
                rows.append(
                    (int(mid), url, int(w * scale), int(h * scale),
                     hashlib.sha256(b).digest())
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
                b = bytes(content)
                try:
                    arr = decode_image_array(b)
                except Exception:  # noqa: BLE001
                    arr = None
                ids.append(int(mid))
                urls.append(url)
                vecs.append(
                    (_embed_pixels(arr) if arr is not None else _embed_stub(b)).tolist()
                )
            yield pd.DataFrame({"media_id": ids, "url": urls, "embedding": vecs})

    return media.select("media_id", "url", "content").mapInPandas(gen, schema=EMBED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling: one row per sampled frame.

    REAL for MJPEG AVI (`kernels/avi.py`), animated GIF, and YUV4MPEG2
    raw video (`kernels/y4m.py`): the container is parsed, frame
    timestamps come from the stream header (AVI fps / GIF per-frame
    delays with zero delays clamped to the 100 ms browser convention /
    Y4M F-rate), and the emitted ``frame`` payloads are actual images —
    per-frame JPEGs for AVI, PNG-encoded composited canvases for GIF,
    PNG-encoded BT.601 conversions for Y4M — decodable by
    `decode_image_array`, so thumbnails/embeddings compose downstream. Sampling keeps the first frame at or after each
    ``every_ms`` boundary, up to ``max_frames``. Inter-frame codecs fall
    back to the disclosed deterministic stub (duration from the payload
    hash, sha256(content||index) frame payloads) — the fan-out shape (one
    input row → ≤ max_frames output rows through mapInPandas) is
    identical.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mmkg_rag_spark.kernels.avi import decode_avi_mjpeg

        def sample_real(mid: int, url: str, seq, rows: list) -> None:
            next_ts = 0
            taken = 0
            for ts_ms, payload in seq:
                if ts_ms < next_ts:
                    continue
                rows.append((mid, url, taken, int(ts_ms), payload))
                taken += 1
                next_ts += every_ms
                if taken >= max_frames:
                    break

        def gif_frames(c: bytes):
            ts = 0
            for delay_ms, canvas in _parse_gif_frames(c):
                yield ts, encode_png(canvas)
                ts += delay_ms if delay_ms > 0 else 100

        def y4m_frames(c: bytes):
            from mmkg_rag_spark.kernels.y4m import decode_y4m

            for ts_ms, rgb in decode_y4m(c)[0]:
                yield ts_ms, encode_png(rgb)

        for pdf in batches:
            rows = []
            for mid, url, content, mtype in zip(
                pdf["media_id"], pdf["url"], pdf["content"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                c = bytes(content)
                if (
                    (c[:4] == b"RIFF" and c[8:12] == b"AVI ")
                    or c[:6] in (b"GIF87a", b"GIF89a")
                    or c[:9] == b"YUV4MPEG2"
                ):
                    # malformed containers drop the row (same contract as
                    # resize_images: sampling is a best-effort projection)
                    try:
                        if c[:3] == b"GIF":
                            seq = gif_frames(c)
                        elif c[:9] == b"YUV4MPEG2":
                            seq = y4m_frames(c)
                        else:
                            seq = decode_avi_mjpeg(c)[0]
                        sample_real(int(mid), url, seq, rows)
                    except Exception:  # noqa: BLE001
                        pass
                    continue
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


def decode_audio(media: DataFrame) -> DataFrame:
    """Audio metadata per clip with the per-row error channel.

    Real decode for PCM WAV (stdlib ``wave``); non-RIFF payloads get
    deterministic stub metadata (compressed formats need ffmpeg). Map-only.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, url, content in zip(pdf["media_id"], pdf["url"], pdf["content"]):
                try:
                    b = bytes(content) if content is not None else b""
                    dec = decode_audio_array(b)
                    if dec is not None:
                        x, sr = dec
                        n = len(x)
                        rows.append(
                            (int(mid), url, int(sr), 1, int(n),
                             int(n * 1000 / sr) if sr else 0, True, None)
                        )
                    else:
                        if not b:
                            raise ValueError("empty audio payload")
                        h = hashlib.sha256(b).digest()
                        sr = 8000 * (1 + int.from_bytes(h[:1], "big") % 6)
                        n = 1000 + int.from_bytes(h[1:4], "big") % 10_000_000
                        rows.append(
                            (int(mid), url, sr, 1, n, int(n * 1000 / sr), True, None)
                        )
                except Exception as exc:  # noqa: BLE001 — per-row error channel
                    rows.append((int(mid), url, None, None, None, None, False, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "url", "sample_rate", "n_channels",
                    "n_samples", "duration_ms", "decode_ok", "decode_error",
                ],
            )

    return media.select("media_id", "url", "content").mapInPandas(
        gen, schema=AUDIO_SCHEMA
    )


def embed_audio(media: DataFrame) -> DataFrame:
    """Audio feature extraction → array<float> (feeds operators/ann.py).

    Real envelope⊕spectrum embeddings for decodable WAV (PCM / G.711 /
    IEEE float); hash-stub vectors otherwise.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, urls, vecs = [], [], []
            for mid, url, content in zip(pdf["media_id"], pdf["url"], pdf["content"]):
                b = bytes(content)
                try:
                    dec = decode_audio_array(b)
                except Exception:  # noqa: BLE001
                    dec = None
                ids.append(int(mid))
                urls.append(url)
                vecs.append(
                    (
                        _embed_audio_samples(dec[0], sr=dec[1])
                        if dec is not None
                        else _embed_stub(b)
                    ).tolist()
                )
            yield pd.DataFrame({"media_id": ids, "url": urls, "embedding": vecs})

    return media.select("media_id", "url", "content").mapInPandas(gen, schema=EMBED_SCHEMA)
