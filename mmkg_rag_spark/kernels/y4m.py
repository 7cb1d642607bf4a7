"""YUV4MPEG2 (.y4m) raw-video codec — REAL, stdlib+numpy only.

The uncompressed interchange format video toolchains pipe between stages
(`ffmpeg -f yuv4mpeg2`, mjpegtools, VP9/AV1 reference encoders read it).
Stream layout (public spec, mjpegtools YUV4MPEG2(5)):

    YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip] [A<n>:<d>] [C<chroma>]\\n
    FRAME[ params]\\n  <Y plane> <U plane> <V plane>
    FRAME[ params]\\n  ...

Supported chroma tags: ``C420`` family (420 / 420jpeg / 420mpeg2 /
420paldv — identical plane layout, half-res U/V), ``C422`` (half-width),
``C444`` (full-res), ``Cmono`` (Y only). Color conversion is BT.601
limited-range (Y 16-235, C 16-240), the format's conventional matrix.

Frame timestamps derive from the ``F<num>:<den>`` rate exactly
(``ts_ms = i * 1000 * den / num``), which is what `media.sample_frames`
samples against. The paired encoder exists to produce real fixtures for
round-trip tests (conversion+subsampling make round trips near-exact, not
bit-exact — tests use a small tolerance).
"""

from __future__ import annotations

import numpy as np

_C420 = {"420", "420jpeg", "420mpeg2", "420paldv"}


# --- BT.601 limited-range conversion ---------------------------------------


def rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    """(H,W,3) uint8 RGB → (H,W,3) float YUV (BT.601 limited-range)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 16.0 + (65.738 * r + 129.057 * g + 25.064 * b) / 256.0
    u = 128.0 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256.0
    v = 128.0 + (112.439 * r - 94.154 * g - 18.285 * b) / 256.0
    return np.stack([y, u, v], axis=-1)


def yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    """(H,W,3) float/uint8 YUV (BT.601 limited) → (H,W,3) uint8 RGB."""
    y = yuv[..., 0].astype(np.float64) - 16.0
    u = yuv[..., 1].astype(np.float64) - 128.0
    v = yuv[..., 2].astype(np.float64) - 128.0
    r = (298.082 * y + 408.583 * v) / 256.0
    g = (298.082 * y - 100.291 * u - 208.120 * v) / 256.0
    b = (298.082 * y + 516.412 * u) / 256.0
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --- decode -----------------------------------------------------------------


def _plane_dims(w: int, h: int, chroma: str) -> tuple[int, int]:
    if chroma in _C420:
        if w % 2 or h % 2:
            raise ValueError("C420 needs even dimensions")
        return w // 2, h // 2
    if chroma == "422":
        if w % 2:
            raise ValueError("C422 needs even width")
        return w // 2, h
    if chroma == "444":
        return w, h
    if chroma == "mono":
        return 0, 0
    raise ValueError(f"unsupported Y4M chroma C{chroma}")


def _upsample(plane: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor chroma upsample to (h, w)."""
    ry, rx = h // plane.shape[0], w // plane.shape[1]
    return np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)


def decode_y4m(b: bytes) -> tuple[list[tuple[int, np.ndarray]], float]:
    """.y4m bytes → ([(ts_ms, RGB frame)], fps). Strict framing checks."""
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        raise ValueError("bad Y4M signature")
    w = h = 0
    num, den = 25, 1
    chroma = "420"
    for tok in b[9:nl].split():
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = (int(x) for x in val.split(":"))
        elif tag == "C":
            chroma = val
        # I (interlace), A (aspect), X (comment) don't affect plane layout
    if w <= 0 or h <= 0 or num <= 0 or den <= 0:
        raise ValueError("bad Y4M geometry/rate")
    cw, ch = _plane_dims(w, h, chroma)
    ysz, csz = w * h, cw * ch
    pos = nl + 1
    frames: list[tuple[int, np.ndarray]] = []
    while pos < len(b):
        nl = b.find(b"\n", pos)
        if nl < 0 or b[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M FRAME marker")
        pos = nl + 1
        need = ysz + 2 * csz
        if pos + need > len(b):
            raise ValueError("truncated Y4M frame payload")
        y = np.frombuffer(b, np.uint8, ysz, pos).reshape(h, w)
        if chroma == "mono":
            yuv = np.stack([y, np.full((h, w), 128, np.uint8),
                            np.full((h, w), 128, np.uint8)], axis=-1)
        else:
            u = np.frombuffer(b, np.uint8, csz, pos + ysz).reshape(ch, cw)
            v = np.frombuffer(b, np.uint8, csz, pos + ysz + csz).reshape(ch, cw)
            yuv = np.stack([y, _upsample(u, w, h), _upsample(v, w, h)], axis=-1)
        ts_ms = round(len(frames) * 1000 * den / num)
        frames.append((ts_ms, yuv_to_rgb(yuv)))
        pos += need
    if not frames:
        raise ValueError("Y4M stream contains no frames")
    return frames, num / den


# --- encode (fixture writer) ------------------------------------------------


def _subsample(plane: np.ndarray, cw: int, ch: int) -> np.ndarray:
    """Box-average downsample a (H,W) float plane to (ch, cw)."""
    h, w = plane.shape
    return (
        plane.reshape(ch, h // ch, cw, w // cw).mean(axis=(1, 3))
    )


def encode_y4m(
    frames: list[np.ndarray],
    fps: tuple[int, int] = (25, 1),
    chroma: str = "420",
) -> bytes:
    """(H,W,3) uint8 RGB frames → a spec-valid .y4m byte string."""
    if not frames:
        raise ValueError("encode_y4m needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    cw, ch = _plane_dims(w, h, chroma)
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n"
    out = bytearray(head.encode("ascii"))
    for f in frames:
        yuv = rgb_to_yuv(f)
        out += b"FRAME\n"
        out += np.clip(np.rint(yuv[..., 0]), 16, 235).astype(np.uint8).tobytes()
        if chroma != "mono":
            for c in (1, 2):
                plane = yuv[..., c]
                if (cw, ch) != (w, h):
                    plane = _subsample(plane, cw, ch)
                out += np.clip(np.rint(plane), 16, 240).astype(np.uint8).tobytes()
    return bytes(out)
