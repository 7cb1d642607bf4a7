"""RIFF/AVI MJPEG container codec — REAL, stdlib-only.

Motion-JPEG AVI is the one mainstream video format fully decodable
without ffmpeg: the container is plain RIFF chunk walking and every
frame payload is a baseline JPEG that `kernels/jpeg.py` decodes. This
gives the engine a real video path end-to-end — container parse, frame
timestamps from the stream header, frame extraction, per-frame pixel
decode — while inter-frame codecs (H.264/VP9/AV1) remain out of scope
for this container-free sandbox and keep their disclosed stubs.

Writer emits a minimal spec-valid single-stream AVI (hdrl with avih +
strl/strh/strf, movi with '00dc' chunks, idx1) so tests and fixtures are
self-contained.

No counterpart in the reference (wenzhaoabc/mmkg-rag has no video
handling); implemented from the public AVI RIFF specification.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, *payloads: bytes) -> bytes:
    return _chunk(b"LIST", list_type + b"".join(payloads))


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: float = 10.0
) -> bytes:
    """Pack JPEG frame payloads into a single-stream MJPEG AVI."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    us_per_frame = int(round(1_000_000 / fps))
    max_frame = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame,          # dwMicroSecPerFrame
        int(max_frame * fps),  # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # AVIF_HASINDEX
        len(frames), 0, 1, max_frame, width, height, 0, 0, 0, 0,
    )
    # rate/scale chosen so rate/scale == fps exactly for integral fps
    scale, rate = (1000, int(round(fps * 1000)))
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi",
            0, 0, 0, 0, scale, rate, 0, len(frames), max_frame, 0, 0,
        )
        + struct.pack("<HHHH", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih),
        _list(b"strl", _chunk(b"strh", strh), _chunk(b"strf", strf)),
    )
    movi_payloads = [_chunk(b"00dc", f) for f in frames]
    movi = _list(b"movi", *movi_payloads)
    idx_entries = []
    off = 4  # offsets are relative to the start of the 'movi' list type
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(b: bytes) -> tuple[list[tuple[int, bytes]], float]:
    """Parse an MJPEG AVI → ([(ts_ms, jpeg_bytes), ...], fps).

    Walks the RIFF tree: avih gives µs/frame (strh rate/scale is the
    fallback), movi's ``##dc``/``##db`` chunks are the frames in stream
    order. Malformed containers raise into the per-row error channel.
    """
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("bad AVI signature")
    if 8 + struct.unpack_from("<I", b, 4)[0] > len(b):
        raise ValueError("truncated AVI (declared size exceeds payload)")
    us_per_frame = 0
    rate = scale = 0
    frames: list[bytes] = []

    def walk(data: bytes, pos: int, end: int) -> None:
        nonlocal us_per_frame, rate, scale
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(data, body_start + 4, body_end)
            elif fourcc == b"avih" and size >= 4:
                us_per_frame = struct.unpack_from("<I", data, body_start)[0]
            elif fourcc == b"strh" and size >= 32:
                if data[body_start : body_start + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", data, body_start + 20)
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(data[body_start:body_end])
            pos = body_end + (size % 2)

    walk(b, 12, 8 + struct.unpack_from("<I", b, 4)[0])
    if not frames:
        raise ValueError("AVI contains no video frames")
    if us_per_frame <= 0:
        if rate <= 0 or scale <= 0:
            raise ValueError("AVI missing frame timing")
        us_per_frame = int(round(1_000_000 * scale / rate))
    fps = 1_000_000 / us_per_frame
    return (
        [(int(i * us_per_frame / 1000), f) for i, f in enumerate(frames)],
        fps,
    )
