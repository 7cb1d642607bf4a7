"""Baseline JPEG codec — REAL, stdlib + numpy only (no PIL).

Decoder: baseline sequential DCT (SOF0), 8-bit precision, grayscale or
YCbCr with 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, restart markers,
byte-stuffing, standard JFIF YCbCr→RGB. Progressive (SOF2), arithmetic
coding, and 12-bit precision raise ``ValueError`` into the engine's
per-row error channel — that is the same "recognized format, malformed
or unsupported stream ⇒ raise" contract the PNG/GIF codecs follow.

Encoder: baseline 4:4:4 (or grayscale), Annex-K quantization tables with
libjpeg-style quality scaling, Annex-K Huffman tables. It exists to
produce real fixtures for the decoder, round-trip tests, and the
MJPEG-AVI video path (`kernels/avi.py`).

Pure-Python Huffman decode is the slow part; the per-block transform is
vectorized (one numpy IDCT matrix-product per 8×8 block). That is the
right trade here: media decode runs inside Arrow-batched ``mapInPandas``
kernels where Spark parallelizes across rows, and thumbnails/embeddings
dominate the downstream cost anyway. A cluster deployment swaps this for
PIL/turbojpeg behind the same `decode_image_array` dispatch without
touching any operator.

No counterpart exists in the reference (wenzhaoabc/mmkg-rag uses PIL via
its GUI only); this file implements ITU-T T.81 from the public spec.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared tables ----------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

# 8-point DCT-II basis: _C[k, n] = c(k)/2 · cos((2n+1)kπ/16).
# Forward DCT of block B is _C @ B @ _C.T; inverse is _C.T @ coef @ _C.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (
            (np.sqrt(0.125) if _k == 0 else 0.5)
            * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
        )

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 Huffman specs: (BITS counts per length 1..16, HUFFVAL symbols).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol, per T.81 C.2 canonical code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, code_length), inverse of `_build_decode_table`."""
    return {v: (c, ln) for (ln, c), v in _build_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 byte-stuffing.

    A marker byte (FF xx, xx ≠ 00) ends the entropy segment: reads past it
    raise, and `at_marker()` lets the scan loop detect RST/EOI boundaries.
    """

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        byte = d[self.pos]
        if byte == 0xFF:
            if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
                self.pos += 2  # stuffed FF
            else:
                raise ValueError("JPEG marker inside entropy-coded segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_to_marker(self) -> int:
        """Discard bits to the next marker; return the marker's second byte."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("JPEG stream ended without marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 sign extension: t-bit magnitude → signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode baseline JPEG → uint8 (H, W, C) with C ∈ {1, 3} (RGB)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    restart_interval = 0
    progressive = False
    coeff_state = None  # progressive: per-component coefficient planes

    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected JPEG marker at offset {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            if progressive and coeff_state is not None:
                return _reconstruct_prog(coeff_state, frame, quant)
            raise ValueError("JPEG EOI before scan data")
        seglen = struct.unpack_from(">H", b, pos)[0]
        seg = b[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], ">u2").astype(np.int64)
                    p += 128
                if len(tbl) != 64:
                    raise ValueError("truncated JPEG DQT")
                quant[tq] = tbl[_UNZIGZAG].reshape(8, 8)  # store natural order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(counts) != 16 or len(vals) != n:
                    raise ValueError("truncated JPEG DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(counts, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker & 0x0F}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tables >> 4, tables & 0x0F))
            if not progressive:
                if ns != len(frame[2]):
                    # non-interleaved multi-scan baseline: rare; MCU geometry
                    # differs per scan — out of scope.
                    raise ValueError("unsupported JPEG non-interleaved scan")
                return _decode_scan(
                    b, pos + seglen, frame, scan, quant, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if coeff_state is None:
                coeff_state = _init_prog_state(frame)
            pos = _decode_prog_scan(
                coeff_state, b, pos + seglen, frame, scan, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval,
            )
            continue
        # else: APPn / COM / unknown — skip
        pos += seglen
    if progressive and coeff_state is not None:
        return _reconstruct_prog(coeff_state, frame, quant)
    raise ValueError("JPEG stream ended without SOS")


def _decode_scan(
    b: bytes,
    pos: int,
    frame: tuple[int, int, list[tuple[int, int, int, int]]],
    scan: list[tuple[int, int, int]],
    quant: dict[int, np.ndarray],
    huff_dc: dict[int, dict[tuple[int, int], int]],
    huff_ac: dict[int, dict[tuple[int, int], int]],
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame
    if h <= 0 or w <= 0:
        raise ValueError("bad JPEG dimensions")
    if len(comps) not in (1, 3):
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    # per-scan component order with its tables
    order = []
    planes: dict[int, np.ndarray] = {}
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("JPEG scan references unknown component")
        cid, hs, vs, tq = by_id[cs]
        if tq not in quant or td not in huff_dc or ta not in huff_ac:
            raise ValueError("JPEG scan references missing table")
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        order.append((cid, hs, vs, quant[tq].astype(np.float64), huff_dc[td], huff_ac[ta]))

    reader = _BitReader(b, pos)
    pred = {cid: 0 for cid, *_ in order}
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                m = reader.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError("expected JPEG restart marker")
                pred = {cid: 0 for cid in pred}
            for cid, hs, vs, qtbl, dc_tbl, ac_tbl in order:
                for v in range(vs):
                    for u in range(hs):
                        coef = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dc_tbl)
                        pred[cid] += _extend(reader.read_bits(t), t)
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coef[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = coef[_UNZIGZAG].reshape(8, 8) * qtbl
                        pix = _C.T @ block @ _C + 128.0
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + u) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_index += 1

    # upsample each plane to full MCU-aligned resolution, then crop
    full = []
    for cid, hs, vs, *_ in order:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    return _planes_to_rgb(full)


def _planes_to_rgb(full: list[np.ndarray]) -> np.ndarray:
    """Cropped full-resolution planes → uint8 image (JFIF YCbCr→RGB)."""
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.stack([r, g, bl], axis=2), 0, 255).astype(np.uint8)


# --- progressive (SOF2) decoding -------------------------------------------


def _init_prog_state(
    frame: tuple[int, int, list[tuple[int, int, int, int]]],
) -> dict[int, np.ndarray]:
    """Per-component DCT-coefficient planes, MCU-padded, natural order."""
    h, w, comps = frame
    if h <= 0 or w <= 0:
        raise ValueError("bad JPEG dimensions")
    if len(comps) not in (1, 3):
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return {
        cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
        for cid, hs, vs, _tq in comps
    }


def _find_next_marker(b: bytes, pos: int) -> int:
    """Index of the 0xFF of the next real marker at/after pos."""
    while pos + 1 < len(b):
        if b[pos] == 0xFF and b[pos + 1] != 0x00 and not (
            0xD0 <= b[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    raise ValueError("JPEG stream ended inside scan")


def _decode_prog_scan(
    state: dict[int, np.ndarray],
    b: bytes,
    pos: int,
    frame: tuple[int, int, list[tuple[int, int, int, int]]],
    scan: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff_dc: dict[int, dict[tuple[int, int], int]],
    huff_ac: dict[int, dict[tuple[int, int], int]],
    restart_interval: int,
) -> int:
    """Decode one progressive scan into the coefficient planes; return the
    offset of the marker that follows the entropy-coded data.

    Implements T.81 §G.2: spectral selection (Ss..Se bands), successive
    approximation (Ah/Al first + refinement passes), EOB runs, restarts.
    """
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    if not 0 <= ss <= se <= 63:
        raise ValueError("bad spectral selection band")

    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("JPEG scan references unknown component")
        cid, hs, vs, _tq = by_id[cs]
        dc_tbl = None
        ac_tbl = None
        if ss == 0 and ah == 0:
            dc_tbl = huff_dc.get(td)
            if dc_tbl is None:
                raise ValueError("JPEG scan references missing DC table")
        if ss > 0:
            ac_tbl = huff_ac.get(ta)
            if ac_tbl is None:
                raise ValueError("JPEG scan references missing AC table")
        order.append((cid, hs, vs, dc_tbl, ac_tbl))

    reader = _BitReader(b, pos)
    pred = {cid: 0 for cid, *_ in order}
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)

    def check_restart(unit_index: int) -> None:
        nonlocal pred, eobrun
        if restart_interval and unit_index and unit_index % restart_interval == 0:
            m = reader.align_to_marker()
            if not 0xD0 <= m <= 0xD7:
                raise ValueError("expected JPEG restart marker")
            pred = {cid: 0 for cid in pred}
            eobrun = 0

    def dc_first(coef: np.ndarray, cid: int, dc_tbl) -> None:
        t = reader.decode_symbol(dc_tbl)
        pred[cid] += _extend(reader.read_bits(t), t)
        coef[0] = pred[cid] << al

    def dc_refine(coef: np.ndarray) -> None:
        if reader.read_bit():
            coef[0] |= p1

    def ac_first(coef: np.ndarray, ac_tbl) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) + reader.read_bits(r) - 1
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC index outside band")
            coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
            k += 1

    def refine_nonzero(coef: np.ndarray, nat: int) -> None:
        # T.81 G.2: a correction bit per already-nonzero coefficient
        if reader.read_bit() and not (int(coef[nat]) & p1):
            coef[nat] += p1 if coef[nat] >= 0 else m1

    def ac_refine(coef: np.ndarray, ac_tbl) -> None:
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode_symbol(ac_tbl)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) + reader.read_bits(r)
                        break
                else:
                    if s != 1:
                        raise ValueError("corrupt JPEG AC refinement")
                    newval = p1 if reader.read_bit() else m1
                while k <= se:
                    nat = ZIGZAG[k]
                    if coef[nat] != 0:
                        refine_nonzero(coef, nat)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    coef[ZIGZAG[k]] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                nat = ZIGZAG[k]
                if coef[nat] != 0:
                    refine_nonzero(coef, nat)
                k += 1
            eobrun -= 1

    if len(order) > 1 or (ss == 0 and len(order) == len(comps)):
        # interleaved (DC scans only): MCU geometry
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                check_restart(unit)
                for cid, hs, vs, dc_tbl, _ac in order:
                    plane = state[cid]
                    for v in range(vs):
                        for u in range(hs):
                            coef = plane[my * vs + v, mx * hs + u]
                            if ah == 0:
                                dc_first(coef, cid, dc_tbl)
                            else:
                                dc_refine(coef)
                unit += 1
    else:
        # non-interleaved: ceil(component size / 8) blocks, row-major
        cid, hs, vs, dc_tbl, ac_tbl = order[0]
        comp_w = -(-(w * hs) // hmax)  # ceil(w·hs/hmax)
        comp_h = -(-(h * vs) // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        plane = state[cid]
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                check_restart(unit)
                coef = plane[by, bx]
                if ss == 0:
                    if ah == 0:
                        dc_first(coef, cid, dc_tbl)
                    else:
                        dc_refine(coef)
                elif ah == 0:
                    ac_first(coef, ac_tbl)
                else:
                    ac_refine(coef, ac_tbl)
                unit += 1

    return _find_next_marker(b, reader.pos)


def _reconstruct_prog(
    state: dict[int, np.ndarray],
    frame: tuple[int, int, list[tuple[int, int, int, int]]],
    quant: dict[int, np.ndarray],
) -> np.ndarray:
    """Dequantize + vectorized IDCT of the accumulated coefficient planes."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hs, vs, tq in comps:
        if tq not in quant:
            raise ValueError("JPEG frame references missing quant table")
        coefs = state[cid].astype(np.float64)
        by, bx = coefs.shape[:2]
        blocks = coefs.reshape(by, bx, 8, 8) * quant[tq].astype(np.float64)
        # IDCT over all blocks at once: C.T @ B @ C
        pix = np.einsum("ij,ybjk,kl->ybil", _C.T, blocks, _C) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(plane[:h, :w])
    return _planes_to_rgb(full)


# --- encoder ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _scale_quant(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of an Annex-K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """(bit-length t, t-bit magnitude code) for a signed coefficient."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1) & ((1 << t) - 1)


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qtbl: np.ndarray,
    pred: int,
    dc_tbl: dict[int, tuple[int, int]],
    ac_tbl: dict[int, tuple[int, int]],
) -> int:
    coef_nat = np.round((_C @ (block - 128.0) @ _C.T) / qtbl).astype(np.int64)
    zz = coef_nat.ravel()[ZIGZAG]
    t, mag = _magnitude(int(zz[0]) - pred)
    code, ln = dc_tbl[t]
    writer.write(code, ln)
    if t:
        writer.write(mag, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_tbl[0x00]  # EOB
                writer.write(code, ln)
                break
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        t, mag = _magnitude(v)
        code, ln = ac_tbl[(run << 4) | t]
        writer.write(code, ln)
        writer.write(mag, t)
        run = 0
    return int(zz[0])


def _dht_segment(tc: int, th: int, spec: tuple[list[int], list[int]]) -> bytes:
    bits, vals = spec
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


# --- progressive (SOF2) encoding -------------------------------------------


def _quantize_plane(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """8-aligned plane → quantized DCT blocks (by, bx, 64) in zigzag order.

    Uses the same expression tree as `_encode_block` so baseline and
    progressive encodes of one image produce identical coefficients.
    """
    byc, bxc = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(byc, 8, bxc, 8).transpose(0, 2, 1, 3) - 128.0
    dct = np.einsum("ij,xyjk,kl->xyil", _C, blocks, _C.T)
    return np.round(dct / qtbl).astype(np.int32).reshape(byc, bxc, 64)[:, :, ZIGZAG]


def _fixed_length_huff(symbols: set[int]) -> tuple[list[int], list[int]]:
    """Canonical table giving every used symbol the same code length.

    Progressive scans emit EOBn symbols the Annex-K baseline tables lack,
    so each scan carries its own table. Length L with n ≤ 2^L − 1 keeps
    codes prefix-free and avoids the reserved all-ones code.
    """
    vals = sorted(symbols)
    n = len(vals)
    if n == 0:
        vals = [0]
        n = 1
    length = max(2, (n + 1).bit_length())
    bits = [0] * 16
    if n <= 255:
        bits[length - 1] = n
        return bits, vals
    bits[8] = 255  # 256 symbols can't share one byte-counted bucket
    bits[9] = n - 255
    return bits, vals


def _prog_dc_first(
    units: list[tuple[int, np.ndarray]], al: int, emit_sym, emit_bits
) -> None:
    """units = (component-index, zigzag block) in MCU order."""
    pred: dict[int, int] = {}
    for ci, zz in units:
        v = int(zz[0]) >> al  # arithmetic shift (T.81 DC point transform)
        t, mag = _magnitude(v - pred.get(ci, 0))
        pred[ci] = v
        emit_sym(ci, t)
        if t:
            emit_bits(mag, t)


def _prog_dc_refine(
    units: list[tuple[int, np.ndarray]], al: int, emit_bits
) -> None:
    for _ci, zz in units:
        emit_bits((int(zz[0]) >> al) & 1, 1)


def _prog_ac_first(
    blocks: list[np.ndarray], ss: int, se: int, al: int, emit_sym, emit_bits
) -> None:
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            emit_sym(0, nbits << 4)
            if nbits:
                emit_bits(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                emit_sym(0, 0xF0)
                r -= 16
            s, mag = _magnitude(t if v > 0 else -t)
            emit_sym(0, (r << 4) | s)
            emit_bits(mag, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _prog_ac_refine(
    blocks: list[np.ndarray], ss: int, se: int, al: int, emit_sym, emit_bits
) -> None:
    """T.81 G.1.2.3 successive-approximation AC refinement (libjpeg-style:
    correction bits buffer through ZRL/EOB runs)."""
    eobrun = 0
    held: list[int] = []  # correction bits deferred across an EOB run

    def flush_eob() -> None:
        nonlocal eobrun, held
        if eobrun:
            nbits = eobrun.bit_length() - 1
            emit_sym(0, nbits << 4)
            if nbits:
                emit_bits(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
            for bit in held:
                emit_bits(bit, 1)
            held = []

    for zz in blocks:
        absvals = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = ss - 1  # last newly-significant index, if any
        for i, t in enumerate(absvals):
            if t == 1:
                eob = ss + i
        r = 0
        br: list[int] = []  # this block's pending correction bits
        for i, t in enumerate(absvals):
            k = ss + i
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eob()
                emit_sym(0, 0xF0)
                r -= 16
                for bit in br:
                    emit_bits(bit, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush_eob()
            emit_sym(0, (r << 4) | 1)
            emit_bits(1 if int(zz[k]) >= 0 else 0, 1)
            for bit in br:
                emit_bits(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            held.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _encode_progressive_scans(
    padded: list[tuple[np.ndarray, np.ndarray, int, int, int]],
    h: int,
    w: int,
    mcux: int,
    mcuy: int,
    hmax: int,
    vmax: int,
) -> bytes:
    """Emit the scan sequence (DHT + SOS + entropy per scan).

    Script: interleaved DC first (Al=1) → DC refine → per component, AC
    first scans (component 0's band split 1–5 / 6–63 to exercise spectral
    selection) at Al=1 → matching AC refinement scans at Al=0. Every
    successive-approximation and EOB-run decode path gets covered.
    """
    qblocks = [_quantize_plane(p, q) for p, q, _t, _hs, _vs in padded]
    ncomp = len(padded)

    dc_units: list[tuple[int, np.ndarray]] = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_p, _q, _t, hs, vs) in enumerate(padded):
                for v in range(vs):
                    for u in range(hs):
                        dc_units.append((ci, qblocks[ci][my * vs + v, mx * hs + u]))

    def comp_blocks(ci: int) -> list[np.ndarray]:
        # non-interleaved scans code ceil(component size / 8) blocks, which
        # can be fewer than the MCU-padded grid when subsampled
        _p, _q, _t, hs, vs = padded[ci]
        comp_w = -(-(w * hs) // hmax)
        comp_h = -(-(h * vs) // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        q = qblocks[ci]
        return [q[by, bx] for by in range(bh) for bx in range(bw)]

    bands = {ci: ([(1, 5), (6, 63)] if ci == 0 else [(1, 63)]) for ci in range(ncomp)}
    scans: list[tuple] = [("dc_first",), ("dc_refine",)]
    for ci in range(ncomp):
        for ss, se in bands[ci]:
            scans.append(("ac_first", ci, ss, se))
    for ci in range(ncomp):
        for ss, se in bands[ci]:
            scans.append(("ac_refine", ci, ss, se))

    out = bytearray()
    for spec in scans:
        kind = spec[0]
        # pass 1: collect symbols per table slot (DC scans: one per comp)
        used: dict[int, set[int]] = {}

        def run(emit_sym, emit_bits) -> None:
            if kind == "dc_first":
                _prog_dc_first(dc_units, 1, emit_sym, emit_bits)
            elif kind == "dc_refine":
                _prog_dc_refine(dc_units, 0, emit_bits)
            elif kind == "ac_first":
                _ci, ss, se = spec[1], spec[2], spec[3]
                _prog_ac_first(comp_blocks(_ci), ss, se, 1, emit_sym, emit_bits)
            else:
                _ci, ss, se = spec[1], spec[2], spec[3]
                _prog_ac_refine(comp_blocks(_ci), ss, se, 0, emit_sym, emit_bits)

        run(lambda slot, s: used.setdefault(slot, set()).add(s), lambda v, n: None)
        tables = {slot: _fixed_length_huff(syms) for slot, syms in used.items()}
        enc = {slot: _build_encode_table(*t) for slot, t in tables.items()}
        writer = _BitWriter()

        def emit_sym(slot: int, s: int) -> None:
            code, ln = enc[slot][s]
            writer.write(code, ln)

        run(emit_sym, writer.write)
        writer.flush()

        tc = 0 if kind.startswith("dc") else 1
        for slot, t in sorted(tables.items()):
            out += _dht_segment(tc, slot, t)
        if kind == "dc_first":
            sos = bytes([ncomp]) + b"".join(
                bytes([ci + 1, ci << 4]) for ci in range(ncomp)
            ) + bytes([0, 0, (0 << 4) | 1])
        elif kind == "dc_refine":
            sos = bytes([ncomp]) + b"".join(
                bytes([ci + 1, 0]) for ci in range(ncomp)
            ) + bytes([0, 0, (1 << 4) | 0])
        else:
            _ci, ss, se = spec[1], spec[2], spec[3]
            ah, al = (0, 1) if kind == "ac_first" else (1, 0)
            sos = bytes([1, _ci + 1, 0x00, ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        out += writer.out
    return bytes(out)


def _downsample2(p: np.ndarray) -> np.ndarray:
    """2×2 box-average downsample (pad odd edges by replication first)."""
    h, w = p.shape
    if h % 2 or w % 2:
        p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode (H, W, 1|3) uint8 → baseline or progressive JFIF JPEG.

    ``subsample``: "444" (no chroma subsampling) or "420" (2×2 Y per MCU,
    box-averaged chroma). ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs — exists so tests can exercise the decoder's
    restart path with a self-contained fixture. ``progressive`` emits a
    SOF2 stream (spectral selection + successive approximation; see
    `_encode_progressive_scans`) from the same quantized coefficients, so
    baseline and progressive encodes of one image decode identically.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg needs 1 or 3 channels")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if progressive and restart_interval:
        raise ValueError("progressive encode does not support restart markers")
    ql = _scale_quant(QUANT_LUMA, quality).astype(np.float64).reshape(8, 8)
    qc = _scale_quant(QUANT_CHROMA, quality).astype(np.float64).reshape(8, 8)
    sub = subsample == "420" and nch == 3
    # per channel: (plane, qtbl, table-select, hs, vs)
    if nch == 3:
        f = arr.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2]
        cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2]
        if sub:
            chans = [
                (y, ql, 0, 2, 2),
                (_downsample2(cb), qc, 1, 1, 1),
                (_downsample2(cr), qc, 1, 1, 1),
            ]
        else:
            chans = [(y, ql, 0, 1, 1), (cb, qc, 1, 1, 1), (cr, qc, 1, 1, 1)]
    else:
        chans = [(arr[:, :, 0].astype(np.float64), ql, 0, 1, 1)]
    hmax = max(c[3] for c in chans)
    vmax = max(c[4] for c in chans)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    dc_enc = [_build_encode_table(*HUFF_DC_LUMA), _build_encode_table(*HUFF_DC_CHROMA)]
    ac_enc = [_build_encode_table(*HUFF_AC_LUMA), _build_encode_table(*HUFF_AC_CHROMA)]

    padded = []
    for p, q, t, hs, vs in chans:
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        padded.append((
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"),
            q, t, hs, vs,
        ))
    if progressive:
        body = _encode_progressive_scans(padded, h, w, mcux, mcuy, hmax, vmax)
        return _assemble_jpeg_headers(
            chans, h, w, quality, 0, body, sof_marker=b"\xff\xc2",
            include_baseline_dht=False,
        )

    writer = _BitWriter()
    pred = [0] * len(chans)
    mcu_index = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(chans)
            for ci, (plane, qtbl, tsel, hs, vs) in enumerate(padded):
                for v in range(vs):
                    for u in range(hs):
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + u) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(
                            writer, block, qtbl, pred[ci], dc_enc[tsel], ac_enc[tsel]
                        )
            mcu_index += 1
    writer.flush()

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        body = bytes([tq]) + bytes(tbl.astype(np.int64).ravel()[ZIGZAG].astype(np.uint8))
        return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body

    return _assemble_jpeg_headers(
        chans, h, w, quality, restart_interval, bytes(writer.out),
        sof_marker=b"\xff\xc0", include_baseline_dht=True,
    )


def _assemble_jpeg_headers(
    chans: list,
    h: int,
    w: int,
    quality: int,
    restart_interval: int,
    body: bytes,
    sof_marker: bytes,
    include_baseline_dht: bool,
) -> bytes:
    """SOI/APP0/DQT/SOF + (baseline: DHT/DRI/SOS) + body + EOI.

    Progressive bodies carry their own per-scan DHT + SOS segments.
    """

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        seg = bytes([tq]) + bytes(tbl.astype(np.int64).ravel()[ZIGZAG].astype(np.uint8))
        return b"\xff\xdb" + struct.pack(">H", len(seg) + 2) + seg

    ncomp = len(chans)
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        struct.pack(
            ">BBB", i + 1, (chans[i][3] << 4) | chans[i][4], chans[i][2]
        )
        for i in range(ncomp)
    )
    out = bytearray()
    out += b"\xff\xd8"
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    out += dqt(0, _scale_quant(QUANT_LUMA, quality).reshape(8, 8))
    if ncomp == 3:
        out += dqt(1, _scale_quant(QUANT_CHROMA, quality).reshape(8, 8))
    out += sof_marker + struct.pack(">H", len(sof_body) + 2) + sof_body
    if include_baseline_dht:
        out += _dht_segment(0, 0, HUFF_DC_LUMA) + _dht_segment(1, 0, HUFF_AC_LUMA)
        if ncomp == 3:
            out += _dht_segment(0, 1, HUFF_DC_CHROMA) + _dht_segment(1, 1, HUFF_AC_CHROMA)
        if restart_interval:
            out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        sos_body = bytes([ncomp]) + b"".join(
            bytes([i + 1, chans[i][2] * 0x11]) for i in range(ncomp)
        ) + b"\x00\x3f\x00"
        out += b"\xff\xda" + struct.pack(">H", len(sos_body) + 2) + sos_body
    out += body
    out += b"\xff\xd9"
    return bytes(out)
