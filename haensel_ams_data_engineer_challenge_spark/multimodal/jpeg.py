"""Baseline-JPEG pixel codec, stdlib+numpy only (round 13, r12
verdict task 1).

The image pixel rung decoded PNG only; JPEG — the dominant format of
any real crawl — fell to the md5-fake rung whenever Pillow is absent
(it is absent in this container), so a quality-90 re-encode of a JPEG
was invisible to both the phash tier and image-v1 embeddings.  This
module closes that hole with a REAL ITU T.81 baseline sequential
codec:

- :func:`decode_jpeg_pixels` — marker walk (SOI/APPn/DQT/DHT/SOF0/
  DRI/SOS), canonical Huffman decode (the T.81 F.2.2.3 mincode/
  maxcode/valptr algorithm), run-length AC expansion, dequantization,
  and a float64 2-D IDCT batched over all blocks with numpy (the
  Huffman bit walk is inherently sequential Python; the IDCT is one
  ``T.T @ blocks @ T`` matmul).  Output is GRAYSCALE row-major pixels:
  for 3-component YCbCr scans only the Y plane is inverse-transformed
  (JFIF Y *is* the ITU-R 601 luma the PNG rung computes from RGB);
  chroma blocks are entropy-decoded to advance the bitstream and
  dropped.  Handles 1- and 3-component frames, sampling factors 1-2
  (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), restart markers, 16-bit-free
  baseline DQTs — AND progressive (SOF2) frames (round 13, second
  half): T.81 Annex G spectral-selection + successive-approximation
  scans accumulate into per-component coefficient grids (DC
  first/refine interleaved or single, AC first/refine with EOB runs,
  restarts resetting predictors and EOBRUN), then the same IDCT tail
  runs once at EOI.  Anything else — arithmetic coding, 12-bit,
  CMYK, truncated or desynced streams, frames past the pixel ceiling
  — returns None and the ladder falls to the fake rung, never raises.
- :func:`jpeg_encode_gray` / :func:`jpeg_encode_ycbcr` (+ their
  ``_progressive`` twins) — the writers (Annex K quant + Huffman
  tables, libjpeg-style quality scaling, optional restart intervals,
  optional 4:2:0 for the baseline color form): the fixture
  synthesizers and round-trip tests run on them, and any external
  encoder produces payloads the decoder reads.  Progressive encoding
  is a LOSSLESS re-coding of the same quantized coefficients, so
  decode(progressive) bit-equals decode(baseline) for the same
  pixels+quality — the round-trip suite's strongest assertion.

Exactness contract for the gate arm: an image whose every 8x8 block
is a CONSTANT EVEN gray, encoded at quality 50 (DC quant divisor 16),
decodes bit-for-bit to itself — the forward DCT of a constant block
is DC-only with F(0,0) = 8*(v-128), the quantized DC (v-128)/2 is an
exact integer for even v, and the IDCT of a DC-only block is the flat
value F(0,0)/8 (float64 error ~1e-13, far inside the half-up
rounding's slack).  The arm synthesizer emits exactly such images, so
the DuckDB twin re-derives the decoded pixels from the block formula
and the whole marker->Huffman->dequant->IDCT path is hash-checked.

Reference analogue: none — the reference has no media tier at all;
the codec exists so the dedup/embedding operators the reference's
users need at crawl scale see real JPEG pixels.
"""

from __future__ import annotations

import struct

import numpy as np

#: pixel-count ceiling (matches the PNG rung's _PNG_MAX_PIXELS): the
#: per-coefficient Python Huffman walk makes admitted pixels CPU, so
#: attacker-controlled SOF dims get a hard bound; anything larger
#: falls to the fake rung.
JPEG_MAX_PIXELS = 1 << 22

#: the arm/fixture quality: the Annex K luminance DC divisor is 16 and
#: libjpeg scaling at Q=50 serves the table verbatim, which is what
#: makes block-constant even grays decode losslessly (module
#: docstring).
JPEG_EXACT_QUALITY = 50

# ---------------------------------------------------------------------------
# ITU T.81 Annex K tables (public standard constants)
# ---------------------------------------------------------------------------

#: zigzag scan order: ZIGZAG[k] = natural (row*8+col) index of the
#: k-th zigzag coefficient.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 luminance quantization table (natural order).
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Annex K.2 chrominance quantization table (natural order).
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# standard Huffman tables: (bits[1..16], symbols)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def quality_scaled(base: list[int], quality: int) -> list[int]:
    """libjpeg-style quality scaling of a quant table: scale =
    5000/Q below 50 else 200 - 2Q; entries clamp to [1, 255].
    Q=50 serves the Annex K table verbatim (the exactness quality)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [min(255, max(1, (b * scale + 50) // 100)) for b in base]


_DCT_T = None


def _dct_matrix() -> np.ndarray:
    """The 8x8 DCT-II basis T[u, x] = c(u)/2 * cos((2x+1)u*pi/16),
    c(0)=1/sqrt(2) else 1 — forward F = T f T^T, inverse f = T^T F T
    (both orthonormal up to the JPEG 1/4 C(u)C(v) convention, which
    this T absorbs)."""
    global _DCT_T
    if _DCT_T is None:
        x = np.arange(8, dtype=np.float64)
        u = x.reshape(8, 1)
        t = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        t[0, :] *= 1.0 / np.sqrt(2.0)
        _DCT_T = t
    return _DCT_T


class _JpegError(Exception):
    """Internal: any malformed-stream condition — callers convert to
    the None/fake-rung contract, never propagate."""


# ---------------------------------------------------------------------------
# Huffman plumbing
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: list[int]):
    """Canonical Huffman decode arrays (T.81 F.2.2.3): per code
    length, (mincode, maxcode, valptr) over the canonical code
    assignment; maxcode = -1 marks an empty length."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for ln in range(1, 17):
        n = bits[ln - 1]
        if n:
            valptr[ln] = k
            mincode[ln] = code
            code += n
            k += n
            maxcode[ln] = code - 1
        code <<= 1
    if k != len(vals):
        raise _JpegError("DHT count/value mismatch")
    return mincode, maxcode, valptr, list(vals)


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) under the canonical assignment."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; hitting a
    real marker (or end of payload) mid-read raises _JpegError."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        i = self.pos
        if i >= len(d):
            raise _JpegError("entropy data exhausted")
        b = d[i]
        self.pos = i + 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise _JpegError("dangling 0xFF")
            if d[self.pos] != 0x00:
                raise _JpegError("marker inside entropy data")
            self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.buf = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_huff(self, tab) -> int:
        mincode, maxcode, valptr, huffval = tab
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            mc = maxcode[ln]
            if mc >= 0 and code <= mc:
                return huffval[valptr[ln] + code - mincode[ln]]
        raise _JpegError("invalid Huffman code")

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        return v

    def receive_extend(self, s: int) -> int:
        v = self.receive(s)
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v

    def restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker (T.81
        E.1.4); a wrong or missing marker is a desynced stream."""
        self.nbits = 0
        d = self.data
        if self.pos + 2 > len(d) or d[self.pos] != 0xFF or d[
            self.pos + 1
        ] != 0xD0 + (n & 7):
            raise _JpegError("missing restart marker")
        self.pos += 2


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (bits & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H/8, W/8) grid of quantized zigzag coefficient rows from an
    (H, W) float64 level-shifted plane: F = T f T^T per 8x8 block,
    then round-half-away division by the natural-order quant table.
    Returns (n_blocks_y, n_blocks_x, 64) int32 in ZIGZAG order."""
    t = _dct_matrix()
    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coef = np.matmul(np.matmul(t, blocks), t.T)
    q = coef / qtab.reshape(8, 8)
    # round half away from zero, like libjpeg's DESCALE
    qz = np.sign(q) * np.floor(np.abs(q) + 0.5)
    nat = qz.reshape(by, bx, 64).astype(np.int32)
    return nat[:, :, ZIGZAG]


def _encode_block(
    w: _BitWriter, zz: np.ndarray, pred: int, dc_tab: dict, ac_tab: dict
) -> int:
    """Entropy-encode one zigzag coefficient row; returns the new DC
    predictor."""
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_tab[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.write(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body


def _dqt_seg(tid: int, qtab: list[int]) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes(qtab[i] for i in ZIGZAG))


def _dht_seg(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


def _pad_plane(vals: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate an (h, w) plane up to multiples of (mh, mw) —
    the standard MCU padding, which keeps boundary blocks' DCT tame."""
    h, w = vals.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        vals = np.pad(vals, ((0, ph), (0, pw)), mode="edge")
    return vals


def _jpeg_encode(
    planes: list[np.ndarray],
    width: int,
    height: int,
    quality: int,
    sampling: tuple[int, int],
    restart_interval: int,
) -> bytes:
    """Shared baseline encoder core.  ``planes`` is [Y] or [Y, Cb, Cr]
    full-size uint8-valued arrays (chroma is box-subsampled here when
    ``sampling`` says so); emits a single interleaved scan."""
    ncomp = len(planes)
    sh, sv = sampling if ncomp == 3 else (1, 1)
    q_l = quality_scaled(QUANT_LUMA, quality)
    tabs = [np.asarray(q_l, dtype=np.float64)]
    comp_geom = [(sh, sv, 0)]  # (h, v, quant id)
    if ncomp == 3:
        q_c = quality_scaled(QUANT_CHROMA, quality)
        tabs.append(np.asarray(q_c, dtype=np.float64))
        comp_geom += [(1, 1, 1), (1, 1, 1)]

    # per-component quantized zigzag block grids
    grids = []
    for ci, plane in enumerate(planes):
        ch, cv, tq = comp_geom[ci]
        if ci == 0:
            sub = plane.astype(np.float64)
        else:
            # box-subsample chroma by (sv, sh) integer mean
            p = _pad_plane(plane.astype(np.float64), sv, sh)
            sub = p.reshape(
                p.shape[0] // sv, sv, p.shape[1] // sh, sh
            ).mean(axis=(1, 3))
            sub = np.floor(sub)  # integer chroma, deterministic
        # pad to the MCU grid: luma needs multiples of 8*sv x 8*sh,
        # chroma multiples of 8 x 8
        if ci == 0:
            sub = _pad_plane(sub, 8 * sv, 8 * sh)
        else:
            sub = _pad_plane(sub, 8, 8)
        grids.append(_fdct_quant(sub - 128.0, tabs[tq]))

    mcux = -(-width // (8 * sh))
    mcuy = -(-height // (8 * sv))

    dc_enc = [_build_encode_table(*_DC_LUMA)]
    ac_enc = [_build_encode_table(*_AC_LUMA)]
    if ncomp == 3:
        dc_enc.append(_build_encode_table(*_DC_CHROMA))
        ac_enc.append(_build_encode_table(*_AC_CHROMA))

    w = _BitWriter()
    preds = [0] * ncomp
    mcu_i = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                w.align()
                w.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                ch, cv, _tq = comp_geom[ci]
                ti = 0 if ci == 0 else 1
                for bv in range(cv):
                    for bh in range(ch):
                        zz = grids[ci][my * cv + bv, mx * ch + bh]
                        preds[ci] = _encode_block(
                            w, zz, preds[ci], dc_enc[ti], ac_enc[ti]
                        )
            mcu_i += 1
    w.align()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_seg(0, q_l)
    if ncomp == 3:
        out += _dqt_seg(1, q_c)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for ci in range(ncomp):
        ch, cv, tq = comp_geom[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, tq])
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, *_DC_LUMA)
    out += _dht_seg(1, 0, *_AC_LUMA)
    if ncomp == 3:
        out += _dht_seg(0, 1, *_DC_CHROMA)
        out += _dht_seg(1, 1, *_AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode_gray(
    grays: list[int],
    width: int,
    height: int,
    quality: int = 75,
    restart_interval: int = 0,
) -> bytes:
    """A REAL baseline-sequential grayscale JPEG (Annex K tables at
    libjpeg ``quality`` scaling) — decodable by any JPEG reader.
    Different qualities produce different bytes for the same pixels,
    which is exactly what the re-encoded-duplicate tests exercise."""
    if len(grays) != width * height:
        raise ValueError(f"need {width * height} grays, got {len(grays)}")
    plane = np.asarray(grays, dtype=np.float64).reshape(height, width)
    return _jpeg_encode(
        [plane], width, height, quality, (1, 1), restart_interval
    )


def jpeg_encode_ycbcr(
    y: list[int],
    cb: list[int],
    cr: list[int],
    width: int,
    height: int,
    quality: int = 75,
    sampling: tuple[int, int] = (2, 2),
    restart_interval: int = 0,
) -> bytes:
    """A REAL baseline color JPEG from full-size Y/Cb/Cr planes;
    ``sampling`` is the luma (h, v) factor pair — (2, 2) = 4:2:0 (the
    dominant real-world layout), (1, 1) = 4:4:4.  Exists so the
    decoder's color/subsampling paths have a writer twin to round-trip
    against (the decoder outputs the Y plane; see module docstring)."""
    if sampling not in ((1, 1), (2, 2), (2, 1), (1, 2)):
        raise ValueError(f"unsupported sampling {sampling}")
    n = width * height
    if not (len(y) == len(cb) == len(cr) == n):
        raise ValueError("Y/Cb/Cr planes must all be width*height")
    planes = [
        np.asarray(p, dtype=np.float64).reshape(height, width)
        for p in (y, cb, cr)
    ]
    return _jpeg_encode(
        planes, width, height, quality, sampling, restart_interval
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg_pixels(
    payload: bytes, max_pixels: int = JPEG_MAX_PIXELS
) -> tuple[int, int, list[int]] | None:
    """REAL baseline-JPEG pixel decode: (width, height, row-major
    GRAYSCALE values) for ITU T.81 baseline sequential payloads, None
    for anything else (module docstring lists the rungs) — the ladder
    falls to the fake rung, never raises."""
    try:
        return _decode(payload, max_pixels)
    except (_JpegError, struct.error, IndexError, ValueError, TypeError):
        return None


#: bound on progressive scan count (a real encoder emits ~10; an
#: adversarial file must not loop the Python scan decoder forever).
_MAX_PROG_SCANS = 64


def _decode(payload: bytes, max_pixels: int):
    n = len(payload)
    if payload is None or n < 4 or payload[0:2] != b"\xff\xd8":
        return None
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple] = {}
    frame = None  # (width, height, comps); comps = [(cid, h, v, tq)]
    progressive = False
    prog_coefs = None  # ci -> (n_by, n_bx, 64) int32 zigzag grids
    n_scans = 0
    dri = 0
    i = 2
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None  # desynced
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        body = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT: one or more tables
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                if pq != 0:  # 16-bit tables are extended, not baseline
                    return None
                if j + 65 > len(body):
                    return None
                zz = body[j + 1 : j + 65]
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                qtabs[tq] = np.asarray(nat, dtype=np.float64)
                j += 65
        elif marker == 0xC4:  # DHT: one or more tables
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 15
                if cls > 1 or j + 17 > len(body):
                    return None
                bits = list(body[j + 1 : j + 17])
                cnt = sum(bits)
                if j + 17 + cnt > len(body):
                    return None
                vals = list(body[j + 17 : j + 17 + cnt])
                htabs[(cls, tid)] = _build_decode_table(bits, vals)
                j += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):
            # baseline / extended sequential / PROGRESSIVE (round 13)
            if len(body) < 6 or body[0] != 8:
                return None
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp not in (1, 3) or len(body) < 6 + 3 * ncomp:
                return None
            if width == 0 or height == 0 or width * height > max_pixels:
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 15
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    return None  # factors 3/4 are legal but unseen; bound
                comps.append((cid, h, v, tq))
            if ncomp == 1:
                # a single component is never subsampled in practice;
                # normalizing to 1x1 keeps the MCU math simple
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            frame = (width, height, comps)
            progressive = marker == 0xC2
        elif 0xC3 <= marker <= 0xCF and marker != 0xC4:
            return None  # arithmetic / hierarchical / lossless
        elif marker == 0xDD:
            if len(body) < 2:
                return None
            (dri,) = struct.unpack(">H", body[0:2])
        elif marker == 0xDA:
            if frame is None:
                return None
            if not progressive:
                return _decode_scan(
                    payload, i + 2 + seg_len, body, frame, qtabs, htabs, dri
                )
            n_scans += 1
            if n_scans > _MAX_PROG_SCANS:
                return None
            if prog_coefs is None:
                width, height, comps = frame
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-width // (8 * hmax))
                mcuy = -(-height // (8 * vmax))
                prog_coefs = {
                    ci: np.zeros(
                        (mcuy * c[2], mcux * c[1], 64), dtype=np.int32
                    )
                    for ci, c in enumerate(comps)
                }
            nxt = _decode_prog_scan(
                payload, i + 2 + seg_len, body, frame, htabs, dri,
                prog_coefs,
            )
            if nxt is None:
                return None
            i = nxt
            continue
        i += 2 + seg_len
    if prog_coefs is None:
        return None  # sequential path returns from inside the loop
    width, height, comps = frame
    yq = qtabs.get(comps[0][3])
    if yq is None:
        return None
    return _finish_luma(prog_coefs[0], yq, width, height)


def _finish_luma(
    blocks_zz: np.ndarray, yq: np.ndarray, width: int, height: int
):
    """Shared decode tail (round 13: factored so the progressive path
    reuses it): a RASTER-ordered (n_by, n_bx, 64) zigzag coefficient
    grid for the luma component -> dequant -> batched float64 IDCT ->
    level shift, half-up rounding, clamp -> cropped row-major grays."""
    n_by, n_bx = blocks_zz.shape[:2]
    arr = blocks_zz.reshape(-1, 64).astype(np.float64)
    nat = np.empty_like(arr)
    nat[:, ZIGZAG] = arr
    nat *= yq
    t = _dct_matrix()
    pix = np.matmul(np.matmul(t.T, nat.reshape(-1, 8, 8)), t)
    pix = np.floor(pix + 128.5)  # level shift + round half up
    np.clip(pix, 0, 255, out=pix)
    pix = pix.astype(np.int64).reshape(n_by, n_bx, 8, 8)
    plane = pix.transpose(0, 2, 1, 3).reshape(n_by * 8, n_bx * 8)
    return int(width), int(height), [
        int(v) for v in plane[:height, :width].ravel()
    ]


def _decode_scan(payload, data_pos, sos, frame, qtabs, htabs, dri):
    width, height, comps = frame
    ncomp = len(comps)
    ns = sos[0]
    if ns != ncomp or len(sos) < 1 + 2 * ns + 3:
        return None  # only single interleaved full scans (module doc)
    # scan-component order must be frame order with matching ids
    tables = []
    by_id = {c[0]: k for k, c in enumerate(comps)}
    order = []
    for s in range(ns):
        cid, tt = sos[1 + 2 * s], sos[2 + 2 * s]
        if cid not in by_id:
            return None
        ci = by_id[cid]
        order.append(ci)
        dc = htabs.get((0, tt >> 4))
        ac = htabs.get((1, tt & 15))
        if dc is None or ac is None:
            return None
        tables.append((dc, ac))
    if sos[1 + 2 * ns : 4 + 2 * ns] != b"\x00\x3f\x00":
        return None  # baseline spectral selection only
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    y_ci = 0  # luma = frame component 0 by JFIF convention
    _cid, yh, yv, ytq = comps[y_ci]
    yq = qtabs.get(ytq)
    if yq is None:
        return None

    br = _BitReader(payload, data_pos)
    preds = [0] * ncomp
    y_grid = np.zeros((mcuy * yv, mcux * yh, 64), dtype=np.int32)
    rst = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_i and mcu_i % dri == 0:
                br.restart(rst)
                rst += 1
                preds = [0] * ncomp
            for s, ci in enumerate(order):
                _cid, ch, cv, _tq = comps[ci]
                dc_tab, ac_tab = tables[s]
                for bv in range(cv):
                    for bh in range(ch):
                        zz = _decode_block_zz(br, dc_tab, ac_tab, preds, ci)
                        if ci == y_ci:
                            y_grid[my * yv + bv, mx * yh + bh] = zz
            mcu_i += 1
    return _finish_luma(y_grid, yq, width, height)


def _decode_block_zz(br, dc_tab, ac_tab, preds, ci) -> list[int]:
    s = br.read_huff(dc_tab)
    diff = br.receive_extend(s) if s else 0
    preds[ci] += diff
    zz = [0] * 64
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        rs = br.read_huff(ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise _JpegError("AC run past block end")
        zz[k] = br.receive_extend(s)
        k += 1
    return zz


# ---------------------------------------------------------------------------
# progressive (SOF2) scan decoding — ITU T.81 Annex G (round 13).
# Coefficients accumulate across scans in per-component zigzag grids;
# the shared _finish_luma tail runs once at EOI.  Spectral selection
# (Ss..Se) and successive approximation (Ah/Al) both supported: DC
# first/refine scans are (optionally) interleaved, AC scans are
# single-component by spec.  Chroma scans are fully entropy-decoded
# (their bits interleave with nothing — each scan is self-delimited —
# but correctness is simpler to trust than a byte-skip) and only the
# luma grid is inverse-transformed.
# ---------------------------------------------------------------------------


def _refine_nonzero(br: _BitReader, blk, k: int, p1: int) -> None:
    """One correction bit for an already-nonzero coefficient (G.1.2.3:
    append the bit to the magnitude if not already set there)."""
    if br.read_bit():
        c = int(blk[k])
        if (abs(c) & p1) == 0:
            blk[k] = c + p1 if c > 0 else c - p1


def _ac_first_block(br, tab, blk, ss, se, al, eobrun) -> int:
    """AC first scan, one block (G.1.2.2); returns the new EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.read_huff(tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            return eobrun
        k += r
        if k > se:
            raise _JpegError("AC run past band end")
        blk[k] = br.receive_extend(s) << al
        k += 1
    return 0


def _ac_refine_block(br, tab, blk, ss, se, al, eobrun) -> int:
    """AC refinement scan, one block (G.1.2.3): newly significant
    coefficients arrive as +-1<<Al; every already-nonzero coefficient
    visited emits one correction bit; EOB runs cover whole blocks
    whose remaining coefficients are correction-only."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.read_huff(tab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise _JpegError("refine size must be 1")
                val = p1 if br.read_bit() else -p1
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(br, blk, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0:
                if k > se:
                    raise _JpegError("refine placement past band end")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                _refine_nonzero(br, blk, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(payload, data_pos, sos, frame, htabs, dri, coefs):
    """Decode ONE progressive scan into the per-component coefficient
    grids; returns the payload offset of the next marker (the scan is
    self-delimited by it), or None for a malformed scan."""
    width, height, comps = frame
    ncomp = len(comps)
    ns = sos[0]
    if ns < 1 or ns > ncomp or len(sos) < 1 + 2 * ns + 3:
        return None
    by_id = {c[0]: k for k, c in enumerate(comps)}
    scomps = []
    for s in range(ns):
        cid, tt = sos[1 + 2 * s], sos[2 + 2 * s]
        if cid not in by_id:
            return None
        scomps.append((by_id[cid], tt >> 4, tt & 15))
    ss, se, ahal = sos[1 + 2 * ns : 4 + 2 * ns]
    ah, al = ahal >> 4, ahal & 15
    if al > 13 or (ah and ah != al + 1) or se > 63:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    br = _BitReader(payload, data_pos)
    rst = 0
    unit_i = 0
    eobrun = 0
    preds = [0] * ncomp

    def _maybe_restart():
        nonlocal rst, preds, eobrun
        if dri and unit_i and unit_i % dri == 0:
            br.restart(rst)
            rst += 1
            preds = [0] * ncomp
            eobrun = 0

    if ss == 0:
        if se != 0:
            return None  # a DC scan is exactly the DC band
        dc_tabs = {}
        if ah == 0:
            for ci, dtid, _a in scomps:
                tab = htabs.get((0, dtid))
                if tab is None:
                    return None
                dc_tabs[ci] = tab
        if ns > 1:
            # interleaved DC scan: full MCU grid of the frame
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            for _my in range(mcuy):
                for _mx in range(mcux):
                    _maybe_restart()
                    my, mx = divmod(unit_i, mcux)
                    for ci, _d, _a in scomps:
                        _cid, hc, vc, _tq = comps[ci]
                        grid = coefs[ci]
                        for bv in range(vc):
                            for bh in range(hc):
                                blk = grid[my * vc + bv, mx * hc + bh]
                                if ah == 0:
                                    s = br.read_huff(dc_tabs[ci])
                                    diff = br.receive_extend(s) if s else 0
                                    preds[ci] += diff
                                    blk[0] = preds[ci] << al
                                elif br.read_bit():
                                    blk[0] = int(blk[0]) | (1 << al)
                    unit_i += 1
        else:
            ci = scomps[0][0]
            _cid, hc, vc, _tq = comps[ci]
            bw = (-(-(width * hc) // hmax) + 7) // 8
            bh = (-(-(height * vc) // vmax) + 7) // 8
            grid = coefs[ci]
            for by in range(bh):
                for bx in range(bw):
                    _maybe_restart()
                    blk = grid[by, bx]
                    if ah == 0:
                        s = br.read_huff(dc_tabs[ci])
                        diff = br.receive_extend(s) if s else 0
                        preds[ci] += diff
                        blk[0] = preds[ci] << al
                    elif br.read_bit():
                        blk[0] = int(blk[0]) | (1 << al)
                    unit_i += 1
    else:
        if ns != 1:
            return None  # AC scans are single-component by spec
        ci, _dtid, atid = scomps[0]
        tab = htabs.get((1, atid))
        if tab is None:
            return None
        _cid, hc, vc, _tq = comps[ci]
        bw = (-(-(width * hc) // hmax) + 7) // 8
        bh = (-(-(height * vc) // vmax) + 7) // 8
        grid = coefs[ci]
        for by in range(bh):
            for bx in range(bw):
                _maybe_restart()
                blk = grid[by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(br, tab, blk, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(br, tab, blk, ss, se, al, eobrun)
                unit_i += 1

    # the scan is self-delimited: resume the marker walk at the next
    # real marker (skipping stuffed 0x00 and any stray RSTn)
    p = br.pos
    n = len(payload)
    while p + 1 < n:
        if payload[p] == 0xFF:
            m2 = payload[p + 1]
            if m2 != 0x00 and not (0xD0 <= m2 <= 0xD7):
                return p
            p += 2
            continue
        p += 1
    return None


# ---------------------------------------------------------------------------
# progressive encoder twin (round 13): the standard web progression —
# DC first (Al=1) interleaved, per-component AC first (Al=1), DC
# refine, per-component AC refine (Al=0) — at 4:4:4 / grayscale.
# Progressive encoding is a LOSSLESS re-coding of the same quantized
# coefficients, so decode(progressive) must BIT-EQUAL
# decode(baseline) for the same pixels+quality: that identity is the
# round-trip test's whole assertion.
# ---------------------------------------------------------------------------


#: the progressive AC scans' Huffman table: EOBn symbols (r<<4, s=0)
#: do not exist in the Annex K baseline tables (real progressive
#: encoders ship optimized custom DHTs), so the twin writes a FLAT
#: canonical table — every (run, size<=10) symbol at 8 bits (176
#: codes < 256: Kraft-valid) — and the decoder reads it from the DHT
#: like any other.  Deliberately suboptimal compression; bit-valid.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


class _ScanWriter:
    """Per-scan bit writer with EOB-run + buffered-correction-bit
    state (T.81 G.1.2.2-3 / the jcphuff discipline)."""

    def __init__(self, ac_tab: dict | None):
        self.w = _BitWriter()
        self.ac_tab = ac_tab
        self.eobrun = 0
        self.bits: list[int] = []

    def flush_eob(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.ac_tab[r << 4]
            self.w.write(code, ln)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.bits:
            self.w.write(b, 1)
        self.bits = []

    def bump_eob(self, pending_bits: list[int]) -> None:
        self.eobrun += 1
        self.bits.extend(pending_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eob()

    def finish(self) -> bytes:
        self.flush_eob()
        self.w.align()
        return bytes(self.w.out)


def _enc_dc_first(grids, comp_order, dc_tabs, al: int) -> bytes:
    """Interleaved (1,1)-sampling DC first scan: every component's
    block (by, bx) in MCU raster order."""
    w = _BitWriter()
    preds = [0] * len(grids)
    n_by, n_bx = grids[0].shape[:2]
    for by in range(n_by):
        for bx in range(n_bx):
            for c in comp_order:
                dc = int(grids[c][by, bx, 0]) >> al
                diff = dc - preds[c]
                preds[c] = dc
                s = _category(diff)
                code, ln = dc_tabs[c][s]
                w.write(code, ln)
                if s:
                    w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    w.align()
    return bytes(w.out)


def _enc_dc_refine(grids, comp_order, al: int) -> bytes:
    w = _BitWriter()
    n_by, n_bx = grids[0].shape[:2]
    for by in range(n_by):
        for bx in range(n_bx):
            for c in comp_order:
                w.write((int(grids[c][by, bx, 0]) >> al) & 1, 1)
    w.align()
    return bytes(w.out)


def _enc_ac_first(grid, ac_enc: dict, ss: int, se: int, al: int) -> bytes:
    sw = _ScanWriter(ac_enc)
    n_by, n_bx = grid.shape[:2]
    for by in range(n_by):
        for bx in range(n_bx):
            blk = grid[by, bx]
            tv = []
            for k in range(ss, se + 1):
                v = int(blk[k])
                tv.append((v >> al) if v >= 0 else -((-v) >> al))
            last = -1
            for j, v in enumerate(tv):
                if v:
                    last = j
            if last < 0:
                sw.bump_eob([])
                continue
            sw.flush_eob()
            run = 0
            for j in range(last + 1):
                v = tv[j]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_enc[0xF0]
                    sw.w.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = ac_enc[(run << 4) | s]
                sw.w.write(code, ln)
                sw.w.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < se - ss:
                sw.bump_eob([])
    return sw.finish()


def _enc_ac_refine(grid, ac_enc: dict, ss: int, se: int, al: int) -> bytes:
    """G.1.2.3 refinement encoding (the jcphuff shape): newly
    significant coefficients ((abs>>Al) == 1) emit (run|1)+sign,
    previously significant ones buffer a correction bit that flushes
    after the next emitted symbol; blocks with no newly-significant
    tail fold into the EOB run with their correction bits."""
    sw = _ScanWriter(ac_enc)
    n_by, n_bx = grid.shape[:2]
    for by in range(n_by):
        for bx in range(n_bx):
            blk = grid[by, bx]
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eob = -1
            for j, t in enumerate(absv):
                if t == 1:
                    eob = j
            r = 0
            br_bits: list[int] = []
            for j, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and j <= eob:
                    sw.flush_eob()
                    code, ln = ac_enc[0xF0]
                    sw.w.write(code, ln)
                    r -= 16
                    for b in br_bits:
                        sw.w.write(b, 1)
                    br_bits = []
                if t > 1:
                    br_bits.append(t & 1)
                    continue
                sw.flush_eob()
                code, ln = ac_enc[(r << 4) | 1]
                sw.w.write(code, ln)
                sw.w.write(1 if int(blk[ss + j]) > 0 else 0, 1)
                for b in br_bits:
                    sw.w.write(b, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                sw.bump_eob(br_bits)
    return sw.finish()


def _sos_seg(scomps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
    body = bytes([len(scomps)])
    for cid, dt, at in scomps:
        body += bytes([cid, (dt << 4) | at])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def _jpeg_encode_progressive(
    planes: list[np.ndarray], width: int, height: int, quality: int
) -> bytes:
    """Shared progressive core: grayscale or 4:4:4 color (the encoder
    keeps sampling (1,1); the DECODER handles general sampling)."""
    ncomp = len(planes)
    q_l = quality_scaled(QUANT_LUMA, quality)
    tabs = [np.asarray(q_l, dtype=np.float64)]
    if ncomp == 3:
        q_c = quality_scaled(QUANT_CHROMA, quality)
        tabs.append(np.asarray(q_c, dtype=np.float64))
    grids = []
    for ci, plane in enumerate(planes):
        sub = _pad_plane(plane.astype(np.float64), 8, 8)
        grids.append(_fdct_quant(sub - 128.0, tabs[0 if ci == 0 else 1]))

    dc_enc = [_build_encode_table(*_DC_LUMA)]
    if ncomp == 3:
        dc_enc += [_build_encode_table(*_DC_CHROMA)] * 2
    ac_prog = _build_encode_table(*_AC_PROG)
    ac_enc = [ac_prog] * ncomp
    dc_tid = [0] + [1, 1][: ncomp - 1]
    ac_tid = [0] * ncomp  # one shared progressive AC table

    out = bytearray(b"\xff\xd8")
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_seg(0, q_l)
    if ncomp == 3:
        out += _dqt_seg(1, q_c)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)  # SOF2: progressive
    out += _dht_seg(0, 0, *_DC_LUMA)
    out += _dht_seg(1, 0, *_AC_PROG)
    if ncomp == 3:
        out += _dht_seg(0, 1, *_DC_CHROMA)

    comp_order = list(range(ncomp))
    # scan 1: DC first, interleaved, Al=1
    out += _sos_seg(
        [(c + 1, dc_tid[c], 0) for c in comp_order], 0, 0, 0, 1
    )
    out += _enc_dc_first(grids, comp_order, [dc_enc[c] for c in comp_order], 1)
    # per-component AC first, Al=1
    for c in comp_order:
        out += _sos_seg([(c + 1, 0, ac_tid[c])], 1, 63, 0, 1)
        out += _enc_ac_first(grids[c], ac_enc[c], 1, 63, 1)
    # DC refine to Al=0
    out += _sos_seg(
        [(c + 1, dc_tid[c], 0) for c in comp_order], 0, 0, 1, 0
    )
    out += _enc_dc_refine(grids, comp_order, 0)
    # per-component AC refine to Al=0
    for c in comp_order:
        out += _sos_seg([(c + 1, 0, ac_tid[c])], 1, 63, 1, 0)
        out += _enc_ac_refine(grids[c], ac_enc[c], 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_gray_progressive(
    grays: list[int], width: int, height: int, quality: int = 75
) -> bytes:
    """A REAL progressive (SOF2) grayscale JPEG — the standard web
    progression (spectral selection + successive approximation), a
    lossless re-coding of exactly the coefficients the baseline
    encoder quantizes."""
    if len(grays) != width * height:
        raise ValueError(f"need {width * height} grays, got {len(grays)}")
    plane = np.asarray(grays, dtype=np.float64).reshape(height, width)
    return _jpeg_encode_progressive([plane], width, height, quality)


def jpeg_encode_ycbcr_progressive(
    y: list[int], cb: list[int], cr: list[int],
    width: int, height: int, quality: int = 75,
) -> bytes:
    """A REAL progressive color JPEG at 4:4:4 (interleaved DC scan
    over three components + per-component AC scans — exercises the
    decoder's multi-component progressive paths)."""
    n = width * height
    if not (len(y) == len(cb) == len(cr) == n):
        raise ValueError("Y/Cb/Cr planes must all be width*height")
    planes = [
        np.asarray(p, dtype=np.float64).reshape(height, width)
        for p in (y, cb, cr)
    ]
    return _jpeg_encode_progressive(planes, width, height, quality)
