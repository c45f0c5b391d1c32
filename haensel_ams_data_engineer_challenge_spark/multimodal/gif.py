"""GIF pixel codec, stdlib-only (round 13, second half).

With PNG (full legal surface) and JPEG (baseline + progressive)
decoded, GIF was the last of the three classic web image formats
still falling to the md5-fake rung — a palette re-save of a PNG icon
as GIF, or a GIF re-encode, deduped byte-exact only.  This module
adds:

- :func:`decode_gif_pixels` — GIF87a/89a logical screen + first
  image descriptor, global/local color tables, the GIF variant of
  LZW (little-endian bit packing across data sub-blocks, code width
  growth to 12 bits, CLEAR/END codes, the deferred-clear rule), and
  4-pass interlacing.  Output is row-major GRAYSCALE lumas of the
  FIRST frame composed onto the logical screen (uncovered area takes
  the background color): image dedup hashes the poster frame — an
  animation's temporal axis belongs to the video tier.  Malformed
  tables, codes past the dictionary, or truncated streams return
  None (the fake-rung ladder contract, never a raise).
- :func:`gif_encode_gray` — the writer twin: a real single-frame
  GIF89a with a 256-entry grayscale table and a REAL LZW compressor
  (the fixture generator; any external GIF encoder produces payloads
  the decoder reads).

Decoding is exact integer work end-to-end (LZW is lossless; lumas
are the shared ITU-R 601 integer formula), so decode(encode(grays))
round-trips bit-equal — and a GIF re-save of a grayscale PNG hashes
identically to the PNG (pinned in pytest).

Reference analogue: none — media tiers are the mandated extension
surface; same contract as multimodal/jpeg.py.
"""

from __future__ import annotations

import struct

#: pixel ceiling — the LZW loop is per-pixel Python (the PNG/JPEG
#: bound discipline); declared dims past it fall to the fake rung.
GIF_MAX_PIXELS = 1 << 22

#: 4-pass GIF interlace row schedule: (start, step) per pass.
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _luma_table(rgb: bytes) -> list[int]:
    return [
        (299 * rgb[3 * k] + 587 * rgb[3 * k + 1] + 114 * rgb[3 * k + 2])
        // 1000
        for k in range(len(rgb) // 3)
    ]


class _GifBits:
    """Little-endian LZW bit reader over concatenated sub-blocks."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int | None:
        while self.n < width:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def _lzw_decode(data: bytes, min_code: int, max_out: int) -> list[int] | None:
    """GIF-LZW: returns the index stream or None on any malformed
    condition (bad code width, code past the dictionary, stream
    ending without END when max_out not reached is TOLERATED — real
    encoders sometimes omit END — but overlong output is not)."""
    if not 2 <= min_code <= 11:
        return None
    clear = 1 << min_code
    end = clear + 1
    br = _GifBits(data)
    out: list[int] = []

    def reset():
        return {i: (i,) for i in range(clear)}, min_code + 1

    table, width = reset()
    prev: tuple[int, ...] | None = None
    next_code = end + 1
    while len(out) < max_out:
        code = br.read(width)
        if code is None:
            break  # truncated data: emit what decoded (bounded)
        if code == clear:
            table, width = reset()
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if code < next_code and code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            return None  # code past the dictionary: corrupt
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:max_out]


def decode_gif_pixels(payload: bytes) -> tuple[int, int, list[int]] | None:
    """REAL GIF decode: (width, height, row-major GRAYSCALE values)
    of the first frame composed onto the logical screen, None for
    non-GIF / malformed / oversized payloads (module docstring)."""
    try:
        n = len(payload)
        if n < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        sw, sh = struct.unpack("<HH", payload[6:10])
        flags, bg_idx, _ar = payload[10], payload[11], payload[12]
        if sw == 0 or sh == 0 or sw * sh > GIF_MAX_PIXELS:
            return None
        i = 13
        gct = None
        if flags & 0x80:
            size = 2 << (flags & 7)
            if i + 3 * size > n:
                return None
            gct = _luma_table(payload[i : i + 3 * size])
            i += 3 * size
        while i < n:
            b = payload[i]
            if b == 0x21:  # extension: skip its sub-blocks
                i += 2
                while i < n and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
            elif b == 0x2C:  # image descriptor: the first frame
                if i + 10 > n:
                    return None
                left, top, fw, fh = struct.unpack("<HHHH", payload[i + 1 : i + 9])
                iflags = payload[i + 9]
                i += 10
                table = gct
                if iflags & 0x80:  # local color table
                    size = 2 << (iflags & 7)
                    if i + 3 * size > n:
                        return None
                    table = _luma_table(payload[i : i + 3 * size])
                    i += 3 * size
                if table is None or fw == 0 or fh == 0:
                    return None
                if left + fw > sw or top + fh > sh:
                    return None  # frame past the screen: corrupt
                min_code = payload[i]
                i += 1
                data = bytearray()
                while i < n and payload[i] != 0:
                    ln = payload[i]
                    data += payload[i + 1 : i + 1 + ln]
                    i += 1 + ln
                idx = _lzw_decode(bytes(data), min_code, fw * fh)
                if idx is None or len(idx) < fw * fh:
                    return None
                nt = len(table)
                if any(v >= nt for v in idx):
                    return None
                if iflags & 0x40:  # interlaced: 4-pass row shuffle
                    rows = []
                    for start, step in _GIF_INTERLACE:
                        rows.extend(range(start, fh, step))
                    shuffled = idx
                    idx = [0] * (fw * fh)
                    for src_r, dst_r in enumerate(rows):
                        idx[dst_r * fw : (dst_r + 1) * fw] = shuffled[
                            src_r * fw : (src_r + 1) * fw
                        ]
                # background index refers to the GLOBAL color table per
                # GIF89a §18 — look it up there, not in the active
                # (possibly local) table (r13 advice: a local table
                # smaller than the GCT used to raise IndexError and
                # drop a valid GIF to the fake rung; a larger one
                # composed the wrong background luma)
                bg = gct[bg_idx] if (gct is not None and bg_idx < len(gct)) else 0
                if left == 0 and top == 0 and fw == sw and fh == sh:
                    return int(sw), int(sh), [table[v] for v in idx]
                full = [bg] * (sw * sh)
                for r in range(fh):
                    base = (top + r) * sw + left
                    row = idx[r * fw : (r + 1) * fw]
                    full[base : base + fw] = [table[v] for v in row]
                return int(sw), int(sh), full
            elif b == 0x3B:  # trailer before any image
                return None
            else:
                return None
        return None
    except (struct.error, IndexError, ValueError, TypeError):
        return None


# ---------------------------------------------------------------------------
# writer twin
# ---------------------------------------------------------------------------


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    """A REAL GIF-LZW compressor (string-table form, CLEAR emitted
    first and on table overflow, END last) — little-endian bit
    packing, the exact stream :func:`_lzw_decode` reads."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # CODE WIDTH follows the DECODER's table counter, which lags the
    # encoder's by one define (the decoder learns entry k only when it
    # reads the code emitted AFTER k's defining emission) — so the
    # encoder simulates the decoder: no define on the first data code
    # after a clear, one per data code thereafter, width++ when the
    # simulated counter reaches 2^width.  Emitting with the encoder's
    # own counter is the classic one-pixel-garbage LZW bug.
    table = {(i,): i for i in range(clear)}
    enc_next = end + 1
    dec_next = end + 1
    width = min_code + 1
    first_after_clear = True

    def emit_data(code: int):
        nonlocal dec_next, width, first_after_clear
        emit(code, width)
        if first_after_clear:
            first_after_clear = False
        else:
            dec_next += 1
            if dec_next == (1 << width) and width < 12:
                width += 1

    emit(clear, width)
    prev: tuple[int, ...] = ()
    for v in indices:
        cur = prev + (v,)
        if cur in table:
            prev = cur
            continue
        emit_data(table[prev])
        if enc_next < 4096:
            table[cur] = enc_next
            enc_next += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            enc_next = end + 1
            dec_next = end + 1
            width = min_code + 1
            first_after_clear = True
        prev = (v,)
    if prev:
        emit_data(table[prev])
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode_gray(grays: list[int], width: int, height: int) -> bytes:
    """A REAL single-frame GIF89a: 256-entry grayscale global color
    table (index == luma) + LZW-compressed full-frame image —
    decodable by any GIF reader; decode(encode(g)) == g exactly."""
    if len(grays) != width * height:
        raise ValueError(f"need {width * height} grays, got {len(grays)}")
    gct = bytes(v for g in range(256) for v in (g, g, g))
    lzw = _lzw_encode([g & 0xFF for g in grays], 8)
    blocks = bytearray()
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0xF7, 0, 0])  # GCT present, 256 entries; bg 0
        + gct
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, width, height)
        + b"\x00"  # no LCT, sequential
        + bytes([8])  # LZW min code size
        + bytes(blocks)
        + b"\x3b"
    )
