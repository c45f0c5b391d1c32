"""GIF pixel codec, stdlib-only (round 13, second half).

With PNG (full legal surface) and JPEG (baseline + progressive)
decoded, GIF was the last of the three classic web image formats
still falling to the md5-fake rung — a palette re-save of a PNG icon
as GIF, or a GIF re-encode, deduped byte-exact only.  This module
adds:

- :func:`decode_gif_frames` (round 14, r13 verdict task 3) — the
  full animation: GIF87a/89a logical screen, global/local color
  tables, the GIF variant of LZW (little-endian bit packing across
  data sub-blocks, code width growth to 12 bits, CLEAR/END codes,
  the deferred-clear rule), 4-pass interlacing, Graphic Control
  Extensions (transparency index + disposal methods 0/1 leave,
  2 restore-to-background, 3 restore-to-previous) and frame
  COMPOSITION onto the logical screen — each returned frame is the
  composed full canvas, row-major grayscale.  Work is bounded twice:
  ``GIF_MAX_FRAMES`` and a cumulative ``GIF_MAX_PIXELS`` budget
  across frames (a bomb stops early with the frames already
  composed).  Malformed tables, codes past the dictionary, or
  truncated streams return None (the fake-rung ladder contract,
  never a raise).
- :func:`decode_gif_pixels` — the poster frame (first composed
  frame): image dedup hashes this; an animation's temporal axis
  belongs to the video tier (videoembed routes multi-frame GIFs
  through the frame sampler + SUM pooling).
- :func:`gif_frame_count` — cheap image-descriptor count (sub-block
  skipping, no LZW work): the is-this-a-clip probe.
- :func:`gif_encode_gray` / :func:`gif_encode_gray_animation` — the
  writer twins: real single-frame / multi-frame GIF89a with a
  256-entry grayscale table and a REAL LZW compressor (fixture
  generators; any external GIF encoder produces payloads the decoder
  reads).  The animation writer's ``delta=True`` form encodes each
  later frame as the changed-pixel bounding rect (the classic GIF
  optimizer output) — byte-different from the full-frame form,
  composing to identical frames: the re-encode regime the video
  tier's tests pin.

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
#: For animations the ceiling is CUMULATIVE across composed frames.
GIF_MAX_PIXELS = 1 << 22

#: frame ceiling for the animation decoder (a 64-frame sample is far
#: past the video tier's 4-frame sampling budget).
GIF_MAX_FRAMES = 64

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


def decode_gif_frames(
    payload: bytes, max_frames: int = GIF_MAX_FRAMES
) -> tuple[int, int, list[list[int]]] | None:
    """REAL GIF animation decode: (width, height, [frame grays, ...])
    where every frame is the full logical screen COMPOSED per the
    GIF89a rendering model — Graphic Control Extension transparency
    (transparent pixels leave the canvas as-is) and disposal methods
    0/1 (leave in place), 2 (restore the frame rect to background)
    and 3 (restore to the previous canvas).  The background color
    index refers to the GLOBAL color table; absent/oversized indexes
    compose luma 0.

    Work bounds: at most ``max_frames`` frames and a cumulative
    GIF_MAX_PIXELS pixel budget — a decompression bomb stops early
    with the frames already composed (graceful), a malformed stream
    before ANY frame returns None (the fake-rung contract)."""
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
        # background index refers to the GLOBAL color table per
        # GIF89a; out-of-range (or no GCT) composes luma 0
        bg = gct[bg_idx] if (gct is not None and bg_idx < len(gct)) else 0
        canvas = [bg] * (sw * sh)
        frames: list[list[int]] = []
        budget = GIF_MAX_PIXELS
        disposal = 0
        transparent: int | None = None
        while i < n:
            b = payload[i]
            if b == 0x21:  # extension
                if (
                    i + 7 < n
                    and payload[i + 1] == 0xF9
                    and payload[i + 2] == 4
                ):
                    packed = payload[i + 3]
                    disposal = (packed >> 2) & 7
                    transparent = payload[i + 6] if packed & 1 else None
                i += 2
                while i < n and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
            elif b == 0x2C:  # image descriptor
                if i + 10 > n:
                    return None if not frames else _done(sw, sh, frames)
                left, top, fw, fh = struct.unpack(
                    "<HHHH", payload[i + 1 : i + 9]
                )
                iflags = payload[i + 9]
                i += 10
                table = gct
                if iflags & 0x80:  # local color table
                    size = 2 << (iflags & 7)
                    if i + 3 * size > n:
                        return None if not frames else _done(sw, sh, frames)
                    table = _luma_table(payload[i : i + 3 * size])
                    i += 3 * size
                if table is None or fw == 0 or fh == 0:
                    return None if not frames else _done(sw, sh, frames)
                if left + fw > sw or top + fh > sh:
                    return None if not frames else _done(sw, sh, frames)
                budget -= fw * fh
                if budget < 0:  # cumulative bomb ceiling
                    break
                if i >= n:  # truncated right after the descriptor
                    return None if not frames else _done(sw, sh, frames)
                min_code = payload[i]
                i += 1
                data = bytearray()
                while i < n and payload[i] != 0:
                    ln = payload[i]
                    data += payload[i + 1 : i + 1 + ln]
                    i += 1 + ln
                i += 1  # past the sub-block terminator
                idx = _lzw_decode(bytes(data), min_code, fw * fh)
                if idx is None or len(idx) < fw * fh:
                    return None if not frames else _done(sw, sh, frames)
                nt = len(table)
                if any(v >= nt and v != transparent for v in idx):
                    return None if not frames else _done(sw, sh, frames)
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
                saved = canvas.copy() if disposal == 3 else None
                for r in range(fh):
                    base = (top + r) * sw + left
                    row = idx[r * fw : (r + 1) * fw]
                    if transparent is None:
                        canvas[base : base + fw] = [table[v] for v in row]
                    else:
                        for c, v in enumerate(row):
                            if v != transparent:
                                canvas[base + c] = table[v]
                frames.append(canvas.copy())
                if len(frames) >= max_frames:
                    break
                if disposal == 2:
                    for r in range(fh):
                        base = (top + r) * sw + left
                        canvas[base : base + fw] = [bg] * fw
                elif disposal == 3 and saved is not None:
                    canvas = saved
                disposal = 0
                transparent = None
            elif b == 0x3B:  # trailer
                break
            else:
                # lost framing: keep what composed, None if nothing
                return None if not frames else _done(sw, sh, frames)
        return None if not frames else _done(sw, sh, frames)
    except (struct.error, IndexError, ValueError, TypeError):
        return None


def _done(
    sw: int, sh: int, frames: list[list[int]]
) -> tuple[int, int, list[list[int]]]:
    return int(sw), int(sh), frames


def gif_frame_count(
    payload: bytes, max_count: int = GIF_MAX_FRAMES
) -> int:
    """Image-descriptor count (bounded), 0 for non-GIF/unframeable
    payloads — sub-block skipping only, NO LZW work: the cheap
    is-this-a-clip probe the video encoder seam uses before paying
    for a full animation decode.  A structural error encountered
    AFTER descriptors were counted returns the accumulated count
    (r14 advice: a truncated tail must not reclassify an animation
    whose first descriptors are intact)."""
    count = 0
    try:
        n = len(payload)
        if n < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
            return 0
        flags = payload[10]
        i = 13
        if flags & 0x80:
            i += 3 * (2 << (flags & 7))
        while i < n and count < max_count:
            b = payload[i]
            if b == 0x21:
                i += 2
                while i < n and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
            elif b == 0x2C:
                if i + 10 > n:
                    break
                iflags = payload[i + 9]
                i += 10
                if iflags & 0x80:
                    i += 3 * (2 << (iflags & 7))
                i += 1  # LZW min code size
                if i > n:
                    break
                while i < n and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
                count += 1
            elif b == 0x3B:
                break
            else:
                break
        return count
    except (struct.error, IndexError, ValueError, TypeError):
        return count


def decode_gif_pixels(payload: bytes) -> tuple[int, int, list[int]] | None:
    """REAL GIF decode: (width, height, row-major GRAYSCALE values)
    of the first frame composed onto the logical screen, None for
    non-GIF / malformed / oversized payloads (module docstring).
    Round 14: the poster-frame view of :func:`decode_gif_frames`."""
    decoded = decode_gif_frames(payload, max_frames=1)
    if decoded is None:
        return None
    sw, sh, frames = decoded
    return sw, sh, frames[0]


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


def _gif_sub_blocks(lzw: bytes) -> bytes:
    blocks = bytearray()
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return bytes(blocks)


def gif_encode_gray_animation(
    frames: list[list[int]],
    width: int,
    height: int,
    delta: bool = True,
    delay_cs: int = 4,
) -> bytes:
    """A REAL multi-frame GIF89a (module docstring): 256-entry
    grayscale global table, one Graphic Control Extension (disposal 1
    = leave in place, ``delay_cs`` centiseconds) + image descriptor +
    LZW stream per frame.

    ``delta=True`` encodes each later frame as the bounding rect of
    pixels that CHANGED vs the previous frame (the classic GIF
    optimizer output; an unchanged frame encodes a 1x1 rect) —
    byte-different from the ``delta=False`` full-canvas form while
    composing to identical frames under :func:`decode_gif_frames`."""
    if not frames:
        raise ValueError("an animation needs at least one frame")
    for f in frames:
        if len(f) != width * height:
            raise ValueError(f"every frame needs {width * height} grays")
    gct = bytes(v for g in range(256) for v in (g, g, g))
    out = bytearray(
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0xF7, 0, 0])  # GCT present, 256 entries; bg 0
        + gct
    )
    gce = (
        b"\x21\xf9\x04"
        + bytes([0x04])  # disposal 1 (leave), no transparency
        + struct.pack("<H", delay_cs)
        + bytes([0, 0])  # transparent index (unused) + terminator
    )
    prev: list[int] | None = None
    for f in frames:
        if prev is None or not delta:
            left = top = 0
            fw, fh = width, height
            sub = f
        else:
            changed = [k for k in range(width * height) if f[k] != prev[k]]
            if changed:
                xs = [k % width for k in changed]
                ys = [k // width for k in changed]
                left, top = min(xs), min(ys)
                fw = max(xs) - left + 1
                fh = max(ys) - top + 1
            else:
                left = top = 0
                fw = fh = 1  # unchanged frame: a 1x1 repaint
            sub = [
                f[(top + r) * width + left + c]
                for r in range(fh)
                for c in range(fw)
            ]
        out += gce
        out += (
            b"\x2c"
            + struct.pack("<HHHH", left, top, fw, fh)
            + b"\x00"  # no LCT, sequential
            + bytes([8])
            + _gif_sub_blocks(_lzw_encode([g & 0xFF for g in sub], 8))
        )
        prev = f
    out += b"\x3b"
    return bytes(out)


def gif_clip_header(
    payload: bytes,
) -> tuple[str, str, int, int, int, str] | None:
    """Video-METADATA view of an ANIMATED GIF in the
    ``parse_video_header`` output shape: ('gif', version, 100,
    total_delay_cs, 1, 'gif-lzw') — timescale is the GIF clock
    (centiseconds), duration the sum of the frames' GCE delays (a
    delay-less frame counts the conventional 10 cs players substitute
    for 0).  None for non-GIF payloads and for SINGLE-frame GIFs —
    those are images; the metadata ladder must agree with the sample
    tier's clip/image split.  Sub-block skipping only, no LZW work."""
    try:
        n = len(payload)
        if n < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        version = payload[:6].decode("ascii")
        flags = payload[10]
        i = 13
        if flags & 0x80:
            i += 3 * (2 << (flags & 7))
        n_frames = 0
        total_cs = 0
        pending_delay: int | None = None
        while i < n and n_frames < GIF_MAX_FRAMES:
            b = payload[i]
            if b == 0x21:
                if (
                    i + 7 < n
                    and payload[i + 1] == 0xF9
                    and payload[i + 2] == 4
                ):
                    (pending_delay,) = struct.unpack(
                        "<H", payload[i + 4 : i + 6]
                    )
                i += 2
                while i < n and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
            elif b == 0x2C:
                if i + 10 > n:
                    break
                iflags = payload[i + 9]
                i += 10
                if iflags & 0x80:
                    i += 3 * (2 << (iflags & 7))
                i += 1  # LZW min code size
                while i < n and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
                n_frames += 1
                total_cs += (
                    pending_delay if pending_delay else 10
                )  # 0/absent -> the players' conventional 10 cs
                pending_delay = None
            elif b == 0x3B:
                break
            else:
                break
        if n_frames < 2:
            return None  # single frame: the image tier owns it
        return "gif", version, 100, total_cs, 1, "gif-lzw"
    except (struct.error, IndexError, ValueError, TypeError):
        return None
