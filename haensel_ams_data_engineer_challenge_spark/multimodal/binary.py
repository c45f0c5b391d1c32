"""Multimodal columns: opaque binary payloads + typed metadata.

Model: media (image/audio/video) lives in a ``binary`` column next to
typed metadata columns; decode / feature-extract / resize run as
Arrow-batched ``mapInPandas`` over that column so bytes never pass
through Python row-at-a-time.

Round 9: the decoder is no longer all-stub.  ``parse_image_header``
does a REAL stdlib-only decode of PNG (IHDR), JPEG (marker walk to
SOFn) and GIF (logical screen descriptor) headers — format + pixel
dimensions from the actual bytes.  Full pixel decode (and every other
container format) still needs a codec library the container doesn't
ship, so ``decode_image_meta`` falls back per-payload: header parse ->
Pillow (if importable) -> the deterministic fake decode (documented
below).  The Spark-side plumbing (schema, batch iteration,
partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, format string, width long, height long, "
    "decoder string, content_hash string"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: JPEG SOFn markers that carry frame dimensions — every 0xC0-0xCF
#: except DHT (C4), JPG (C8) and DAC (CC), per ITU T.81 Table B.1.
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """REAL (stdlib-only) image-header decode: (format, width, height)
    for PNG / JPEG / GIF payloads, None when the payload is not one.

    - PNG: 8-byte signature, then the IHDR chunk is mandatory-first
      (PNG spec 5.6) — width/height are its first two big-endian u32s.
    - GIF: 'GIF87a'/'GIF89a', then the logical screen descriptor's
      little-endian u16 width/height.
    - JPEG: walk the marker segments from SOI, skipping APPn/COM/DQT
      etc. by their big-endian lengths, until a SOFn frame header —
      height then width as big-endian u16s (ITU T.81 B.2.2).  Stops at
      SOS/EOI: dimensions must precede the scan.
    """
    n = len(payload)
    if n >= 24 and payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h
    if n >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None  # desynced — not a well-formed JPEG
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte (T.81 B.1.1.2)
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers: no length field
                continue
            if marker in (0xD9, 0xDA):  # EOI / SOS: no SOFn seen
                return None
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
    return None


def _fake_decode(
    payload: bytes, digest: bytes | None = None
) -> tuple[str, int, int]:
    """Deterministic fake decode: pretend the payload is an image whose
    format/dimensions derive from its md5 — stable across runs,
    engines and partitionings.  A caller that already holds the md5
    digest passes it in (round 16: the fused pipeline computed the
    same hash three times per payload — once for content_hash, once
    per fake rung)."""
    if digest is None:
        digest = hashlib.md5(payload).digest()
    fmt = ("png", "jpeg", "webp")[digest[0] % 3]
    width = 64 + int.from_bytes(digest[1:3], "big") % 1984
    height = 64 + int.from_bytes(digest[3:5], "big") % 1984
    return fmt, width, height


def decode_image_meta(
    binary_df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
    try_header: bool = True,
) -> DataFrame:
    """mapInPandas decode: (id, n_bytes, format, width, height, decoder).

    Per-payload decoder ladder: real header parse (PNG/JPEG/GIF,
    decoder='header') -> Pillow when importable (decoder='pillow') ->
    deterministic fake (decoder='fake').  Header-first keeps the
    output independent of whether a codec library happens to be
    installed.  Arrow batches keep the payload bytes zero-copy
    end-to-end.

    ``passthrough`` columns of ``binary_df`` are carried through the
    decode unchanged (appended after the decode schema) — the way a
    real pipeline keeps source metadata next to decoded media without
    a re-join.

    ``try_header=False`` skips the real header parse — for callers
    whose payloads are KNOWN not to be images (the text-bytes stub
    arm): 'GIF87a' is pure ASCII, so a document that happens to start
    with it would otherwise header-parse, while the arm's oracle twin
    models only the fake decode.
    """
    schema = DECODE_SCHEMA
    if passthrough:
        fields = dict(
            (f.name, f.dataType.simpleString()) for f in binary_df.schema.fields
        )
        schema += ", " + ", ".join(f"{c} {fields[c]}" for c in passthrough)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = make_image_codec()

        def one(payload: bytes) -> tuple[str, int, int, str]:
            return image_meta_ladder(payload, codec, try_header)

        for pdf in batches:
            meta = [one(p) for p in pdf[payload_col]]
            out = {
                "doc_id": pdf[id_col].values,
                "n_bytes": [len(p) for p in pdf[payload_col]],
                "format": [m[0] for m in meta],
                "width": [m[1] for m in meta],
                "height": [m[2] for m in meta],
                "decoder": [m[3] for m in meta],
                # payload digest: the exact-dedup key for media
                # columns (md5-hex, same bytes SQL md5() hashes)
                "content_hash": [
                    hashlib.md5(p).hexdigest() for p in pdf[payload_col]
                ],
            }
            for c in passthrough:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(_decode, schema)


# ---------------------------------------------------------------------------
# audio modality (round 9): WAV/RIFF header decode, stdlib-only — the
# audio twin of parse_image_header.  Sample rate / channels / bit
# depth / sample count come from the actual bytes; the same
# header -> fake decoder ladder keeps unknown containers flowing.
# ---------------------------------------------------------------------------

AUDIO_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, format string, channels long, "
    "sample_rate long, bits_per_sample long, n_samples long, "
    "duration_ms long, decoder string, content_hash string"
)


def parse_audio_header(payload: bytes) -> tuple[str, int, int, int, int] | None:
    """REAL (stdlib-only) WAV header decode: ('wav', channels,
    sample_rate, bits_per_sample, n_samples) for RIFF/WAVE PCM
    payloads, None otherwise.

    Walks the RIFF chunk list (word-aligned, per the RIFF spec) for
    the mandatory ``fmt `` chunk (PCM layout: format tag, channels,
    sample rate, byte rate, block align, bits — all little-endian) and
    the ``data`` chunk header.  ``n_samples`` derives from the DATA
    CHUNK'S DECLARED size / block align — the data bytes themselves
    need not be present (object stores serve ranged header reads; the
    100 TB pipeline never pulls a full media payload to learn its
    geometry)."""
    n = len(payload)
    if n < 36 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    fmt = None
    data_size = None
    i = 12
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if cid == b"fmt " and size >= 16 and i + 24 <= n:
            audio_fmt, ch, rate, _br, block, bits = struct.unpack(
                "<HHIIHH", payload[i + 8 : i + 24]
            )
            # PCM, G.711 mu/A-law and IMA-ADPCM (round 14: the header
            # tier reports geometry for every format the SAMPLE tier
            # decodes — audioembed.decode_wav_samples); anything else
            # needs a real codec and falls through
            if audio_fmt not in (1, 6, 7, 0x11):
                return None
            fmt = (audio_fmt, ch, rate, block, bits)
        elif cid == b"data":
            data_size = size
        if fmt is not None and data_size is not None:
            break
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    audio_fmt, ch, rate, block, bits = fmt
    if ch == 0 or rate == 0 or block == 0:
        return None
    if audio_fmt == 0x11:
        # block-compressed: samples per block from the block geometry
        # (per-channel 4-byte headers + 2 samples per data byte/ch)
        # word-alignment: data words interleave per channel in 4-byte
        # units, so (block - headers) must divide into whole words per
        # channel — the SAME geometry audioembed.decode_wav_samples
        # enforces, so the header tier never reports a payload the
        # sample tier refuses (r14 advice)
        if bits != 4 or block < 4 * ch or (block - 4 * ch) % (4 * ch) != 0:
            return None
        spb = 1 + (block - 4 * ch) * 2 // ch
        return "wav", ch, rate, bits, (data_size // block) * spb
    return "wav", ch, rate, bits, data_size // block


#: MPEG audio bitrate tables, kbit/s by (version-group, layer); index
#: 0 is "free format" (refused — geometry underivable), 15 invalid.
#: Version groups: V1 = MPEG1; V2 = MPEG2 and 2.5 (shared tables).
_MP3_BITRATES = {
    ("v1", 1): (0, 32, 64, 96, 128, 160, 192, 224,
                256, 288, 320, 352, 384, 416, 448),
    ("v1", 2): (0, 32, 48, 56, 64, 80, 96, 112,
                128, 160, 192, 224, 256, 320, 384),
    ("v1", 3): (0, 32, 40, 48, 56, 64, 80, 96,
                112, 128, 160, 192, 224, 256, 320),
    ("v2", 1): (0, 32, 48, 56, 64, 80, 96, 112,
                128, 144, 160, 176, 192, 224, 256),
    ("v2", 2): (0, 8, 16, 24, 32, 40, 48, 56,
                64, 80, 96, 112, 128, 144, 160),
    ("v2", 3): (0, 8, 16, 24, 32, 40, 48, 56,
                64, 80, 96, 112, 128, 144, 160),
}

#: sample rates by version bits (0=MPEG2.5, 2=MPEG2, 3=MPEG1).
_MP3_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _mp3_frame_geometry(
    h: bytes,
) -> tuple[int, int, int, int, int] | None:
    """(channels, rate, samples_per_frame, frame_bytes, version_bits)
    of one 4-byte MPEG audio frame header, None when any field is
    reserved/invalid (the false-positive guard: random bytes rarely
    satisfy sync + version + layer + bitrate + rate together)."""
    if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    version = (h[1] >> 3) & 3
    layer_bits = (h[1] >> 1) & 3
    if version == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # 3->I, 2->II, 1->III
    br_idx = h[2] >> 4
    sr_idx = (h[2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    vgroup = "v1" if version == 3 else "v2"
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx] * 1000
    rate = _MP3_RATES[version][sr_idx]
    padding = (h[2] >> 1) & 1
    if layer == 1:
        spf = 384
        frame = (12 * bitrate // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == 3) else 576
        frame = spf // 8 * bitrate // rate + padding
    if frame <= 4:
        return None
    channels = 1 if (h[3] >> 6) == 3 else 2
    return channels, rate, spf, frame, version


def parse_mp3_header(
    payload: bytes,
) -> tuple[str, int, int, int, int] | None:
    """REAL (stdlib-only) MP3 metadata decode: ('mp3', channels,
    sample_rate, 0, n_samples) — the header-only rung for the
    dominant crawl audio format (r14 verdict #4), the avc1 treatment:
    geometry and duration from headers, SAMPLE decode stays on the
    fake rung (an MDCT synthesis filterbank is out of scope).

    Ladder: skip an ID3v2 tag (syncsafe size, optional footer), parse
    the MPEG frame header AT that offset (version/layer/bitrate/
    samplerate tables; free-format and reserved fields refuse), then:

    - VBR: a Xing/Info block at the layer-III side-info offset with
      the frames flag -> n_samples = frame_count x samples/frame (the
      byte length says nothing about VBR duration);
    - CBR: n_samples = complete frames present x samples/frame, from
      len(payload) minus the ID3v2 prefix and an ID3v1 'TAG' trailer
      — the declared-size discipline of the WAV rung (a truncated or
      ranged payload reports its decodable prefix).

    ``bits_per_sample`` is 0: MP3 has no PCM bit depth.  When enough
    bytes are present, the NEXT frame's sync is verified — random
    0xFF-lead bytes must not reach the header rung; a payload shorter
    than one frame stays parseable (ranged header reads)."""
    n = len(payload)
    off = 0
    if payload[:3] == b"ID3" and n >= 10:
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                return None  # not syncsafe: not a real ID3v2 tag
            size = (size << 7) | b
        off = 10 + size + (10 if payload[5] & 0x10 else 0)
    geo = _mp3_frame_geometry(payload[off : off + 4])
    if geo is None:
        return None
    channels, rate, spf, frame, version = geo
    # second-sync verification whenever the bytes are present: the
    # next frame must also carry a valid header (same rate/version —
    # fields bitrate/padding may differ frame to frame)
    if off + frame + 4 <= n:
        nxt = _mp3_frame_geometry(payload[off + frame : off + frame + 4])
        if nxt is None or nxt[1] != rate or nxt[4] != version:
            return None
    layer_bits = (payload[off + 1] >> 1) & 3
    audio_end = n
    if payload[-128:][:3] == b"TAG" and n - off >= 128:
        audio_end = n - 128
    n_samples = max(0, (audio_end - off)) // frame * spf
    if layer_bits == 1:  # layer III: probe the Xing/Info VBR block
        side = (
            (17 if channels == 1 else 32)
            if version == 3
            else (9 if channels == 1 else 17)
        )
        x = off + 4 + side
        if payload[x : x + 4] in (b"Xing", b"Info") and x + 12 <= n:
            (flags,) = struct.unpack(">I", payload[x + 4 : x + 8])
            if flags & 1:
                (frames,) = struct.unpack(">I", payload[x + 8 : x + 12])
                n_samples = frames * spf
    return "mp3", channels, rate, 0, n_samples


def _fake_audio_decode(payload: bytes) -> tuple[str, int, int, int, int]:
    """Deterministic fake audio decode (md5-derived geometry) — the
    ladder's last rung, same contract as ``_fake_decode``."""
    digest = hashlib.md5(payload).digest()
    fmt = ("wav", "mp3", "flac")[digest[0] % 3]
    channels = 1 + digest[1] % 2
    rate = (8000, 16000, 22050, 44100)[digest[2] % 4]
    bits = 8 * (1 + digest[3] % 2)
    n_samples = 1000 + int.from_bytes(digest[4:7], "big") % 100000
    return fmt, channels, rate, bits, n_samples


def decode_audio_meta(
    binary_df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
    try_header: bool = True,
) -> DataFrame:
    """mapInPandas audio decode — the audio twin of
    ``decode_image_meta`` (same Arrow batching, same passthrough
    contract, same header -> fake ladder).  ``duration_ms`` is
    integer math ((n_samples * 1000) // rate) so it ports to any
    engine exactly."""
    schema = AUDIO_DECODE_SCHEMA
    if passthrough:
        fields = dict(
            (f.name, f.dataType.simpleString()) for f in binary_df.schema.fields
        )
        schema += ", " + ", ".join(f"{c} {fields[c]}" for c in passthrough)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes) -> tuple[str, int, int, int, int, str]:
            if try_header:
                return audio_meta_ladder(payload)
            return (*_fake_audio_decode(payload), "fake")

        for pdf in batches:
            meta = [one(p) for p in pdf[payload_col]]
            out = {
                "doc_id": pdf[id_col].values,
                "n_bytes": [len(p) for p in pdf[payload_col]],
                "format": [m[0] for m in meta],
                "channels": [m[1] for m in meta],
                "sample_rate": [m[2] for m in meta],
                "bits_per_sample": [m[3] for m in meta],
                "n_samples": [m[4] for m in meta],
                "duration_ms": [(m[4] * 1000) // m[2] for m in meta],
                "decoder": [m[5] for m in meta],
                "content_hash": [
                    hashlib.md5(p).hexdigest() for p in pdf[payload_col]
                ],
            }
            for c in passthrough:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(_decode, schema)


def _wav_header_payload(i: int) -> bytes:
    """One id's REAL RIFF/WAVE header bytes (44 bytes, data chunk
    declared-but-absent) — shared by the standalone synthesizer and
    the round-14 fused header arm."""
    channels = 1 + i % 2
    rate = (8000, 16000, 44100)[i % 3]
    bits = 8 * (1 + i % 2)
    n_samples = 1000 + (i * 11) % 50000
    block = channels * (bits // 8)
    data_size = n_samples * block
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, channels, rate, rate * block, block, bits,
        )
        + b"data"
        + struct.pack("<I", data_size)
    )


def synthesize_wav_payloads(
    ids_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL RIFF/WAVE headers, one per input id — the
    audio fixture generator (twin of ``synthesize_image_payloads``).
    Geometry derives from the id with integer math the oracle
    recomputes; the data chunk is declared-but-absent (see
    ``parse_audio_header`` on ranged header reads), so every payload
    is exactly 44 bytes.  ``syn_ch`` = md5(uppercase-hex(payload)),
    the hex-domain content hash the VARCHAR-only DuckDB md5 can
    rebuild."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_wav_header_payload(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": payloads,
                    "syn_ch": [
                        hashlib.md5(p.hex().upper().encode()).hexdigest()
                        for p in payloads
                    ],
                }
            )

    return ids_df.select(id_col).mapInPandas(
        _build, f"{id_col} long, payload binary, syn_ch string"
    )


def audio_header_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry arm (round 9): REAL WAV header decode — synthesized
    RIFF/WAVE payloads through ``decode_audio_meta``; every row must
    come back decoder='header' with channels/rate/bits/samples parsed
    from the actual little-endian bytes."""
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    syn = synthesize_wav_payloads(ids)
    return decode_audio_meta(syn, passthrough=("syn_ch",)).select(
        "doc_id",
        "n_bytes",
        "format",
        "channels",
        "sample_rate",
        "bits_per_sample",
        "n_samples",
        "duration_ms",
        # the REAL per-row decoder tag: a payload that fell through to
        # the fake rung shows up as decoder='fake' and fails the hash
        # gate — the arm asserts header parsing, it doesn't filter to it
        "decoder",
        F.col("syn_ch").alias("content_hash"),
    )


# ---------------------------------------------------------------------------
# video modality (round 10): MP4 / ISO-BMFF box-walk header decode,
# stdlib-only — the video rung completing the modality ladder
# (image: PNG/JPEG/GIF markers; audio: RIFF chunk walk; video: the
# ISO 14496-12 box tree).  Movie timescale/duration from moov/mvhd,
# track count + per-track codec fourcc from trak/mdia/minf/stbl/stsd;
# everything decodes from DECLARED header structure, so ranged reads
# suffice at scale (mdat never needs to be present).
# ---------------------------------------------------------------------------

VIDEO_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, format string, major_brand string, "
    "timescale long, duration long, duration_ms long, n_tracks long, "
    "codecs string, decoder string, content_hash string"
)

#: ISO-BMFF pure-container boxes worth descending into for metadata.
#: mvex is the fragmented-MP4 (fMP4 / DASH) extension container: its
#: mehd child carries the WHOLE-MOVIE duration when mvhd's is 0 (the
#: fMP4 convention — per-fragment durations live in the moof boxes,
#: which a header read never fetches).
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"mvex"}

#: descent bound for the box walk (round-11 review fix: the old
#: RECURSIVE walk had no depth limit, so a ~16KB adversarial payload of
#: nested 'moov' containers raised RecursionError inside the Spark task
#: instead of falling to the fake-decode rung).  Real ISO-BMFF metadata
#: nests ~6 deep (moov/trak/mdia/minf/stbl/stsd); anything past 32 is
#: corrupt or adversarial and is simply not descended into.
_MP4_MAX_DEPTH = 32


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the box list in
    payload[start:end] — size==1 reads the 64-bit largesize, size==0
    means to-end-of-enclosing (ISO 14496-12 §4.2); a malformed size
    stops the walk (header decode must never loop or overrun)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", payload[i : i + 4])
        btype = payload[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", payload[i + 8 : i + 16])
            body = i + 16
        elif size == 0:
            size = end - i
        if size < 8 or i + size > end:
            return
        yield btype, body, i + size
        i += size


def parse_video_header(
    payload: bytes,
) -> tuple[str, str, int, int, int, str] | None:
    """REAL (stdlib-only) MP4 header decode: ('mp4', major_brand,
    timescale, duration, n_tracks, codecs) for ISO-BMFF payloads, None
    otherwise.  ``codecs`` joins each trak's first stsd sample-entry
    fourcc with '+', in file order.  Handles mvhd version 0 and 1
    (v1 widens the times to 64 bits, ISO 14496-12 §8.2.2).

    Fragmented MP4 (fMP4/DASH): an mvhd duration of 0 means "see the
    fragments"; the whole-movie duration then comes from moov/mvex/mehd
    (ISO 14496-12 §8.8.2, versions 0 and 1) — still a header-only
    read, the moof boxes themselves are never needed."""
    n = len(payload)
    if n < 16 or payload[4:8] != b"ftyp":
        return None
    brand = None
    timescale = duration = None
    mehd_duration = None
    codecs: list[str] = []
    n_tracks = 0

    # ITERATIVE DFS (round-11 review fix): an explicit stack of box
    # iterators preserves the recursive version's exact pre-order (so
    # `codecs` stays in file order) while bounding descent at
    # _MP4_MAX_DEPTH — nested-container bombs skip the descent instead
    # of raising RecursionError inside the task.
    stack = [_mp4_boxes(payload, 0, n)]
    while stack:
        nxt = next(stack[-1], None)
        if nxt is None:
            stack.pop()
            continue
        btype, b0, b1 = nxt
        if btype == b"ftyp" and b0 + 4 <= b1 and brand is None:
            brand = payload[b0 : b0 + 4].decode("ascii", "replace")
        elif btype == b"mvhd" and b0 + 4 <= b1:
            ver = payload[b0]
            # bounds cover the FULL reads below (review fix: a
            # 28-31-byte v1 body slipped the old b0+28 guard and
            # struct.unpack raised inside the task instead of the
            # ladder falling back to the fake decoder)
            if ver == 1 and b0 + 32 <= b1:
                (timescale,) = struct.unpack(">I", payload[b0 + 20 : b0 + 24])
                (duration,) = struct.unpack(">Q", payload[b0 + 24 : b0 + 32])
            elif ver == 0 and b0 + 20 <= b1:
                timescale, duration = struct.unpack(
                    ">II", payload[b0 + 12 : b0 + 20]
                )
        elif btype == b"trak":
            n_tracks += 1
            if len(stack) < _MP4_MAX_DEPTH:
                stack.append(_mp4_boxes(payload, b0, b1))
        elif btype == b"mehd" and b0 + 4 <= b1:
            ver = payload[b0]
            if ver == 1 and b0 + 12 <= b1:
                (mehd_duration,) = struct.unpack(">Q", payload[b0 + 4 : b0 + 12])
            elif ver == 0 and b0 + 8 <= b1:
                (mehd_duration,) = struct.unpack(">I", payload[b0 + 4 : b0 + 8])
        elif btype == b"stsd" and b0 + 16 <= b1:
            # verflags(4) entry_count(4) entry_size(4) fourcc(4)
            codecs.append(
                payload[b0 + 12 : b0 + 16].decode("ascii", "replace")
            )
        elif btype in _MP4_CONTAINERS:
            if len(stack) < _MP4_MAX_DEPTH:
                stack.append(_mp4_boxes(payload, b0, b1))
    if brand is None or timescale in (None, 0) or duration is None:
        return None
    if duration == 0 and mehd_duration is not None:
        duration = mehd_duration  # fMP4: whole-movie duration from mehd
    return "mp4", brand, timescale, duration, n_tracks, "+".join(codecs)


def parse_avi_header(
    payload: bytes,
) -> tuple[str, str, int, int, int, str] | None:
    """REAL (stdlib-only) RIFF/AVI header decode in the
    ``parse_video_header`` output shape: ('avi', 'AVI ', timescale,
    duration, n_tracks, codecs) — round 13, so the metadata ladder
    reads the container the MJPEG sample tier
    (:mod:`.videoembed`) decodes.  Duration is expressed in avih
    microseconds-per-frame units: timescale = 1e6 // usec_per_frame
    (frames per second, integer) and duration = dwTotalFrames, so
    duration_ms = frames * 1000 // fps downstream.  ``codecs`` joins
    each strh's fourcc handler in file order."""
    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    usec_pf = total = None
    handlers: list[str] = []

    def _chunks(start: int, end: int):
        i = start
        while i + 8 <= end:
            cid = payload[i : i + 4]
            (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
            body = i + 8
            if body + size > end:
                return
            yield cid, body, body + size
            i = body + size + (size % 2)

    stack = [_chunks(12, min(n, 8 + struct.unpack("<I", payload[4:8])[0]))]
    while stack:
        nxt = next(stack[-1], None)
        if nxt is None:
            stack.pop()
            continue
        cid, b0, b1 = nxt
        if cid == b"LIST" and b0 + 4 <= b1:
            # descend into header lists only — movi holds frame data
            if payload[b0 : b0 + 4] != b"movi" and len(stack) < _MP4_MAX_DEPTH:
                stack.append(_chunks(b0 + 4, b1))
        elif cid == b"avih" and b1 - b0 >= 20:
            usec_pf, _mbps, _pad, _flags, total = struct.unpack(
                "<IIIII", payload[b0 : b0 + 20]
            )
        elif cid == b"strh" and b1 - b0 >= 8:
            handlers.append(payload[b0 + 4 : b0 + 8].decode("ascii", "replace"))
    if usec_pf in (None, 0) or total is None:
        return None
    return (
        "avi", "AVI ", 1_000_000 // usec_pf, total,
        len(handlers), "+".join(handlers),
    )


def _fake_video_decode(payload: bytes) -> tuple[str, str, int, int, int, str]:
    """Deterministic fake video decode (md5-derived geometry) — the
    ladder's last rung for non-ISO-BMFF containers."""
    digest = hashlib.md5(payload).digest()
    fmt = ("mp4", "webm", "mkv")[digest[0] % 3]
    timescale = (600, 1000, 90000)[digest[1] % 3]
    duration = 1000 + int.from_bytes(digest[2:5], "big") % 1000000
    n_tracks = 1 + digest[5] % 2
    codecs = ("avc1", "avc1+mp4a")[n_tracks - 1]
    return fmt, "fake", timescale, duration, n_tracks, codecs


# ---------------------------------------------------------------------------
# shared per-kind metadata ladders (round 14 review fix: the fused
# header arm used to copy-paste the three decode ladders, and the
# animated-GIF rung already had to land in two places — one helper per
# kind is now the single source of truth for decode_*_meta AND the
# fused arm).
# ---------------------------------------------------------------------------


def make_image_codec():
    """The image ladder's fallback rung, import-tried once per batch:
    Pillow when importable, the deterministic fake otherwise."""
    try:
        import io

        from PIL import Image

        def codec(
            payload: bytes, digest: bytes | None = None
        ) -> tuple[str, int, int, str]:
            try:
                img = Image.open(io.BytesIO(payload))
                return (
                    (img.format or "?").lower(), img.width, img.height,
                    "pillow",
                )
            except Exception:
                fmt, w, h = _fake_decode(payload, digest)
                return fmt, w, h, "fake"
    except ImportError:
        def codec(
            payload: bytes, digest: bytes | None = None
        ) -> tuple[str, int, int, str]:
            fmt, w, h = _fake_decode(payload, digest)
            return fmt, w, h, "fake"

    return codec


def image_meta_ladder(
    payload: bytes, codec, try_header: bool = True,
    digest: bytes | None = None,
) -> tuple[str, int, int, str]:
    """(format, width, height, decoder): header parse -> codec
    (pillow/fake from :func:`make_image_codec`).  ``digest``: optional
    precomputed md5, forwarded to the fake rung."""
    if try_header:
        parsed = parse_image_header(payload)
        if parsed is not None:
            return (*parsed, "header")
    return codec(payload, digest)


def audio_meta_ladder(payload: bytes) -> tuple[str, int, int, int, int, str]:
    """(format, channels, rate, bits, n_samples, decoder): header
    parse (PCM + G.711 + IMA-ADPCM geometry) -> MP3 header (ID3v2
    skip + MPEG frame header + Xing/Info VBR frame count, round 15)
    -> fake.  Defensive rung boundary like video_meta_ladder: a
    malformed-payload parse failure falls to the next rung."""
    parsed = parse_audio_header(payload)
    if parsed is None:
        try:
            parsed = parse_mp3_header(payload)
        except (struct.error, ValueError, IndexError):
            parsed = None
    if parsed is not None:
        return (*parsed, "header")
    return (*_fake_audio_decode(payload), "fake")


def video_meta_ladder(
    payload: bytes,
) -> tuple[str, str, int, int, int, str, str]:
    """(format, brand, timescale, duration, n_tracks, codecs,
    decoder): ISO-BMFF -> AVI -> animated GIF -> fake.  Defensive
    rung boundary: ANY malformed-payload parse failure falls to the
    fake decoder — the ladder's "header decode must never crash a
    task" contract, enforced here and not just inside the parsers.
    Single-frame GIFs are images, not clips — they take the fake rung
    so the metadata ladder agrees with the sample tier's split."""
    from .gif import gif_clip_header

    try:
        parsed = parse_video_header(payload)
        if parsed is None:
            parsed = parse_avi_header(payload)
        if parsed is None:
            parsed = gif_clip_header(payload)
    except (struct.error, ValueError, RecursionError):
        parsed = None
    if parsed is not None:
        return (*parsed, "header")
    return (*_fake_video_decode(payload), "fake")


def decode_video_meta(
    binary_df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
    try_header: bool = True,
) -> DataFrame:
    """mapInPandas video decode — the video twin of
    ``decode_image_meta`` / ``decode_audio_meta`` (same Arrow batching,
    passthrough contract, header -> fake ladder).  ``duration_ms`` is
    integer math ((duration * 1000) // timescale)."""
    schema = VIDEO_DECODE_SCHEMA
    if passthrough:
        fields = dict(
            (f.name, f.dataType.simpleString()) for f in binary_df.schema.fields
        )
        schema += ", " + ", ".join(f"{c} {fields[c]}" for c in passthrough)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes):
            if try_header:
                return video_meta_ladder(payload)
            return (*_fake_video_decode(payload), "fake")

        for pdf in batches:
            meta = [one(p) for p in pdf[payload_col]]
            out = {
                "doc_id": pdf[id_col].values,
                "n_bytes": [len(p) for p in pdf[payload_col]],
                "format": [m[0] for m in meta],
                "major_brand": [m[1] for m in meta],
                "timescale": [m[2] for m in meta],
                "duration": [m[3] for m in meta],
                "duration_ms": [(m[3] * 1000) // m[2] for m in meta],
                "n_tracks": [m[4] for m in meta],
                "codecs": [m[5] for m in meta],
                "decoder": [m[6] for m in meta],
                "content_hash": [
                    hashlib.md5(p).hexdigest() for p in pdf[payload_col]
                ],
            }
            for c in passthrough:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(_decode, schema)


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4_trak(handler: bytes, codec: bytes) -> bytes:
    """Minimal-but-real trak subtree: mdia(hdlr + minf(stbl(stsd)))."""
    hdlr = _mp4_box(
        b"hdlr", b"\x00" * 4 + b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00"
    )
    stsd = _mp4_box(
        b"stsd",
        b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">I", 8) + codec,
    )
    minf = _mp4_box(b"minf", _mp4_box(b"stbl", stsd))
    return _mp4_box(b"trak", _mp4_box(b"mdia", hdlr + minf))


#: the two track subtrees are id-independent byte constants — built
#: once here, reused by the synthesizer AND (as hex) the DuckDB twin.
_TRAK_VIDEO = _mp4_trak(b"vide", b"avc1")
_TRAK_AUDIO = _mp4_trak(b"soun", b"mp4a")
_FTYP = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512))

#: unity matrix + rate/volume + reserved fields of an mvhd v0 body,
#: after the duration field up to next_track_id (ISO 14496-12 §8.2.2).
_MVHD_TAIL = (
    struct.pack(">I", 0x00010000)  # rate 1.0
    + struct.pack(">H", 0x0100)    # volume 1.0
    + b"\x00" * 10                 # reserved
    + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    + b"\x00" * 24                 # pre_defined
)


def _mp4_header_payload(i: int) -> bytes:
    """One id's REAL ISO-BMFF header bytes (ftyp + moov, mdat absent)
    — shared by the standalone synthesizer and the round-14 fused
    header arm."""
    timescale = (600, 1000, 90000)[i % 3]
    duration = 1000 + (i * 17) % 100000
    n_tracks = 1 + i % 2
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00" * 4          # version 0 + flags
        + b"\x00" * 8        # creation/modification time
        + struct.pack(">II", timescale, duration)
        + _MVHD_TAIL
        + struct.pack(">I", n_tracks + 1),  # next_track_id
    )
    traks = _TRAK_VIDEO + (_TRAK_AUDIO if n_tracks == 2 else b"")
    return _FTYP + _mp4_box(b"moov", mvhd + traks)


def synthesize_mp4_payloads(
    ids_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL ISO-BMFF payloads, one per input id — the
    video fixture generator (twin of ``synthesize_wav_payloads``).
    ftyp + moov(mvhd + 1-2 trak subtrees); timescale/duration derive
    from the id with integer math the oracle recomputes; mdat is
    absent (declared structure suffices — ranged header reads).
    ``syn_ch`` = md5(uppercase-hex(payload)), the hex-domain content
    hash the VARCHAR-only DuckDB md5 can rebuild."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_mp4_header_payload(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": payloads,
                    "syn_ch": [
                        hashlib.md5(p.hex().upper().encode()).hexdigest()
                        for p in payloads
                    ],
                }
            )

    return ids_df.select(id_col).mapInPandas(
        _build, f"{id_col} long, payload binary, syn_ch string"
    )


def video_header_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry arm (round 10): REAL MP4 box-walk decode — synthesized
    ISO-BMFF payloads through ``decode_video_meta``; every row must
    come back decoder='header' with brand/timescale/duration/tracks/
    codecs parsed from the actual big-endian boxes."""
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    syn = synthesize_mp4_payloads(ids)
    return decode_video_meta(syn, passthrough=("syn_ch",)).select(
        "doc_id",
        "n_bytes",
        "format",
        "major_brand",
        "timescale",
        "duration",
        "duration_ms",
        "n_tracks",
        "codecs",
        "decoder",
        F.col("syn_ch").alias("content_hash"),
    )


def _u32be_sql(expr: str) -> str:
    return f"lpad(upper(to_hex({expr})), 8, '0')"


#: DuckDB twin of ``video_header_query``: recomputes the id-derived
#: geometry, rebuilds the exact payload as an uppercase hex string
#: (the id-independent ftyp/trak subtrees ride as constants exported
#: from the SAME byte-builder the synthesizer uses) and md5s it —
#: pinning the decoded values AND the synthesized bytes, the
#: HEADER_DECODE_SQL scheme.
VIDEO_HEADER_SQL = f"""
WITH vdims AS (
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
                ELSE 90000 END AS timescale,
           1000 + (doc_id * 17) % 100000 AS duration,
           1 + doc_id % 2 AS n_tracks
    FROM documents)
SELECT doc_id,
       CAST({len(_FTYP)} + 8 + 108
            + n_tracks * {len(_TRAK_VIDEO)} AS BIGINT) AS n_bytes,
       'mp4' AS format,
       'isom' AS major_brand,
       CAST(timescale AS BIGINT) AS timescale,
       CAST(duration AS BIGINT) AS duration,
       CAST((duration * 1000) // timescale AS BIGINT) AS duration_ms,
       CAST(n_tracks AS BIGINT) AS n_tracks,
       CASE n_tracks WHEN 1 THEN 'avc1' ELSE 'avc1+mp4a' END AS codecs,
       'header' AS decoder,
       md5('{_FTYP.hex().upper()}'
           || {_u32be_sql(f"8 + 108 + n_tracks * {len(_TRAK_VIDEO)}")}
           || '6D6F6F76'
           || '0000006C6D766864' || '000000000000000000000000'
           || {_u32be_sql("timescale")} || {_u32be_sql("duration")}
           || '{_MVHD_TAIL.hex().upper()}'
           || {_u32be_sql("n_tracks + 1")}
           || '{_TRAK_VIDEO.hex().upper()}'
           || CASE n_tracks WHEN 2
                THEN '{_TRAK_AUDIO.hex().upper()}' ELSE '' END
       ) AS content_hash
FROM vdims"""


RESIZE_SCHEMA = "doc_id long, width long, height long, scale double"


def resize_image_meta(
    binary_df: DataFrame, max_side: int = 256,
    payload_col: str = "payload", id_col: str = "doc_id",
) -> DataFrame:
    """Resize stub: computes the post-resize geometry (aspect-preserving
    fit into max_side). With Pillow absent the source dims come from
    the deterministic fake decode; the batch plumbing (Arrow in/out,
    schema, scale factor) is the real part."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                _fmt, w, h = _fake_decode(payload)
                scale = min(max_side / w, max_side / h, 1.0)
                rows.append((doc_id, int(w * scale), int(h * scale), scale))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "scale"])

    return binary_df.mapInPandas(_resize, RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx long, frame_offset long"


def frame_sample(
    binary_df: DataFrame, n_frames: int = 4,
    payload_col: str = "payload", id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling stub for video payloads: emits n_frames evenly
    spaced byte offsets per payload (one output row per frame — the
    explode-shaped mapInPandas contract a real decoder would use)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(payload)
                for i in range(n_frames):
                    rows.append((doc_id, i, (i * n) // n_frames))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_offset"])

    return binary_df.mapInPandas(_frames, FRAMES_SCHEMA)


FEATURES_SCHEMA = "doc_id long, features array<float>"
FEATURE_DIM = 8


def feature_extract(
    binary_df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Feature-extraction stub: a deterministic FEATURE_DIM-float vector
    from the payload md5 (each pair of digest bytes -> [0,1)). Stands
    in for an embedding model; schema/batching match the real thing."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                digest = hashlib.md5(payload).digest()
                feats.append(
                    [int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65536.0
                     for i in range(FEATURE_DIM)]
                )
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "features": feats})

    return binary_df.mapInPandas(_features, FEATURES_SCHEMA)


def decode_stub_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: documents.text UTF-8 bytes stand in for media
    payloads; exercises the binary-column mapInPandas path end-to-end.

    Hash-checked against ``DECODE_STUB_SQL``: the fake decode is pure
    md5-byte arithmetic, so DuckDB mirrors it with hex substrings
    (``try_header=False``: PNG/JPEG signatures cannot occur in UTF-8
    text, but 'GIF87a' is pure ASCII — a document starting with it
    would header-parse and diverge from this twin; the Pillow branch —
    when Pillow even exists — always falls back to the same fake)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return decode_image_meta(docs, try_header=False)


def _hex_int(start: int, n: int) -> str:
    """DuckDB: digest bytes [start, start+n) of md5(text) as integer —
    same recipe as operators/sampling.py:_bucket_sql."""
    return (
        f"CAST(concat('0x', substr(md5(text), {2 * start + 1}, {2 * n})) AS BIGINT)"
    )


#: DuckDB twin of ``decode_stub_query``: _fake_decode's digest[0] % 3
#: format pick and digest[1:3]/digest[3:5] dimension math as hex
#: substring arithmetic; strlen() is DuckDB's byte length, matching
#: len(payload) of the UTF-8 encoding.
DECODE_STUB_SQL = f"""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CASE {_hex_int(0, 1)} % 3
            WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
       64 + {_hex_int(1, 2)} % 1984 AS width,
       64 + {_hex_int(3, 2)} % 1984 AS height,
       'fake' AS decoder,
       md5(text) AS content_hash
FROM documents"""


N_SAMPLE_FRAMES = 4

from .armconf import SAMPLE_ARM_MOD  # noqa: F401  (re-export: sizing knob)


def multimodal_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (round 6, widens the decode-only row): the FULL
    multimodal plumbing chain in one hash-checked row — decode ⋈
    resize ⋈ frame-sample (pivoted to per-frame offset columns) ⋈
    feature-extract (array<float> unpacked to scalar columns), every
    stage the real Arrow-batched ``mapInPandas`` operator over the
    binary payload column.  One wide row per document; all three
    joins are on doc_id (co-partitioned — one key, three map-side
    joinable streams at scale).

    Hash-checked against ``MULTIMODAL_PIPELINE_SQL``: with the
    deterministic fake decode, every derived column — resize geometry
    (double math in the same IEEE order), frame offsets (integer
    floor division), feature floats (hex-pair / 65536 routed through
    float32 exactly like the Arrow schema) — is portable arithmetic
    DuckDB reproduces bit-for-bit.
    """
    from ..checkpoint import materialize

    # ONE materialized payload relation feeds all four mapInPandas
    # chains (decode/resize/frames/features) — the diamond rule:
    # without it each chain re-scans the parquet and re-encodes the
    # text (4 scans measured; the payload column dominates the frame,
    # so the checkpoint costs what one scan costs)
    docs = materialize(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
        )
    )
    # text-bytes stand-in payloads: fake-decode only (see
    # decode_stub_query — an ASCII 'GIF87a' prefix would header-parse)
    decoded = decode_image_meta(docs, try_header=False)
    resized = resize_image_meta(docs).select(
        "doc_id",
        F.col("width").alias("r_width"),
        F.col("height").alias("r_height"),
        F.col("scale").alias("r_scale"),
    )
    frames = (
        frame_sample(docs, n_frames=N_SAMPLE_FRAMES)
        .groupBy("doc_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("frame_idx") == i, F.col("frame_offset"))
                ).alias(f"frame_off_{i}")
                for i in range(N_SAMPLE_FRAMES)
            ]
        )
    )
    feats = feature_extract(docs).select(
        "doc_id",
        *[
            F.col("features")[i].cast("double").alias(f"feat_{i}")
            for i in range(FEATURE_DIM)
        ],
    )
    return decoded.join(resized, "doc_id").join(frames, "doc_id").join(feats, "doc_id")


def multimodal_pipeline_fused_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``multimodal_pipeline_query``'s wide row from ONE mapInPandas
    stage (round 15, optimization guide §4: eliminate per-chain Python
    floors).  The four stage contracts (decode / resize / frame-pivot
    / feature-extract) are pure per-payload functions of the SAME
    payload bytes, so the doc_id-keyed joins of the separate form are
    an identity re-assembly — computing all four column groups in one
    Arrow pass yields the identical wide row while removing three
    Python chains, three broadcast builds, one pivot shuffle and the
    payload localCheckpoint (single consumer now reads the scan
    directly).  Row-equality to the separate form is pytest-pinned
    (tests/test_extensions.py), so the oracle twin
    (MULTIMODAL_PIPELINE_SQL) is untouched.

    The separate operators remain the composable API surface
    (decode_image_meta / resize_image_meta / frame_sample /
    feature_extract keep their own tests and callers); this fused form
    is the gate/bench plan.
    """
    max_side = 256  # resize_image_meta's default, pinned by the twin

    schema = (
        DECODE_SCHEMA
        + ", r_width long, r_height long, r_scale double, "
        + ", ".join(f"frame_off_{i} long" for i in range(N_SAMPLE_FRAMES))
        + ", "
        # float here, cast to double below — the separate form routes
        # features through an Arrow array<float>, so the fused row
        # must take the identical float32 rounding
        + ", ".join(f"feat_{i} float" for i in range(FEATURE_DIM))
    )
    cols = (
        ["doc_id", "n_bytes", "format", "width", "height", "decoder",
         "content_hash", "r_width", "r_height", "r_scale"]
        + [f"frame_off_{i}" for i in range(N_SAMPLE_FRAMES)]
        + [f"feat_{i}" for i in range(FEATURE_DIM)]
    )

    def _all(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        codec = make_image_codec()
        for pdf in batches:
            payloads = pdf["payload"].tolist()
            # per-row work that cannot vectorize: ONE md5 per payload
            # (round 16 — was three: content_hash + each fake rung)
            # and the byte-parsing decode ladder
            digests = [hashlib.md5(p).digest() for p in payloads]
            # decode columns: the same ladder as decode_image_meta
            # (try_header=False — text-bytes stand-ins, see
            # decode_stub_query)
            meta = [
                image_meta_ladder(p, codec, False, digest=d)
                for p, d in zip(payloads, digests)
            ]
            # everything below is pure arithmetic on (digest bytes,
            # payload length) — columnar numpy, not a Python row loop
            # (round 16, guide §4.2)
            n = np.fromiter(
                (len(p) for p in payloads), np.int64, count=len(payloads)
            )
            # resize columns: resize_image_meta reads the FAKE dims
            # regardless of the decode ladder — mirror that.  The
            # fake dims are digest-byte arithmetic, so they vectorize.
            dig = np.frombuffer(b"".join(digests), np.uint8).reshape(-1, 16)
            # features read even-offset byte pairs [2i:2i+2]; the fake
            # dims read the ODD-offset pairs [1:3] and [3:5]
            u16 = (dig[:, ::2].astype(np.int64) << 8) | dig[:, 1::2]
            fw = 64 + ((dig[:, 1].astype(np.int64) << 8) | dig[:, 2]) % 1984
            fh = 64 + ((dig[:, 3].astype(np.int64) << 8) | dig[:, 4]) % 1984
            scale = np.minimum(
                np.minimum(max_side / fw, max_side / fh), 1.0
            )
            out = {
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "format": [m[0] for m in meta],
                "width": [m[1] for m in meta],
                "height": [m[2] for m in meta],
                "decoder": [m[3] for m in meta],
                "content_hash": [d.hex() for d in digests],
                "r_width": (fw * scale).astype(np.int64),
                "r_height": (fh * scale).astype(np.int64),
                "r_scale": scale,
            }
            for i in range(N_SAMPLE_FRAMES):
                out[f"frame_off_{i}"] = (i * n) // N_SAMPLE_FRAMES
            for i in range(FEATURE_DIM):
                out[f"feat_{i}"] = u16[:, i] / 65536.0
            yield pd.DataFrame(out, columns=cols)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    fused = docs.mapInPandas(_all, schema)
    return fused.select(
        *cols[: len(cols) - FEATURE_DIM],
        *[
            F.col(f"feat_{i}").cast("double").alias(f"feat_{i}")
            for i in range(FEATURE_DIM)
        ],
    )


def _hex_from_hash(start: int, n: int) -> str:
    """Digest bytes [start, start+n) of the decode CTE's content_hash
    (= md5(text)) as integer — same recipe as ``_hex_int`` without
    recomputing the md5."""
    return (
        f"CAST(concat('0x', substr(content_hash, {2 * start + 1}, {2 * n})) "
        "AS BIGINT)"
    )


def _image_header_payload(i: int) -> bytes:
    """One id's REAL image-header bytes (PNG / JPEG / GIF by id % 3)
    — shared by the standalone synthesizer and the round-14 fused
    header arm."""
    w = 16 + (i * 7) % 2000
    h = 16 + (i * 13) % 2000
    k = i % 3
    if k == 0:
        return (
            _PNG_SIG
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">II", w, h)
            + bytes.fromhex("0806000000")  # depth/color/etc
            + b"\x00\x00\x00\x00"  # CRC (unchecked)
        )
    if k == 1:
        return (
            bytes.fromhex("FFD8FFE000104A46494600010100004800480000")
            + bytes.fromhex("FFC0001108")
            + struct.pack(">HH", h, w)
            + bytes.fromhex("03012200021101031101")
        )
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def synthesize_image_payloads(
    ids_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL-format image payloads, one per input id:
    valid PNG / JPEG / GIF headers (format by ``id % 3``) with pixel
    dimensions derived from the id — the fixture generator for the
    header-decode gate arm.  The JPEG walks through an APP0 (JFIF)
    segment before SOF0, so parsing it exercises the marker walk, not
    just a fixed offset.

    Output: (id, payload, syn_ch) where ``syn_ch`` is
    md5(uppercase-hex(payload)) — the hex-domain content hash the
    DuckDB twin can recompute (DuckDB's md5 is VARCHAR-only, so the
    oracle checks the digest of the hex encoding, which pins the exact
    bytes just as hard)."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_image_header_payload(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": payloads,
                    "syn_ch": [
                        hashlib.md5(p.hex().upper().encode()).hexdigest()
                        for p in payloads
                    ],
                }
            )

    return ids_df.select(id_col).mapInPandas(
        _build, f"{id_col} long, payload binary, syn_ch string"
    )


def header_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry arm (round 9): REAL header decode — synthesized valid
    PNG/JPEG/GIF payloads (one per document id) through the SAME
    ``decode_image_meta`` operator; every row must come back with
    decoder='header' and the format/dimensions parsed from the actual
    bytes.  ``syn_ch`` rides the decode via passthrough and replaces
    the raw-byte md5 as content_hash (see synthesize_image_payloads on
    why the oracle hashes the hex encoding)."""
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    syn = synthesize_image_payloads(ids)
    return decode_image_meta(syn, passthrough=("syn_ch",)).select(
        "doc_id",
        "n_bytes",
        "format",
        "width",
        "height",
        "decoder",
        F.col("syn_ch").alias("content_hash"),
    )


_W8 = "lpad(upper(to_hex(width)), 8, '0')"
_H8 = "lpad(upper(to_hex(height)), 8, '0')"
_W4 = "lpad(upper(to_hex(width)), 4, '0')"
_H4 = "lpad(upper(to_hex(height)), 4, '0')"
#: GIF dimensions are little-endian u16: swap the two bytes of the
#: big-endian 4-hex-digit form.
_W4LE = f"substr({_W4}, 3, 2) || substr({_W4}, 1, 2)"
_H4LE = f"substr({_H4}, 3, 2) || substr({_H4}, 1, 2)"

#: DuckDB twin of ``header_decode_query``: rebuilds the identical
#: payload HEX STRING per format and md5s it (VARCHAR md5 — the blob
#: never needs to exist oracle-side), and recomputes the dimension
#: arithmetic the synthesizer embedded in the real headers.
HEADER_DECODE_SQL = f"""
WITH dims AS (
    SELECT doc_id,
           16 + (doc_id * 7) % 2000 AS width,
           16 + (doc_id * 13) % 2000 AS height,
           doc_id % 3 AS k
    FROM documents)
SELECT doc_id,
       CAST(CASE k WHEN 0 THEN 33 WHEN 1 THEN 39 ELSE 13 END AS BIGINT)
           AS n_bytes,
       CASE k WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
       width, height,
       'header' AS decoder,
       md5(CASE k
           WHEN 0 THEN '89504E470D0A1A0A0000000D49484452' || {_W8} || {_H8}
                       || '080600000000000000'
           WHEN 1 THEN 'FFD8FFE000104A46494600010100004800480000FFC0001108'
                       || {_H4} || {_W4} || '03012200021101031101'
           ELSE '474946383961' || {_W4LE} || {_H4LE} || '000000'
       END) AS content_hash
FROM dims"""


def _u16le_sql(expr: str) -> str:
    """Uppercase hex of ``expr`` as a little-endian u16 (2 bytes
    swapped) — the audio twin's byte-builder."""
    h = f"lpad(upper(to_hex({expr})), 4, '0')"
    return f"substr({h}, 3, 2) || substr({h}, 1, 2)"


def _u32le_sql(expr: str) -> str:
    """Uppercase hex of ``expr`` as a little-endian u32."""
    h = f"lpad(upper(to_hex({expr})), 8, '0')"
    return (
        f"substr({h}, 7, 2) || substr({h}, 5, 2) || "
        f"substr({h}, 3, 2) || substr({h}, 1, 2)"
    )


#: DuckDB twin of ``audio_header_query``: recomputes the id-derived
#: geometry, rebuilds the exact 44-byte RIFF/WAVE header as an
#: uppercase hex string (little-endian fields via byte swaps) and
#: md5s it — pinning both the decoded values AND the synthesized
#: bytes, same scheme as HEADER_DECODE_SQL.
AUDIO_HEADER_SQL = f"""
WITH adims AS (
    SELECT doc_id,
           1 + doc_id % 2 AS channels,
           CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                ELSE 44100 END AS sample_rate,
           8 * (1 + doc_id % 2) AS bits_per_sample,
           1000 + (doc_id * 11) % 50000 AS n_samples
    FROM documents),
ameta AS (
    SELECT *,
           channels * (bits_per_sample // 8) AS block,
           n_samples * channels * (bits_per_sample // 8) AS data_size
    FROM adims)
SELECT doc_id,
       CAST(44 AS BIGINT) AS n_bytes,
       'wav' AS format,
       CAST(channels AS BIGINT) AS channels,
       CAST(sample_rate AS BIGINT) AS sample_rate,
       CAST(bits_per_sample AS BIGINT) AS bits_per_sample,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST((n_samples * 1000) // sample_rate AS BIGINT) AS duration_ms,
       'header' AS decoder,
       md5('52494646' || {_u32le_sql("36 + data_size")} || '57415645'
           || '666D7420' || '10000000' || '0100'
           || {_u16le_sql("channels")} || {_u32le_sql("sample_rate")}
           || {_u32le_sql("sample_rate * block")} || {_u16le_sql("block")}
           || {_u16le_sql("bits_per_sample")}
           || '64617461' || {_u32le_sql("data_size")}) AS content_hash
FROM ameta"""


_RESIZE_SCALE_SQL = "LEAST(256.0 / width, 256.0 / height, 1.0)"

#: DuckDB twin of ``multimodal_pipeline_query``.  Python's
#: ``int(w * scale)`` truncates toward zero == FLOOR for the always-
#: positive dims; ``(i * n) // n_frames`` is integer floor division in
#: both engines; each feature is a float32-rounded hex pair, widened
#: back to double exactly like the Arrow array<float> schema.
MULTIMODAL_PIPELINE_SQL = f"""
WITH dec AS ({DECODE_STUB_SQL})
SELECT doc_id, n_bytes, format, width, height, decoder, content_hash,
       CAST(FLOOR(width * {_RESIZE_SCALE_SQL}) AS BIGINT) AS r_width,
       CAST(FLOOR(height * {_RESIZE_SCALE_SQL}) AS BIGINT) AS r_height,
       {_RESIZE_SCALE_SQL} AS r_scale,
       {", ".join(f"({i} * n_bytes) // {N_SAMPLE_FRAMES} AS frame_off_{i}" for i in range(N_SAMPLE_FRAMES))},
       {", ".join(f"CAST(CAST({_hex_from_hash(2 * i, 2)} / 65536.0 AS REAL) AS DOUBLE) AS feat_{i}" for i in range(FEATURE_DIM))}
FROM dec"""


# ---------------------------------------------------------------------------
# fused header gate arm (round 14, r13 verdict task 1): the three
# header-decode arms (image / audio / video) certified through ONE
# synth mapInPandas + ONE decode mapInPandas.  Measured at sf0.1: each
# separate arm chain cost ~0.7-0.9 s of FIXED Python-worker/stage
# floors while the per-payload header parse is microseconds — fusing
# the chains, not shrinking the corpora, is the lever.  Output rows
# are identical to the three separate arms (method from the
# synthesized kind; the per-kind decode ladders replicated exactly),
# so the oracle twins (HEADER_DECODE_SQL / AUDIO_HEADER_SQL /
# VIDEO_HEADER_SQL) are unchanged.
# ---------------------------------------------------------------------------

#: fused superset schema: the union-by-name shape of the three header
#: arms (each kind fills its own columns, NULLs elsewhere).
_FUSED_HEADER_COLS = (
    "method", "doc_id", "n_bytes", "format", "width", "height",
    "channels", "sample_rate", "bits_per_sample", "n_samples",
    "duration_ms", "major_brand", "timescale", "duration", "n_tracks",
    "codecs", "decoder", "content_hash",
)

_FUSED_HEADER_SCHEMA = (
    "method string, doc_id long, n_bytes long, format string, "
    "width long, height long, channels long, sample_rate long, "
    "bits_per_sample long, n_samples long, duration_ms long, "
    "major_brand string, timescale long, duration long, "
    "n_tracks long, codecs string, decoder string, content_hash string"
)


def synthesize_header_payloads(
    ids_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(kind, id, payload, syn_ch): per id, the image, audio and video
    header fixtures from the three arms' shared byte-builders — one
    Arrow stage for all three."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds: list[str] = []
            out_ids: list[int] = []
            payloads: list[bytes] = []
            for i in pdf[id_col]:
                i = int(i)
                for kind, p in (
                    ("image", _image_header_payload(i)),
                    ("audio", _wav_header_payload(i)),
                    ("video", _mp4_header_payload(i)),
                ):
                    kinds.append(kind)
                    out_ids.append(i)
                    payloads.append(p)
            yield pd.DataFrame(
                {
                    "kind": kinds,
                    id_col: out_ids,
                    "payload": payloads,
                    "syn_ch": [
                        hashlib.md5(p.hex().upper().encode()).hexdigest()
                        for p in payloads
                    ],
                }
            )

    return ids_df.select(id_col).mapInPandas(
        _build, f"kind string, {id_col} long, payload binary, syn_ch string"
    )


def fused_header_arms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused registry arm: one synth stage -> one decode stage
    dispatching per kind to the SAME parse ladders the standalone
    operators run (parse_image_header -> pillow -> fake;
    parse_audio_header -> fake; parse_video_header -> parse_avi_header
    -> fake).  Every row must come back decoder='header' with the
    geometry parsed from the actual bytes — the same gate the three
    separate arms enforced."""
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    syn = synthesize_header_payloads(ids)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the SAME per-kind ladders the standalone decode_*_meta
        # operators run (review fix: the dispatcher used to copy-paste
        # them, and a new rung had to land in two places)
        img_codec = make_image_codec()

        def one(kind: str, payload: bytes) -> dict:
            row: dict = dict.fromkeys(_FUSED_HEADER_COLS)
            if kind == "image":
                fmt, w, h, dec = image_meta_ladder(payload, img_codec)
                row.update(
                    method="header_decode", format=fmt,
                    width=w, height=h, decoder=dec,
                )
            elif kind == "audio":
                fmt, ch, rate, bits, ns, dec = audio_meta_ladder(payload)
                row.update(
                    method="audio_header", format=fmt, channels=ch,
                    sample_rate=rate, bits_per_sample=bits, n_samples=ns,
                    duration_ms=(ns * 1000) // rate, decoder=dec,
                )
            else:
                fmt, brand, ts, dur, nt, codecs, dec = video_meta_ladder(
                    payload
                )
                row.update(
                    method="video_header", format=fmt, major_brand=brand,
                    timescale=ts, duration=dur,
                    duration_ms=(dur * 1000) // ts,
                    n_tracks=nt, codecs=codecs, decoder=dec,
                )
            return row

        for pdf in batches:
            rows = [
                one(k, p) for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            for r, i, p, ch in zip(
                rows, pdf["doc_id"], pdf["payload"], pdf["syn_ch"]
            ):
                r["doc_id"] = int(i)
                r["n_bytes"] = len(p)
                r["content_hash"] = ch
            yield pd.DataFrame(
                {c: [r[c] for r in rows] for c in _FUSED_HEADER_COLS}
            )

    return syn.mapInPandas(_decode, _FUSED_HEADER_SCHEMA)


def multimodal_both_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (round 9, widens the former stub-only row): the
    stub pipeline arm PLUS the real header-decode arm, method-tagged —
    the gate now certifies actual PNG/JPEG/GIF byte parsing alongside
    the Arrow plumbing chain.  The header arm fills only the decode
    columns; resize/frame/feature columns are NULL there
    (unionByName allowMissingColumns)."""
    # round 15 (optimization): the stub arm rides the FUSED one-stage
    # form — same wide row (pytest-pinned row-equal to the separate
    # decode ⋈ resize ⋈ frames ⋈ features plan), minus three Python
    # chains, three broadcast builds, the pivot shuffle and the
    # payload localCheckpoint.  Oracle twin unchanged.
    stub = multimodal_pipeline_fused_query(spark, sf_dir).withColumn(
        "method", F.lit("stub_pipeline")
    )
    # round 14: the three header arms (image/audio/video) ride ONE
    # fused synth+decode chain — same rows, same oracle twins, one
    # third the Python-stage floors (fused_header_arms_query)
    headers = fused_header_arms_query(spark, sf_dir)
    # round 11: the perceptual-hash arm — synthesized REAL full PNGs
    # (IDAT + CRCs) through the stdlib pixel decoder into dHash/aHash
    # band ints; the oracle re-derives the embedded pixel formula, so
    # the whole real decode->downsample->hash path is hash-checked
    # round 13 added the baseline-JPEG and GIF pixel rungs beside it;
    # round 14 fuses all three pixel arms into ONE synth stage + ONE
    # hash stage (pixel_arms_query — per-chain fixed floors, not codec
    # CPU, dominated the old three-chain shape); rows and oracle twins
    # are unchanged
    from .phash import pixel_arms_query

    pixels = pixel_arms_query(spark, sf_dir)
    # round 12: the audio SAMPLE tier — synthesized real PCM WAVs
    # (data chunk present) through the stdlib decoder into envelope
    # features; the oracle re-derives the embedded sample formula, so
    # real decode->mixdown->window->center is hash-checked, including
    # the planted gain twins' exact-2x feature relation
    from .audioembed import audio_embed_query

    audio_pcm = audio_embed_query(spark, sf_dir).withColumn(
        "method", F.lit("audio_embed")
    )
    # round 13: the video SAMPLE tier — synthesized real MJPEG AVIs
    # (every frame a real quality-50 baseline JPEG) through the RIFF
    # demux + frame decode + sum-pooled box features; the oracle
    # re-derives the frame formula, and the planted brightness twins'
    # pooled stats equal their base's exactly (centering identity)
    from .videoembed import video_embed_query

    video_pcm = video_embed_query(spark, sf_dir).withColumn(
        "method", F.lit("video_embed")
    )
    return (
        stub.unionByName(headers, allowMissingColumns=True)
        .unionByName(pixels, allowMissingColumns=True)
        .unionByName(audio_pcm, allowMissingColumns=True)
        .unionByName(video_pcm, allowMissingColumns=True)
    )


def _multimodal_both_sql() -> str:
    from .audioembed import AUDIO_EMBED_SQL
    from .phash import GIF_PIXELS_SQL, JPEG_PIXELS_SQL, PHASH_SQL
    from .videoembed import VIDEO_EMBED_SQL

    return f"""
SELECT 'stub_pipeline' AS method, * FROM ({MULTIMODAL_PIPELINE_SQL})
UNION ALL BY NAME
SELECT 'header_decode' AS method, * FROM ({HEADER_DECODE_SQL})
UNION ALL BY NAME
SELECT 'audio_header' AS method, * FROM ({AUDIO_HEADER_SQL})
UNION ALL BY NAME
SELECT 'video_header' AS method, * FROM ({VIDEO_HEADER_SQL})
UNION ALL BY NAME
SELECT 'phash' AS method, * FROM ({PHASH_SQL})
UNION ALL BY NAME
SELECT 'jpeg' AS method, * FROM ({JPEG_PIXELS_SQL})
UNION ALL BY NAME
SELECT 'gif' AS method, * FROM ({GIF_PIXELS_SQL})
UNION ALL BY NAME
SELECT 'audio_embed' AS method, * FROM ({AUDIO_EMBED_SQL})
UNION ALL BY NAME
SELECT 'video_embed' AS method, * FROM ({VIDEO_EMBED_SQL})"""


MULTIMODAL_BOTH_SQL = _multimodal_both_sql()
