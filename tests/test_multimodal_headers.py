"""Real image-header decode (round 9): PNG IHDR / JPEG SOFn marker
walk / GIF logical-screen-descriptor parsing from actual encoded
bytes — the decoder ladder's first rung (multimodal/binary.py)."""

from __future__ import annotations

import base64

from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
    decode_image_meta,
    parse_image_header,
    synthesize_image_payloads,
)

# a real 1x1 PNG (RGBA), produced by a standard encoder
PNG_1x1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
    "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)
# a real 1x1 transparent GIF89a (the classic tracking pixel)
GIF_1x1 = base64.b64decode(
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


def _jpeg(width: int, height: int, sof_marker: int = 0xC0,
          fill_bytes: bytes = b"") -> bytes:
    """Spec-correct JPEG prefix: SOI, APP0 (JFIF), COM, DQT, then SOFn
    with the given dimensions, then SOS — the dimension parse must
    walk the variable-length segments to find the frame header."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 72, 72) + b"\x00\x00"
    comment = b"created by hand"
    com = b"\xff\xfe" + struct.pack(">H", 2 + len(comment)) + comment
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof = bytes([0xFF, sof_marker]) + struct.pack(">H", 17) + b"\x08" \
        + struct.pack(">HH", height, width) \
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    sos = b"\xff\xda" + struct.pack(">H", 12) \
        + b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00"
    return b"\xff\xd8" + fill_bytes + app0 + com + dqt + sof + sos


def test_png_real_fixture():
    assert parse_image_header(PNG_1x1) == ("png", 1, 1)


def test_gif_real_fixture():
    assert parse_image_header(GIF_1x1) == ("gif", 1, 1)


def test_jpeg_baseline_and_progressive():
    assert parse_image_header(_jpeg(640, 480)) == ("jpeg", 640, 480)
    # progressive (SOF2) carries dimensions the same way
    assert parse_image_header(_jpeg(5, 7, sof_marker=0xC2)) == ("jpeg", 5, 7)


def test_jpeg_fill_bytes_and_standalone_markers():
    # 0xFF fill bytes before a marker (T.81 B.1.1.2) must be skipped
    assert parse_image_header(_jpeg(31, 63, fill_bytes=b"\xff\xff")) \
        == ("jpeg", 31, 63)


def test_non_images_return_none():
    assert parse_image_header(b"plain text document") is None
    assert parse_image_header(b"") is None
    assert parse_image_header(PNG_1x1[:10]) is None  # truncated
    # JPEG with SOS before any SOFn: dimensions unavailable
    import struct

    no_sof = b"\xff\xd8\xff\xda" + struct.pack(">H", 4) + b"\x00\x00"
    assert parse_image_header(no_sof) is None
    # DHT (0xC4) is in the 0xC0-0xCF range but is NOT a frame header
    dht_only = b"\xff\xd8\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00\xff\xd9"
    assert parse_image_header(dht_only) is None


def test_decode_operator_prefers_header_over_fake(spark):
    df = spark.createDataFrame(
        [(1, bytearray(PNG_1x1)), (2, bytearray(GIF_1x1)),
         (3, bytearray(_jpeg(320, 200))), (4, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_image_meta(df).collect()}
    assert (rows[1].format, rows[1].width, rows[1].height, rows[1].decoder) \
        == ("png", 1, 1, "header")
    assert (rows[2].format, rows[2].width, rows[2].height, rows[2].decoder) \
        == ("gif", 1, 1, "header")
    assert (rows[3].format, rows[3].width, rows[3].height, rows[3].decoder) \
        == ("jpeg", 320, 200, "header")
    assert rows[4].decoder == "fake"  # ladder falls through


def test_synthesized_payloads_decode_as_headers(spark):
    ids = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    syn = synthesize_image_payloads(ids)
    out = decode_image_meta(syn, passthrough=("syn_ch",)).collect()
    assert len(out) == 30
    for r in out:
        assert r.decoder == "header"
        assert r.format == ("png", "jpeg", "gif")[r.doc_id % 3]
        assert r.width == 16 + (r.doc_id * 7) % 2000
        assert r.height == 16 + (r.doc_id * 13) % 2000
        assert len(r.syn_ch) == 32  # passthrough column survives


def test_decode_passthrough_keeps_metadata(spark):
    df = spark.createDataFrame(
        [(1, bytearray(PNG_1x1), "s3://bucket/a.png")],
        "doc_id long, payload binary, uri string",
    )
    out = decode_image_meta(df, passthrough=("uri",)).collect()[0]
    assert out.uri == "s3://bucket/a.png" and out.format == "png"


def test_text_gif_prefix_stays_fake_in_stub_arm(spark):
    """Review regression (round 9): 'GIF87a' is pure ASCII, so a
    DOCUMENT whose text starts with it would header-parse — the stub
    arm (try_header=False) must keep the fake decode its oracle twin
    models, while the default ladder does parse the same bytes."""
    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        decode_image_meta,
    )

    docs = spark.createDataFrame(
        [(1, "GIF87a" + "\x10\x00\x20\x00" + "padding so len >= 10")],
        "doc_id long, text string",
    ).select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    stub = decode_image_meta(docs, try_header=False).collect()[0]
    assert stub["decoder"] == "fake"

    real = decode_image_meta(docs).collect()[0]
    assert real["decoder"] == "header" and real["format"] == "gif"
    assert (real["width"], real["height"]) == (0x10, 0x20)


# ---------------------------------------------------------------------------
# audio (WAV/RIFF) header decode — round 9
# ---------------------------------------------------------------------------


def _real_wav(channels: int, rate: int, n_samples: int) -> bytes:
    """A complete WAV produced by the stdlib encoder (16-bit PCM) —
    the parser must agree with the writer on every header field."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x01" * channels * n_samples)
    return buf.getvalue()


def test_wav_real_stdlib_fixture():
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_audio_header,
    )

    assert parse_audio_header(_real_wav(1, 8000, 1234)) \
        == ("wav", 1, 8000, 16, 1234)
    assert parse_audio_header(_real_wav(2, 44100, 500)) \
        == ("wav", 2, 44100, 16, 500)


def test_wav_header_only_declared_data():
    """The data chunk's declared size suffices — no data bytes needed
    (ranged header reads at scale)."""
    import struct

    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_audio_header,
    )

    p = (
        b"RIFF" + struct.pack("<I", 36 + 4000) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
        + b"data" + struct.pack("<I", 4000)
    )
    assert parse_audio_header(p) == ("wav", 2, 16000, 16, 1000)


def test_wav_chunk_walk_skips_odd_sized_chunks():
    """RIFF chunks are word-aligned: an odd-sized LIST chunk before
    fmt must be skipped with its pad byte."""
    import struct

    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_audio_header,
    )

    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    p = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE" + lst
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 800)
    )
    assert parse_audio_header(p) == ("wav", 1, 8000, 8, 800)


def test_non_wav_returns_none():
    import struct

    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_audio_header,
    )

    assert parse_audio_header(b"plain text") is None
    assert parse_audio_header(b"") is None
    assert parse_audio_header(PNG_1x1) is None
    # non-PCM format tag (3 = IEEE float) needs a codec: fall through
    p = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        + b"data" + struct.pack("<I", 0)
    )
    assert parse_audio_header(p) is None


def test_audio_decode_operator_ladder(spark):
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        decode_audio_meta,
    )

    df = spark.createDataFrame(
        [(1, bytearray(_real_wav(2, 22050, 2205))),
         (2, bytearray(b"definitely not audio"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_audio_meta(df).collect()}
    r1 = rows[1]
    assert (r1.format, r1.channels, r1.sample_rate, r1.bits_per_sample,
            r1.n_samples, r1.decoder) == ("wav", 2, 22050, 16, 2205, "header")
    assert r1.duration_ms == 100  # 2205 samples at 22050 Hz
    assert rows[2].decoder == "fake"


def test_synthesized_wavs_decode_as_headers(spark):
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        decode_audio_meta,
        synthesize_wav_payloads,
    )

    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = decode_audio_meta(
        synthesize_wav_payloads(ids), passthrough=("syn_ch",)
    ).collect()
    assert len(out) == 24
    for r in out:
        assert r.decoder == "header" and r.format == "wav"
        assert r.channels == 1 + r.doc_id % 2
        assert r.sample_rate == (8000, 16000, 44100)[r.doc_id % 3]
        assert r.bits_per_sample == 8 * (1 + r.doc_id % 2)
        assert r.n_samples == 1000 + (r.doc_id * 11) % 50000
        assert r.n_bytes == 44


# ---------------------------------------------------------------------------
# round 10: MP4 / ISO-BMFF box-walk video headers
# ---------------------------------------------------------------------------


def _mp4(timescale=1000, duration=5000, tracks=("vide",), ver=0,
         largesize_moov=False):
    """Hand-rolled minimal MP4 exercising specific box-walk branches."""
    import struct

    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        _FTYP,
        _MVHD_TAIL,
        _mp4_box,
        _mp4_trak,
    )

    if ver == 1:
        body = (
            b"\x01" + b"\x00" * 3 + b"\x00" * 16
            + struct.pack(">I", timescale) + struct.pack(">Q", duration)
            + _MVHD_TAIL + struct.pack(">I", len(tracks) + 1)
        )
    else:
        body = (
            b"\x00" * 4 + b"\x00" * 8
            + struct.pack(">II", timescale, duration)
            + _MVHD_TAIL + struct.pack(">I", len(tracks) + 1)
        )
    mvhd = _mp4_box(b"mvhd", body)
    traks = b"".join(
        _mp4_trak(h.encode(), b"avc1" if h == "vide" else b"mp4a")
        for h in tracks
    )
    moov_body = mvhd + traks
    if largesize_moov:
        moov = (
            struct.pack(">I", 1) + b"moov"
            + struct.pack(">Q", 16 + len(moov_body)) + moov_body
        )
    else:
        moov = _mp4_box(b"moov", moov_body)
    return _FTYP + moov


def test_mp4_v0_and_v1_mvhd():
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_video_header,
    )

    got = parse_video_header(_mp4(90000, 123456, ("vide", "soun")))
    assert got == ("mp4", "isom", 90000, 123456, 2, "avc1+mp4a")
    # version-1 mvhd: 64-bit times, timescale/duration at wider offsets
    got = parse_video_header(_mp4(600, 2**33, ("vide",), ver=1))
    assert got == ("mp4", "isom", 600, 2**33, 1, "avc1")


def test_mp4_largesize_box_and_malformed():
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_video_header,
    )

    got = parse_video_header(_mp4(1000, 99, ("soun",), largesize_moov=True))
    assert got == ("mp4", "isom", 1000, 99, 1, "mp4a")
    # non-MP4 payloads return None
    assert parse_video_header(b"not a video at all") is None
    assert parse_video_header(b"") is None
    # truncated mid-moov: the walk stops instead of overrunning; the
    # mvhd never parsed -> None
    p = _mp4()
    assert parse_video_header(p[:20]) is None
    # a box whose declared size overruns the payload stops the walk
    import struct
    bad = p[:16] + struct.pack(">I", 10**6) + b"moov" + p[24:]
    assert parse_video_header(bad) is None
    # review regression: a SHORT v1 mvhd body (28-31 bytes — enough for
    # the old guard, not for the 64-bit duration read) must return
    # None, never raise mid-task
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        _FTYP,
        _mp4_box,
    )

    short_v1 = _FTYP + _mp4_box(
        b"moov", _mp4_box(b"mvhd", b"\x01" + b"\x00" * 27)
    )
    assert parse_video_header(short_v1) is None


def test_video_decode_operator_ladder(spark):
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        decode_video_meta,
    )

    df = spark.createDataFrame(
        [(1, bytearray(_mp4(1000, 2500, ("vide", "soun")))),
         (2, bytearray(b"definitely not a video"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_video_meta(df).collect()}
    r1 = rows[1]
    assert (r1.format, r1.major_brand, r1.timescale, r1.duration,
            r1.n_tracks, r1.codecs, r1.decoder) == (
        "mp4", "isom", 1000, 2500, 2, "avc1+mp4a", "header")
    assert r1.duration_ms == 2500
    assert rows[2].decoder == "fake"


def test_synthesized_mp4s_decode_as_headers(spark):
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        decode_video_meta,
        synthesize_mp4_payloads,
    )

    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = decode_video_meta(
        synthesize_mp4_payloads(ids), passthrough=("syn_ch",)
    ).collect()
    assert len(out) == 24
    for r in out:
        assert r.decoder == "header" and r.format == "mp4"
        assert r.major_brand == "isom"
        assert r.timescale == (600, 1000, 90000)[r.doc_id % 3]
        assert r.duration == 1000 + (r.doc_id * 17) % 100000
        assert r.n_tracks == 1 + r.doc_id % 2
        assert r.codecs == ("avc1", "avc1+mp4a")[r.doc_id % 2]


def test_mp4_fragmented_mehd_duration():
    """fMP4/DASH: mvhd duration 0 + moov/mvex/mehd carrying the
    whole-movie duration — header-only read, no moof needed (versions
    0 and 1); without an mehd, a 0 duration stays 0 (live stream)."""
    import struct

    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        _FTYP,
        _MVHD_TAIL,
        _mp4_box,
        _mp4_trak,
        parse_video_header,
    )

    def frag(mehd_body: bytes | None, tracks=("vide",)):
        mvhd = _mp4_box(
            b"mvhd",
            b"\x00" * 4 + b"\x00" * 8
            + struct.pack(">II", 1000, 0)  # duration 0: see fragments
            + _MVHD_TAIL + struct.pack(">I", len(tracks) + 1),
        )
        traks = b"".join(_mp4_trak(h.encode(), b"avc1") for h in tracks)
        mvex = (
            _mp4_box(b"mvex", _mp4_box(b"mehd", mehd_body))
            if mehd_body is not None else b""
        )
        return _FTYP + _mp4_box(b"moov", mvhd + mvex + traks)

    # mehd version 0 (u32 duration)
    got = parse_video_header(frag(b"\x00" * 4 + struct.pack(">I", 77000)))
    assert got == ("mp4", "isom", 1000, 77000, 1, "avc1")
    # mehd version 1 (u64 duration)
    got = parse_video_header(
        frag(b"\x01" + b"\x00" * 3 + struct.pack(">Q", 2**34))
    )
    assert got == ("mp4", "isom", 1000, 2**34, 1, "avc1")
    # no mehd: duration stays 0 (live/indeterminate), still parsed
    got = parse_video_header(frag(None))
    assert got == ("mp4", "isom", 1000, 0, 1, "avc1")
    # a truncated mehd body is ignored, never a crash
    got = parse_video_header(frag(b"\x01\x00\x00"))
    assert got == ("mp4", "isom", 1000, 0, 1, "avc1")


def test_mp4_nested_container_bomb_never_recurses():
    """Round-11 review regression: a deeply nested 'moov' bomb (each
    level a bare container) used to blow the recursive walk's stack
    (RecursionError inside the Spark task).  The iterative walk bounds
    descent at _MP4_MAX_DEPTH and still parses valid siblings."""
    import struct

    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        _FTYP,
        _mp4_box,
        parse_video_header,
    )

    # 2000 nested moov levels (~16KB) — far past any recursion limit
    bomb = b""
    for _ in range(2000):
        bomb = _mp4_box(b"moov", bomb)
    assert parse_video_header(_FTYP + bomb) is None  # no crash, no meta

    # a valid mvhd SIBLING after the bomb still parses (the walk skips
    # the deep descent but keeps walking the top level)
    mvhd = _mp4_box(b"mvhd", b"\x00" * 12 + struct.pack(">II", 1000, 42))
    got = parse_video_header(_FTYP + bomb + _mp4_box(b"moov", mvhd))
    assert got == ("mp4", "isom", 1000, 42, 0, "")


def test_video_decode_ladder_catches_parser_crash(spark):
    """The operator-level rung boundary: a payload the header parser
    cannot parse (here: ftyp magic but corrupt box structure, plus the
    nested bomb itself) falls to the fake decoder instead of failing
    the task."""
    from haensel_ams_data_engineer_challenge_spark.multimodal import binary

    bomb = b""
    for _ in range(2000):
        bomb = binary._mp4_box(b"moov", bomb)
    df = spark.createDataFrame(
        [
            (1, bytearray(b"\x00\x00\x00\x10ftyp-corrupt-payload")),
            (2, bytearray(binary._FTYP + bomb)),
        ],
        "doc_id long, payload binary",
    )
    rows = binary.decode_video_meta(df).orderBy("doc_id").collect()
    assert [r["decoder"] for r in rows] == ["fake", "fake"]


def test_avi_header_rung(spark):
    """Round 13: decode_video_meta reads the container the MJPEG
    sample tier decodes — a real AVI reports fps-timescale geometry
    and per-stream codecs via decoder='header'; the ISO-BMFF rung is
    untouched (disjoint signatures)."""
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        decode_video_meta,
        parse_avi_header,
    )
    from haensel_ams_data_engineer_challenge_spark.multimodal.jpeg import (
        jpeg_encode_gray,
    )
    from haensel_ams_data_engineer_challenge_spark.multimodal.videoembed import (
        avi_encode_mjpeg,
    )

    frames = [
        jpeg_encode_gray([(x * 7 + y + f) % 200 for y in range(16)
                          for x in range(16)], 16, 16, 80)
        for f in range(5)
    ]
    avi = avi_encode_mjpeg(frames, 16, 16, fps=25)
    assert parse_avi_header(avi) == ("avi", "AVI ", 25, 5, 1, "MJPG")
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"RIFFxxxxWAVE"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_video_meta(df).collect()}
    assert rows[1]["decoder"] == "header"
    assert rows[1]["format"] == "avi"
    assert rows[1]["timescale"] == 25
    assert rows[1]["duration"] == 5
    assert rows[1]["duration_ms"] == 200  # 5 frames at 25 fps
    assert rows[1]["n_tracks"] == 1 and rows[1]["codecs"] == "MJPG"
    assert rows[2]["decoder"] == "fake"  # a WAV is not a video


def _row_set(df):
    return {
        tuple(
            None if r[c] is None else r[c]
            for c in sorted(df.columns)
        )
        for r in df.collect()
    }


def test_fused_header_arms_match_separate_arms(spark, sf_dir):
    """Round 14: the fused one-synth/one-decode header chain must
    produce EXACTLY the rows of the three separate arm queries
    union-by-name'd — the refactor is a plan-shape change only."""
    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        audio_header_query,
        fused_header_arms_query,
        header_decode_query,
        video_header_query,
    )

    fused = fused_header_arms_query(spark, sf_dir)
    sep = (
        header_decode_query(spark, sf_dir)
        .withColumn("method", F.lit("header_decode"))
        .unionByName(
            audio_header_query(spark, sf_dir).withColumn(
                "method", F.lit("audio_header")
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            video_header_query(spark, sf_dir).withColumn(
                "method", F.lit("video_header")
            ),
            allowMissingColumns=True,
        )
    )
    assert set(fused.columns) == set(sep.columns)
    assert _row_set(fused.select(*sorted(fused.columns))) == _row_set(
        sep.select(*sorted(fused.columns))
    )


def test_fused_pixel_arms_match_separate_arms(spark, sf_dir):
    """Round 14: the fused pixel chain (PNG/JPEG/GIF through one synth
    + one hash stage) must produce EXACTLY the rows of the three
    separate arm queries."""
    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.multimodal.phash import (
        gif_pixels_query,
        jpeg_pixels_query,
        phash_query,
        pixel_arms_query,
    )

    fused = pixel_arms_query(spark, sf_dir)
    sep = (
        phash_query(spark, sf_dir)
        .withColumn("method", F.lit("phash"))
        .unionByName(
            jpeg_pixels_query(spark, sf_dir).withColumn(
                "method", F.lit("jpeg")
            )
        )
        .unionByName(
            gif_pixels_query(spark, sf_dir).withColumn(
                "method", F.lit("gif")
            )
        )
    )
    assert set(fused.columns) == set(sep.columns)
    assert _row_set(fused) == _row_set(sep)
    decs = {r["decoder"] for r in fused.select("decoder").distinct().collect()}
    assert decs == {"png", "jpeg", "gif"}


def test_audio_header_reports_g711_and_adpcm_geometry():
    """Round 14: the header tier reports geometry for every format the
    sample tier decodes — G.711 (tags 6/7) and IMA-ADPCM (0x11) used
    to fall to the fake rung at the METADATA tier even though their
    samples decode."""
    import struct

    from haensel_ams_data_engineer_challenge_spark.multimodal.audioembed import (
        ima_adpcm_encode_wav,
    )
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_audio_header,
    )

    def g711(tag, n):
        return (
            b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, tag, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", n)
        )

    assert parse_audio_header(g711(7, 1234)) == ("wav", 1, 8000, 8, 1234)
    assert parse_audio_header(g711(6, 500)) == ("wav", 1, 8000, 8, 500)

    wav = ima_adpcm_encode_wav([((j * 13) % 200) - 100 for j in range(600)])
    parsed = parse_audio_header(wav)
    assert parsed is not None
    fmt, ch, rate, bits, n_samples = parsed
    assert (fmt, ch, rate, bits) == ("wav", 1, 8000, 4)
    # 600 samples at 129 samples/block -> 5 blocks -> 645 declared
    assert n_samples == 645


def test_video_metadata_ladder_reads_animated_gifs(spark):
    """Round 14: the video metadata ladder agrees with the sample
    tier's clip/image split — an animated GIF reports clip metadata
    (centisecond clock, summed GCE delays), a single-frame GIF falls
    to the fake rung (it is an image, not a clip)."""
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        decode_video_meta,
    )
    from haensel_ams_data_engineer_challenge_spark.multimodal.gif import (
        gif_encode_gray,
        gif_encode_gray_animation,
    )

    frames = [
        [(x + y + f) % 256 for y in range(6) for x in range(8)]
        for f in range(3)
    ]
    anim = gif_encode_gray_animation(frames, 8, 6, delay_cs=7)
    single = gif_encode_gray(frames[0], 8, 6)
    df = spark.createDataFrame(
        [(1, bytearray(anim)), (2, bytearray(single))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_video_meta(df).collect()}
    assert rows[1]["decoder"] == "header"
    assert rows[1]["format"] == "gif"
    assert rows[1]["timescale"] == 100
    assert rows[1]["duration"] == 21  # 3 frames x 7 cs
    assert rows[1]["duration_ms"] == 210
    assert rows[1]["codecs"] == "gif-lzw"
    assert rows[2]["decoder"] == "fake"


def test_ima_adpcm_header_sample_tier_geometry_agreement():
    """r14 advice: the header tier mirrors decode_wav_samples' word-
    alignment check — (block - 4*ch) must divide into whole 4-byte
    words per channel — so it never reports geometry (with an
    overcounted samples-per-block) for payloads the sample tier
    refuses."""
    from haensel_ams_data_engineer_challenge_spark.multimodal.audioembed import (
        decode_wav_samples,
        ima_adpcm_encode_wav,
    )
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_audio_header,
    )

    sig = [int(3000 * ((i % 40) / 40 - 0.5)) for i in range(400)]
    aligned = ima_adpcm_encode_wav(sig, rate=8000, block_data_bytes=64)
    h = parse_audio_header(aligned)
    s = decode_wav_samples(aligned)
    assert h is not None and s is not None
    # header's declared sample count matches the sample tier's decode
    assert h[4] == len(s[1])

    # word-misaligned block (block_align=7, (7-4)%4 != 0): BOTH tiers
    # refuse — previously the header tier accepted it
    misaligned = ima_adpcm_encode_wav(sig, rate=8000, block_data_bytes=3)
    assert decode_wav_samples(misaligned) is None
    assert parse_audio_header(misaligned) is None


# ---------------------------------------------------------------------------
# MP3 header rung (round 15, r14 verdict #4)
# ---------------------------------------------------------------------------


def _mp3_frame(version=3, layer=3, br_idx=9, sr_idx=0, padding=0,
               mode=3, fill=b"\x00"):
    """One complete MPEG audio frame with the given header fields."""
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        _mp3_frame_geometry,
    )

    hdr = bytes([
        0xFF,
        0xE0 | (version << 3) | ((4 - layer) << 1) | 1,
        (br_idx << 4) | (sr_idx << 2) | (padding << 1),
        mode << 6,
    ])
    geo = _mp3_frame_geometry(hdr)
    assert geo is not None
    _ch, _rate, _spf, frame_bytes, _v = geo
    return hdr + fill * (frame_bytes - 4)


def _id3v2(size: int, footer: bool = False) -> bytes:
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x04\x00" + (b"\x10" if footer else b"\x00") + ss \
        + b"\x00" * size + (b"3DI" + b"\x00" * 7 if footer else b"")


def test_mp3_cbr_geometry_and_duration():
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_mp3_header,
    )

    # MPEG1 Layer III, 128 kbit/s, 44100 Hz, mono: 417-byte frames,
    # 1152 samples each
    f = _mp3_frame()
    assert len(f) == 144 * 128000 // 44100
    p = f * 5
    assert parse_mp3_header(p) == ("mp3", 1, 44100, 0, 5 * 1152)
    # stereo mode + padding bit lengthens the frame by one byte
    fp = _mp3_frame(mode=0, padding=1)
    assert len(fp) == len(f) + 1
    assert parse_mp3_header(fp * 3) == ("mp3", 2, 44100, 0, 3 * 1152)
    # MPEG2 Layer III: halved rate, 576 samples/frame
    f2 = _mp3_frame(version=2, sr_idx=0)
    assert parse_mp3_header(f2 * 4) == ("mp3", 1, 22050, 0, 4 * 576)
    # Layer I: 384 samples, slot-of-4 frame formula
    f1 = _mp3_frame(layer=1, br_idx=9)
    assert len(f1) == (12 * 288000 // 44100) * 4
    assert parse_mp3_header(f1 * 2) == ("mp3", 1, 44100, 0, 2 * 384)
    # a trailing partial frame reports only complete frames
    assert parse_mp3_header(f * 3 + f[:100]) == ("mp3", 1, 44100, 0, 3 * 1152)


def test_mp3_id3_tags_skipped():
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_mp3_header,
    )

    f = _mp3_frame()
    # ID3v2 prefix (syncsafe size crossing a 7-bit boundary) + v1 trailer
    p = _id3v2(200) + f * 4 + b"TAG" + b"\x00" * 125
    assert parse_mp3_header(p) == ("mp3", 1, 44100, 0, 4 * 1152)
    p = _id3v2(300, footer=True) + f * 2
    assert parse_mp3_header(p) == ("mp3", 1, 44100, 0, 2 * 1152)
    # a non-syncsafe size byte means it is not a real ID3v2 tag
    bad = b"ID3\x04\x00\x00\x00\x00\x00\xff" + f * 2
    assert parse_mp3_header(bad) is None


def test_mp3_vbr_xing_frame_count():
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_mp3_header,
    )

    # mono MPEG1 L3: side info 17 bytes -> Xing at frame offset 21
    f = bytearray(_mp3_frame())
    import struct as _s

    f[21:25] = b"Xing"
    f[25:29] = _s.pack(">I", 1)       # flags: frames present
    f[29:33] = _s.pack(">I", 777)     # declared frame count
    p = bytes(f) + _mp3_frame() * 2   # byte length says 3 frames
    assert parse_mp3_header(p) == ("mp3", 1, 44100, 0, 777 * 1152)
    # the 'Info' (CBR-by-LAME) variant parses identically
    f[21:25] = b"Info"
    assert parse_mp3_header(bytes(f)) == ("mp3", 1, 44100, 0, 777 * 1152)
    # stereo side info is 32 bytes: a Xing at the MONO offset is data
    fs = bytearray(_mp3_frame(mode=0))
    fs[21:25] = b"Xing"
    got = parse_mp3_header(bytes(fs) * 2)
    assert got == ("mp3", 2, 44100, 0, 2 * 1152)


def test_mp3_refusals_and_ladder():
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        audio_meta_ladder,
        parse_mp3_header,
    )

    f = _mp3_frame()
    # free-format bitrate, invalid samplerate, reserved version/layer
    assert parse_mp3_header(bytes([0xFF, 0xFB, 0x02, 0xC0]) * 200) is None
    assert parse_mp3_header(bytes([0xFF, 0xFB, 0x9E, 0xC0]) * 200) is None
    assert parse_mp3_header(bytes([0xFF, 0xEB, 0x90, 0xC0]) * 200) is None
    assert parse_mp3_header(bytes([0xFF, 0xF9, 0x90, 0xC0]) * 200) is None
    # sync byte + garbage: the second-sync verification refuses
    assert parse_mp3_header(f + b"\x00" * 500) is None
    assert parse_mp3_header(b"\xff\xfb" + b"\x90\xc0" + b"Z" * 2000) is None
    assert parse_mp3_header(b"plain text") is None
    assert parse_mp3_header(b"") is None
    # a payload shorter than one frame still parses (ranged read):
    # geometry real, zero complete frames
    assert parse_mp3_header(f[:50]) == ("mp3", 1, 44100, 0, 0)
    # ladder: WAV stays on the WAV rung, MP3 takes the new rung,
    # garbage still lands on the fake rung
    assert audio_meta_ladder(_real_wav(1, 8000, 100))[5] == "header"
    got = audio_meta_ladder(f * 3)
    assert got[0] == "mp3" and got[5] == "header"
    assert audio_meta_ladder(b"not audio at all")[5] == "fake"
