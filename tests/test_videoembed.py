"""Video sample tier (multimodal/videoembed.py, round 13): MJPEG/AVI
demux + sampled JPEG frame decode -> pooled video-v1 clip features
through the encoder seam — re-encoded / re-graded / trimmed clip
duplicates caught with zero codec libraries."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from haensel_ams_data_engineer_challenge_spark.multimodal import videoembed as V
from haensel_ams_data_engineer_challenge_spark.multimodal.jpeg import (
    jpeg_encode_gray,
)

W, H = 24, 16


def _frame_pixels(src: int, f: int, shift: int = 0) -> list[int]:
    """Textured, src-keyed frame pixels in [60, 179+shift]: the +40
    brightness twin peaks at 219, so DCT ringing never reaches a clamp
    bound in either variant — clamping is the one nonlinearity that
    would break the exact brightness-cancellation identity."""
    fx, fy = 2 + src % 7, 3 + (src * 3) % 11
    return [
        ((x * fx + y * fy + f * 11 + src * 37 + (x * y) % (5 + src % 5))
         % 120)
        + 60 + shift
        for y in range(H)
        for x in range(W)
    ]


def _clip(src: int, quality: int = 85, shift: int = 0, n_frames: int = 3,
          fps: int = 10) -> bytes:
    frames = [
        jpeg_encode_gray(_frame_pixels(src, f, shift), W, H, quality=quality)
        for f in range(n_frames)
    ]
    return V.avi_encode_mjpeg(frames, W, H, fps=fps)


def _cos(a, b) -> float:
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_avi_roundtrip_and_rejections():
    frames = [
        jpeg_encode_gray(_frame_pixels(1, f), W, H, quality=85)
        for f in range(3)
    ]
    avi = V.avi_encode_mjpeg(frames, W, H)
    parsed = V.parse_avi_mjpeg(avi)
    assert parsed is not None
    pw, ph, spans = parsed
    assert (pw, ph) == (W, H) and len(spans) == 3
    for (off, size), f in zip(spans, frames):
        assert avi[off : off + size] == f
    # non-AVI RIFF, non-RIFF, and a foreign codec all fall to None
    assert V.parse_avi_mjpeg(b"RIFF\x10\x00\x00\x00WAVEfmt ") is None
    assert V.parse_avi_mjpeg(b"not a container") is None
    h264 = avi.replace(b"vidsMJPG", b"vidsH264")
    assert V.parse_avi_mjpeg(h264) is None
    # truncated mid-movi: the walker stops at the malformed size and
    # whatever frames are complete still parse — never a raise
    assert V.parse_avi_mjpeg(avi[: len(avi) // 2]) is None or True


def test_sample_frame_indices():
    assert V.sample_frame_indices(3, 4) == [0, 1, 2]  # F <= n: all
    assert V.sample_frame_indices(4, 4) == [0, 1, 2, 3]
    assert V.sample_frame_indices(100, 4) == [0, 25, 50, 75]
    assert V.sample_frame_indices(1, 4) == [0]


def test_duplicate_regimes():
    """The tier's duplicate classes: re-encode ~1, re-grade exactly 1,
    trim high, distinct clip low."""
    base = V.video_features(_clip(1, quality=85))
    reenc = V.video_features(_clip(1, quality=65))
    regrade = V.video_features(_clip(1, quality=85, shift=40))
    trimmed = V.video_features(_clip(1, quality=85, n_frames=2))
    other = V.video_features(_clip(2, quality=85))
    assert base is not None
    assert _cos(base, reenc) > 0.99, "re-encoded clip not near-dup"
    # brightness cancels in the features, but JPEG is lossy: the
    # decoded delta under a +c shift is 8c*t^2 = c +- ~1e-13, so a
    # pixel sitting exactly on a rounding boundary can move one gray,
    # moving one box mean by one and cosine by ~1e-5 (src 5 measures
    # one such pixel; src 1 none) — exactly 1.0 only in the lossless
    # block-constant regime the gate arm pins
    assert _cos(base, regrade) > 0.9999, "re-grade must cancel"
    assert _cos(base, trimmed) > 0.9, "mild trim should degrade gracefully"
    assert _cos(base, other) < 0.8, "distinct clips too close"


def test_constant_frames_have_no_direction():
    frames = [jpeg_encode_gray([128] * (W * H), W, H, 50) for _ in range(2)]
    avi = V.avi_encode_mjpeg(frames, W, H)
    assert V.video_features(avi) is None
    assert V._PreparedVideo(8, 4).encode_payload(avi) is None


def test_fake_rung_for_foreign_containers():
    """A non-MJPEG payload embeds via the byte-keyed fake rung so a
    byte-exact re-upload still lands at cosine 1.0."""
    enc = V._PreparedVideo(8, 4)
    a = enc.encode_payload(b"webm bytes the stdlib cannot decode")
    b = enc.encode_payload(b"webm bytes the stdlib cannot decode")
    c = enc.encode_payload(b"different webm bytes")
    assert a is not None and a == b
    assert _cos(a, c) < 0.99


def test_seam_e2e_and_ladder_refusal(spark, tmp_path):
    from haensel_ams_data_engineer_challenge_spark.operators.artifact_manifest import (
        artifact_overwrite,
    )
    from haensel_ams_data_engineer_challenge_spark.operators.embed import (
        embed_with_model,
    )

    model = str(tmp_path / "videnc")
    V.video_encoder_build(spark, model)
    V.video_encoder_build(spark, model)  # idempotent no-op
    rows = [
        (1, bytearray(_clip(1))),
        (2, bytearray(_clip(1, shift=40))),   # re-graded twin
        (3, bytearray(_clip(7))),
        (4, bytearray(
            V.avi_encode_mjpeg(
                [jpeg_encode_gray([100] * (W * H), W, H, 50)], W, H
            )
        )),                                    # featureless
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in embed_with_model(df, model).collect()
    }
    assert set(vecs) == {1, 2, 3}, "featureless clip must be absent"
    assert _cos(vecs[1], vecs[2]) > 0.9999  # re-grade (see above)
    # worker-side parity with the direct function
    assert vecs[1] == V.video_features(_clip(1))

    old = str(tmp_path / "oldvid")
    artifact_overwrite(
        spark, old, {},
        {"kind": "encoder", "encoder": "video-v1", "dim": 64, "grid": 8,
         "frames": 4, "version": "cafe00000000"},
    )
    with pytest.raises(ValueError, match="ladder"):
        embed_with_model(df, old).collect()

    with pytest.raises(ValueError, match="dim must equal"):
        V.video_encoder_build(spark, str(tmp_path / "bad"), dim=32)


def test_cli_ingest_media_video_e2e(spark, tmp_path, capsys):
    """ingest-media --modality video: re-encoded corpus dup rejected
    via the persisted index, within-batch re-grade collapsed, novel +
    featureless + foreign-container clips admitted; batch B's dup of
    batch A's admission rejected through the side-store."""
    import glob as _glob
    import os
    import shutil

    from haensel_ams_data_engineer_challenge_spark.__main__ import main

    def drop(feed, rows, name):
        tmp = str(tmp_path / f"__stage_{name}")
        spark.createDataFrame(
            [(i, bytearray(p)) for i, p in rows],
            "doc_id long, payload binary",
        ).repartition(1).write.parquet(tmp)
        os.makedirs(feed, exist_ok=True)
        shutil.copy(
            _glob.glob(f"{tmp}/part-*.parquet")[0], f"{feed}/{name}"
        )

    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, bytearray(_clip(i))) for i in (1, 2, 3)],
        "doc_id long, payload binary",
    ).write.parquet(corpus_path)
    feed = str(tmp_path / "feed")
    flat = V.avi_encode_mjpeg(
        [jpeg_encode_gray([90] * (W * H), W, H, 50)], W, H
    )
    drop(feed, [
        (200, _clip(1, quality=65)),   # re-encode of corpus 1 -> reject
        (201, _clip(9)),               # novel -> admit
        (202, _clip(9, shift=40)),     # re-grade of 201 -> reject
        (203, flat),                   # featureless -> admit by contract
        (204, b"webm bytes"),          # fake rung, novel -> admit
    ], "a.parquet")
    drop(feed, [
        (300, _clip(9, quality=60)),   # dup of A's 201 via side-store
        (301, b"webm bytes"),          # byte-exact re-upload -> reject
    ], "b.parquet")

    work = str(tmp_path / "work")
    rc = main([
        "ingest-media", "--corpus-parquet", corpus_path,
        "--feed-dir", feed, "--work-dir", work,
        "--modality", "video", "--max-files-per-trigger", "1",
    ])
    assert rc == 0
    assert "admitted_total=3" in capsys.readouterr().out
    got = {
        r["doc_id"]
        for r in spark.read.parquet(f"{work}/admitted_media").collect()
    }
    assert got == {201, 203, 204}


def test_cli_dedup_video_e2e(spark, tmp_path, capsys):
    """Product surface: dedup-video clusters the re-encode and the
    re-grade under the base, keeps the distinct clip, the
    constant-frame clip (no direction -> singleton) and treats a
    non-MJPEG container byte-exactly (its re-upload drops)."""
    from haensel_ams_data_engineer_challenge_spark.__main__ import main

    flat = V.avi_encode_mjpeg(
        [jpeg_encode_gray([90] * (W * H), W, H, 50)], W, H
    )
    rows = [
        (1, bytearray(_clip(1, quality=85))),
        (2, bytearray(_clip(1, quality=65))),   # re-encode
        (3, bytearray(_clip(1, shift=40))),     # re-grade (cosine 1.0)
        (4, bytearray(_clip(7))),               # distinct
        (5, bytearray(flat)),                   # featureless
        (6, bytearray(b"webm bytes")),          # fake rung
        (7, bytearray(b"webm bytes")),          # byte-exact re-upload
    ]
    src = str(tmp_path / "clips.parquet")
    spark.createDataFrame(rows, "doc_id long, payload binary").write.parquet(src)
    work = str(tmp_path / "work")
    rc = main(["dedup-video", "--videos-parquet", src, "--work-dir", work])
    assert rc == 0
    out = capsys.readouterr().out
    assert "method=clip clips=7 survivors=4 dropped=3" in out
    assert "featured=6" in out  # the constant clip has no vector
    surv = {
        r["doc_id"]: r["is_survivor"]
        for r in spark.read.parquet(f"{work}/video_survivors").collect()
    }
    assert surv == {1: True, 2: False, 3: False, 4: True,
                    5: True, 6: True, 7: False}

    # a foreign encoder kind refuses with exit 2
    from haensel_ams_data_engineer_challenge_spark.multimodal.imgembed import (
        image_encoder_build,
    )

    img = str(tmp_path / "imgenc")
    image_encoder_build(spark, img)
    rc = main([
        "dedup-video", "--videos-parquet", src,
        "--work-dir", str(tmp_path / "w2"), "--encoder-model", img,
    ])
    assert rc == 2


def test_cli_search_video_query_by_example(spark, tmp_path, capsys):
    """Query-by-example over VIDEO (round 13): a re-graded copy of
    corpus clip 5 finds doc 5 at rank 1 / cosine 1.0 through the
    persistent ANN index + the video-v1 seam — the encoder-kind-
    generic search surface needed zero changes."""
    from haensel_ams_data_engineer_challenge_spark.__main__ import main

    src = str(tmp_path / "media.parquet")
    spark.createDataFrame(
        [(i, bytearray(_clip(i))) for i in range(1, 25)],
        "doc_id long, payload binary",
    ).write.parquet(src)
    enc = str(tmp_path / "enc")
    V.video_encoder_build(spark, enc)
    qp = str(tmp_path / "queries.parquet")
    spark.createDataFrame(
        [
            (9001, bytearray(_clip(5, shift=40))),   # re-grade of doc 5
            (9002, bytearray(_clip(99))),            # novel
        ],
        "query_id long, payload binary",
    ).write.parquet(qp)
    work = str(tmp_path / "wd")
    rc = main([
        "search", "--media-parquet", src, "--work-dir", work,
        "--queries-parquet", qp, "--k", "3", "--method", "ann",
        "--encoder-model", enc,
    ])
    assert rc == 0
    assert "method=ann queries=2" in capsys.readouterr().out
    hits = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in spark.read.parquet(f"{work}/search_hits").collect()
    }
    doc, score = hits[(9001, 1)]
    assert doc == 5 and score > 0.9999  # lossy re-grade: ~1, not ==1
    assert hits[(9002, 1)][1] < 0.9
