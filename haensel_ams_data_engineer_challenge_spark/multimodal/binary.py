"""Multimodal columns: opaque binary payloads + typed metadata.

Model: media (image/audio/video) lives in a ``binary`` column next to
typed metadata columns; decode / feature-extract / resize run as
Arrow-batched ``mapInPandas`` over that column so bytes never pass
through Python row-at-a-time.

The container ships no image/audio libraries, so the actual decoders
are STUBS: ``decode_image_meta`` tries Pillow and otherwise falls back
to a deterministic fake decode (documented below) — the Spark-side
plumbing (schema, batch iteration, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, format string, width long, height long, "
    "decoder string, content_hash string"
)


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake decode: pretend the payload is an image whose
    format/dimensions derive from its md5 — stable across runs,
    engines and partitionings."""
    digest = hashlib.md5(payload).digest()
    fmt = ("png", "jpeg", "webp")[digest[0] % 3]
    width = 64 + int.from_bytes(digest[1:3], "big") % 1984
    height = 64 + int.from_bytes(digest[3:5], "big") % 1984
    return fmt, width, height


def decode_image_meta(binary_df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: (id, n_bytes, format, width, height, decoder).

    Uses Pillow when importable (real decode), else the deterministic
    fake. Arrow batches keep the payload bytes zero-copy end-to-end.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
            import io

            def one(payload: bytes) -> tuple[str, int, int, str]:
                try:
                    img = Image.open(io.BytesIO(payload))
                    return (img.format or "?").lower(), img.width, img.height, "pillow"
                except Exception:
                    fmt, w, h = _fake_decode(payload)
                    return fmt, w, h, "fake"
        except ImportError:
            def one(payload: bytes) -> tuple[str, int, int, str]:
                fmt, w, h = _fake_decode(payload)
                return fmt, w, h, "fake"

        for pdf in batches:
            meta = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
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
            )

    return binary_df.mapInPandas(_decode, DECODE_SCHEMA)


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
    (text payloads never parse as real images, so the Pillow branch —
    when Pillow even exists — always falls back to the same fake)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return decode_image_meta(docs)


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
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    decoded = decode_image_meta(docs)
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


def _hex_from_hash(start: int, n: int) -> str:
    """Digest bytes [start, start+n) of the decode CTE's content_hash
    (= md5(text)) as integer — same recipe as ``_hex_int`` without
    recomputing the md5."""
    return (
        f"CAST(concat('0x', substr(content_hash, {2 * start + 1}, {2 * n})) "
        "AS BIGINT)"
    )


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
