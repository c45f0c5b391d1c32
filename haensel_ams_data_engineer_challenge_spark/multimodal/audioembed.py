"""Audio near-dup tier: the ``audio-v1`` encoder kind (round 12).

The audio modality so far stops at HEADER geometry
(:func:`.binary.parse_audio_header` — channels/rate/bits from ranged
reads, the right call when a 100 TB pipeline only needs metadata).
This module adds the SAMPLE tier: a real stdlib PCM decode
(RIFF/WAVE chunk walk + struct unpacking — the audio analogue of
:func:`.phash.decode_png_pixels`) into a gain-invariant energy-envelope
feature vector served through the round-10 encoder seam
(:func:`..operators.embed.embed_with_model`), so the existing
``embedding_dup_pairs_lsh`` / ``semdedup_keep`` / ANN machinery works
on audio unchanged — exactly how the ``image-v1`` kind plugged in.

Feature design (deterministic integer math, so the DuckDB twin
recomputes it bit-for-bit): mix channels to mono (channel SUM —
exact under gain; the count factor cancels in cosine),
partition the sample stream into ``grid`` windows with the shared
integer partition ``(j * grid) // n``, take each window's SUM of
absolute amplitude (the energy envelope — sums, not means: unequal
window lengths under floor-division means would break the exact-gain
identity below), then mean-center without division:
``f[i] = grid * S[i] - sum(S)``.  Properties:

- GAIN (every sample * k, the re-mastered / volume-normalized
  duplicate): |s| scales by k exactly, so S, the total, and f all
  scale by k — the gate arm's planted twins certify the EXACT 2x
  feature relation; the cosine expression lands at 1.0 within one
  ulp (scaled, not bit-equal, vectors);
- a trim/pad shifts every window boundary slightly, so cosine degrades
  gracefully — the semantic regime (pinned by pytest);
- silence (or any flat envelope) has no direction: encoded as absent,
  the zero-token-document contract;
- ``grid`` = 64 = EMBEDDING_DIM, so every embedding consumer (LSH
  banding at the default dim, cosine verify, ANN) composes without a
  dim override.

Scale shape: one Arrow ``mapInPandas`` over (id, payload) — no
shuffle; everything downstream is the banded-LSH pair machinery whose
only wide exchange carries (band, bucket, id).  The sample ceiling
(``_WAV_MAX_SAMPLES``) bounds per-payload CPU the way the PNG pixel
ceiling does: an adversarial header declaring more falls to the fake
rung, degrading that one payload's dedup, never the task.

Reference analogue: none — the reference has no audio tier; the seam
contract cites api_utils.py:68-138 (model at a boundary) like the
text/image encoder kinds.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.artifact_manifest import artifact_overwrite
from ..sources import load_table
from .armconf import SAMPLE_ARM_MOD

#: feature grid: 64 energy windows = EMBEDDING_DIM.
AUDIO_GRID = 64

#: per-payload decoded-sample ceiling (~23 s at 44.1 kHz mono): the
#: envelope needs only relative window energies, and an adversarial
#: valid header declaring hours of PCM must not pin an executor task
#: in the pure-Python unpack loop (the PNG _PNG_MAX_PIXELS posture).
_WAV_MAX_SAMPLES = 1 << 20

# -- gate-arm synthesis constants (shared, as integer math, with the
# DuckDB twin): every AUD_TWIN_EVERY-th id gets a gain-doubled twin —
# base amplitude <= 99, so 2x never clips int16.
AUD_SAMPLE_MOD = 199
AUD_TWIN_GAIN = 2
AUD_TWIN_EVERY = 5
AUD_TWIN_OFFSET = 1_000_000_000
AUD_RATE = 8000


def _g711_ulaw(b: int) -> int:
    """ITU-T G.711 mu-law byte -> linear sample (the standard
    expansion: invert, split exponent/mantissa, remove the +33 bias).
    Pure integer formula — no table needed."""
    b = ~b & 0xFF
    sign = b & 0x80
    exp = (b >> 4) & 7
    mant = b & 0x0F
    v = (((mant << 3) + 0x84) << exp) - 0x84
    return -v if sign else v


def _g711_alaw(b: int) -> int:
    """ITU-T G.711 A-law byte -> linear sample (even-bit inversion,
    exponent/mantissa split).  Sign convention per canonical
    alaw2linear (r13 advice): after the 0x55 XOR a SET sign bit means
    POSITIVE — the opposite of mu-law's inverted encoding."""
    b ^= 0x55
    sign = b & 0x80
    exp = (b >> 4) & 7
    mant = b & 0x0F
    if exp == 0:
        v = (mant << 4) + 8
    else:
        v = ((mant << 4) + 0x108) << (exp - 1)
    return v if sign else -v


#: WAVE format tags the sample tier decodes: PCM, plus the G.711
#: telephony companders (round 13 — 8-bit logarithmic, one byte per
#: sample; the voice-crawl format).
_WAV_FMT_PCM, _WAV_FMT_ALAW, _WAV_FMT_ULAW = 1, 6, 7

#: the decode-ladder identity baked into every audio-v1 artifact
#: (the image-v1 ``ladder`` rule, round 13): adding G.711 changed the
#: feature space for mu-law/A-law bytes (they used to fall to the
#: fake rung), so artifacts committed under the PCM-only surface must
#: refuse to serve.
AUD_LADDER = "pcm+g711"


def decode_wav_samples(payload: bytes) -> tuple[int, list[int]] | None:
    """REAL stdlib audio decode: (sample_rate, mono samples) for a
    RIFF/WAVE payload whose data chunk BYTES are present, None
    otherwise (non-WAV, unsupported codecs, header-only, or past the
    sample ceiling — callers fall to the fake rung).

    Unlike :func:`.binary.parse_audio_header` (geometry from declared
    sizes — ranged reads suffice), the sample tier needs the actual
    bytes: only complete blocks present in the payload are decoded
    (``min(declared, available)``), so a truncated object decodes its
    prefix instead of crashing.  16-bit signed and 8-bit unsigned PCM
    (the two classic WAV layouts) plus G.711 mu-law/A-law (round 13 —
    the telephony formats; 8-bit log-companded, expanded by the
    standard integer formulas); multi-channel mixes down by channel
    SUM, not mean — ``(k*a + k*b) // ch`` is not ``k * ((a+b) // ch)``
    under floor division, so a mean mixdown would break the EXACT gain
    identity the feature contract promises for stereo re-gains; the
    sum scales by k exactly, and the constant channel-count factor
    cancels in cosine like any other gain.  (G.711 is logarithmic, so
    a LINEAR-domain gain is not byte-representable — the exact-gain
    identity is a PCM statement; G.711 re-encodes of the same signal
    land near, not at, cosine 1.)"""
    n = len(payload)
    if n < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    fmt = None
    data_off = data_size = None
    i = 12
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if cid == b"fmt " and size >= 16 and i + 24 <= n:
            audio_fmt, ch, rate, _br, block, bits = struct.unpack(
                "<HHIIHH", payload[i + 8 : i + 24]
            )
            if audio_fmt not in (
                _WAV_FMT_PCM, _WAV_FMT_ALAW, _WAV_FMT_ULAW,
            ):
                return None  # other codecs need real decoders
            fmt = (audio_fmt, ch, rate, block, bits)
        elif cid == b"data":
            data_off, data_size = i + 8, size
        if fmt is not None and data_off is not None:
            break
        i += 8 + size + (size % 2)
    if fmt is None or data_off is None:
        return None
    audio_fmt, ch, rate, block, bits = fmt
    if audio_fmt != _WAV_FMT_PCM and bits != 8:
        return None  # G.711 is 8 bits per sample by definition
    if ch == 0 or rate == 0 or block == 0 or bits not in (8, 16):
        return None
    if block != ch * (bits // 8):
        return None
    usable = min(data_size, max(0, n - data_off)) // block
    if usable == 0 or usable > _WAV_MAX_SAMPLES:
        return None
    raw = payload[data_off : data_off + usable * block]
    if audio_fmt == _WAV_FMT_ULAW:
        flat = [_g711_ulaw(b) for b in raw]
    elif audio_fmt == _WAV_FMT_ALAW:
        flat = [_g711_alaw(b) for b in raw]
    elif bits == 16:
        flat = struct.unpack(f"<{usable * ch}h", raw)
    else:
        flat = [b - 128 for b in raw]
    if ch == 1:
        return rate, list(flat)
    return rate, [
        sum(flat[j * ch : (j + 1) * ch]) for j in range(usable)
    ]


def _fake_samples(payload: bytes, n: int) -> list[int]:
    """Deterministic fake sample rung for undecodable payloads: ``n``
    signed values from the payload's chained md5 stream — stable
    across runs/engines/partitionings (the ``_fake_grays``
    discipline), so exact byte duplicates still land at cosine 1.0."""
    out: list[int] = []
    block = 0
    while len(out) < n:
        out.extend(
            b - 128
            for b in hashlib.md5(payload + b"|%d" % block).digest()
        )
        block += 1
    return out[:n]


def audio_features(
    samples: list[int], grid: int = AUDIO_GRID
) -> list[float] | None:
    """Mean-centered energy envelope (module docstring): window SUMS of
    |s| with the shared ``(j * grid) // n`` partition, centered as
    ``f[i] = grid * S[i] - sum(S)`` — integer-valued doubles, the
    repo's fixed-point discipline.  None for a flat envelope
    (silence, DC: f would be the zero vector, which has no
    direction)."""
    n = len(samples)
    if n == 0:
        return None
    sums = [0] * grid
    for j, s in enumerate(samples):
        sums[(j * grid) // n] += s if s >= 0 else -s
    if min(sums) == max(sums):
        return None
    tot = sum(sums)
    return [float(grid * v - tot) for v in sums]


def audio_encoder_build(
    spark: SparkSession,
    path: str,
    dim: int | None = None,
    grid: int = AUDIO_GRID,
) -> None:
    """Commit an ``audio-v1`` encoder artifact at ``path`` (no-op when
    a matching one exists).  Stateless like ``image-v1``: the artifact
    is the params marker pinning the FEATURE SPACE (kind, dim, grid)
    that index markers and worker caches key on; a learned audio
    encoder adds its weight files beside it and rides the same
    commit."""
    from ..operators.embed import AUDIO_KIND
    from ..operators.similarity import _check_index_params

    if dim is None:
        dim = grid
    if dim != grid:
        raise ValueError(
            f"audio-v1 dim must equal grid ({grid}), got {dim}"
        )
    params = {
        "kind": "encoder",
        "encoder": AUDIO_KIND,
        "dim": dim,
        "grid": grid,
        "ladder": AUD_LADDER,
    }
    try:
        if _check_index_params(spark, path, params):
            return
    except ValueError:
        pass  # older feature-space identity: builds rebuild in place
    # mix=sum entered the content hash when the stereo mixdown moved
    # from integer mean to channel sum (review fix): the mixdown IS
    # part of the feature space for multi-channel payloads, and
    # serving new vectors under an old embedder pin would silently mix
    # two spaces in one index
    content = f"audio-v1|dim={dim}|grid={grid}|mix=sum|ladder={AUD_LADDER}"

    version = hashlib.md5(content.encode("utf-8")).hexdigest()[:12]
    artifact_overwrite(spark, path, {}, {**params, "version": version})


class _PreparedAudio:
    """Worker-side prepared audio encoder: the decode ladder (real PCM
    samples -> deterministic fake rung) + envelope features, optionally
    followed by a LEARNED linear projection (``mat``, D x grid — the
    bring-your-own-weights form an audio embedder's distilled/PCA'd
    head exports; round 13, the _PreparedImage pattern).  The
    once-per-worker cache in embed_with_model gives the loaded matrix
    the right lifetime."""

    __slots__ = ("grid", "mat")

    def __init__(self, grid: int, mat=None):
        self.grid = grid
        self.mat = mat

    def encode_payload(self, payload) -> list[float] | None:
        if payload is None:
            payload = b""
        decoded = decode_wav_samples(bytes(payload))
        if decoded is not None:
            _rate, samples = decoded
        else:
            samples = _fake_samples(bytes(payload), self.grid)
        feats = audio_features(samples, self.grid)
        if feats is None or self.mat is None:
            return feats
        import numpy as np

        out = self.mat @ np.asarray(feats, dtype=np.float64)
        if not out.any():
            # a projection can null a direction the raw features had:
            # no direction -> absent (the zero-vector contract)
            return None
        return [float(v) for v in out]


#: bound on an imported audio projection's OUTPUT dim (the
#: IMG_PROJ_MAX_DIM rationale: past a few thousand rows the broadcast
#: matrix is a model checkpoint, not a projection).
AUD_PROJ_MAX_DIM = 4096


def audio_encoder_import(
    spark: SparkSession,
    weights_df: DataFrame,
    path: str,
    grid: int = AUDIO_GRID,
) -> dict:
    """Commit a PROJECTED ``audio-v1`` encoder (round 13 — the audio
    analogue of ``image_encoder_import``, closing the encoder-import
    parity gap): ``weights_df`` is ``(row long, vec array<double>)``
    — a D x ``grid`` projection matrix applied on top of the stateless
    envelope features.  Output dim = D; every embedding consumer sizes
    itself from the artifact's dim.  Shared validation refuses torn
    exports (``validate_projection_matrix``); the version is a content
    hash over the weights AND the mixdown identity, so a re-import
    never serves a stale space."""
    import hashlib as _hl

    from ..operators.embed import AUDIO_KIND, validate_projection_matrix

    rows, collected, n = validate_projection_matrix(
        weights_df, grid, AUD_PROJ_MAX_DIM, "audio"
    )
    h = _hl.md5()
    h.update(f"mix=sum|grid={grid}|ladder={AUD_LADDER}|".encode())
    for r in collected:
        h.update(repr((r["row"], tuple(r["vec"]))).encode())
    version = h.hexdigest()[:12]
    params = {
        "kind": "encoder",
        "encoder": AUDIO_KIND,
        "dim": n,
        "grid": grid,
        "ladder": AUD_LADDER,
        "projected": "true",
        "version": version,
    }
    artifact_overwrite(spark, path, {"weights": rows}, params)
    return params


def audio_embed_frame(
    docs: DataFrame,
    model_path: str,
    params: dict,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    load_log_dir: str | None = None,
) -> DataFrame:
    """The audio branch of ``embed_with_model``: (vec_id, embedding
    array<double>) from an audio-payload frame through one Arrow
    mapInPandas — the same output contract as every other encoder
    kind."""
    from ..operators.embed import _worker_encoder_cache

    if params.get("ladder") != AUD_LADDER:
        # committed under an older decode surface (pre-G.711): the
        # same mu-law bytes would embed differently — refuse loudly
        # (the image-v1 ladder rule; builds self-heal, serving refuses)
        raise ValueError(
            f"audio encoder at {model_path} was committed under decode "
            f"ladder {params.get('ladder') or 'pcm-only (pre-r13)'}; "
            f"this build decodes {AUD_LADDER} — rebuild the artifact"
        )
    grid = int(params.get("grid", AUDIO_GRID))
    version = params.get("version", "1")
    projected = params.get("projected") == "true"
    proj_dim = int(params.get("dim", grid))
    src = docs.select(
        F.col(id_col).alias("vec_id"), F.col(payload_col).alias("__p")
    )
    id_type = dict(src.dtypes)["vec_id"]
    cache_key = (model_path, version)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache = _worker_encoder_cache()
        enc = cache.get(cache_key)
        if enc is None:
            if projected:
                from ..operators.embed import load_projection_matrix

                enc = _PreparedAudio(
                    grid, load_projection_matrix(model_path, proj_dim, grid)
                )
            else:
                enc = _PreparedAudio(grid)
            cache[cache_key] = enc
            if load_log_dir is not None:
                import os
                import uuid

                os.makedirs(load_log_dir, exist_ok=True)
                with open(
                    os.path.join(
                        load_log_dir, f"{uuid.uuid4().hex}-{os.getpid()}.loaded"
                    ),
                    "w",
                ) as fh:
                    fh.write(f"{os.getpid()}\n")
        for pdf in batches:
            ids, vecs = [], []
            for i, p in zip(pdf["vec_id"], pdf["__p"]):
                v = enc.encode_payload(p)
                if v is not None:
                    ids.append(i)
                    vecs.append(v)
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(ids, dtype=pdf["vec_id"].dtype),
                    "embedding": pd.Series(vecs, dtype=object),
                }
            )

    return src.mapInPandas(_encode, f"vec_id {id_type}, embedding array<double>")


# ---------------------------------------------------------------------------
# gate arm: synthesized REAL 16-bit mono PCM WAVs (base clip per
# doc_id + a planted GAIN-DOUBLED twin for every AUD_TWIN_EVERY-th id
# — exact feature scaling by the envelope identity, so the twin's
# features are exactly 2x the base's and the gate hash certifies the
# relation).  Spark decodes actual RIFF bytes; the DuckDB twin
# re-derives the sample formula — the phash/image-arm scheme, extended
# to the audio modality.
# ---------------------------------------------------------------------------

#: sample formula (integer, shared with the SQL twin): id-keyed,
#: j-varying texture with a quadratic term so the envelope is never
#: flat; amplitude in [-99, 99] so the 2x twin never clips int16.
_SAMPLE_SQL = (
    f"(base_id * 31 + j * 7 + ((j * j) % 23) * 5) % {AUD_SAMPLE_MOD} - 99"
)


def _sample(i: int, j: int) -> int:
    return (i * 31 + j * 7 + ((j * j) % 23) * 5) % AUD_SAMPLE_MOD - 99


def _syn_n(i: int) -> int:
    # id-varied clip length, always >= 400 so all 64 windows are
    # non-empty (the SQL twin groups existing windows only)
    return 400 + (i * 13) % 300


def synthesize_pcm_wavs(
    ids_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, payload): one real 16-bit mono PCM WAV per id from the
    shared integer formula — data chunk PRESENT (the sample tier needs
    bytes, unlike the header fixtures) — plus a gain-doubled twin
    (id + AUD_TWIN_OFFSET) for ids divisible by AUD_TWIN_EVERY."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                n = _syn_n(i)
                variants = [(i, 1)]
                if i % AUD_TWIN_EVERY == 0:
                    variants.append((i + AUD_TWIN_OFFSET, AUD_TWIN_GAIN))
                for vid, gain in variants:
                    samples = [gain * _sample(i, j) for j in range(n)]
                    data = struct.pack(f"<{n}h", *samples)
                    payloads.append(
                        b"RIFF"
                        + struct.pack("<I", 36 + len(data))
                        + b"WAVE"
                        + b"fmt "
                        + struct.pack(
                            "<IHHIIHH",
                            16, 1, 1, AUD_RATE, AUD_RATE * 2, 2, 16,
                        )
                        + b"data"
                        + struct.pack("<I", len(data))
                        + data
                    )
                    out_ids.append(vid)
            yield pd.DataFrame({id_col: out_ids, "payload": payloads})

    return ids_df.select(id_col).mapInPandas(
        _build, f"{id_col} long, payload binary"
    )


def audio_embed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry arm (round 12): synthesized real PCM WAVs -> REAL
    sample decode -> envelope features, certified by per-clip integer
    stats (env_total = total |s|, f0/f_min/f_max = exact feature
    values — any drift anywhere in decode -> mixdown -> window ->
    center moves them).  Every row must come back decoder='pcm' (a
    fake-rung fallback would feature different samples and fail the
    oracle).  The planted gain twins ride along: their stats are
    exactly 2x their base's, so the hash certifies the invariance the
    dedup tier relies on.  Round 14: ids sampled at 1-in-SAMPLE_ARM_MOD
    — the gate certifies the codec, not the corpus (oracle carries the
    same predicate)."""
    ids = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % SAMPLE_ARM_MOD == 0)
    )
    syn = synthesize_pcm_wavs(ids)
    grid = AUDIO_GRID

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "decoder": [], "n_samples": [],
                "env_total": [], "f0": [], "f_min": [], "f_max": [],
            }
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                decoded = decode_wav_samples(bytes(p))
                if decoded is not None:
                    _rate, samples = decoded
                    decoder = "pcm"
                else:
                    samples = _fake_samples(bytes(p), grid)
                    decoder = "fake"
                feats = audio_features(samples, grid)
                sums_total = sum(abs(s) for s in samples)
                rows["doc_id"].append(int(i))
                rows["decoder"].append(decoder)
                rows["n_samples"].append(len(samples))
                rows["env_total"].append(sums_total)
                rows["f0"].append(int(feats[0]) if feats else None)
                rows["f_min"].append(int(min(feats)) if feats else None)
                rows["f_max"].append(int(max(feats)) if feats else None)
            yield pd.DataFrame(rows)

    return syn.mapInPandas(
        _stats,
        "doc_id long, decoder string, n_samples long, env_total long, "
        "f0 long, f_min long, f_max long",
    )


AUDIO_EMBED_SQL = f"""
WITH eids AS (
    SELECT doc_id AS vid, doc_id AS base_id, 1 AS gain FROM documents
    WHERE doc_id % {SAMPLE_ARM_MOD} = 0
    UNION ALL
    SELECT doc_id + {AUD_TWIN_OFFSET}, doc_id, {AUD_TWIN_GAIN}
    FROM documents
    WHERE doc_id % {AUD_TWIN_EVERY} = 0 AND doc_id % {SAMPLE_ARM_MOD} = 0),
edims AS (
    SELECT vid, base_id, gain, 400 + (base_id * 13) % 300 AS n
    FROM eids),
esamp AS (
    SELECT vid, base_id, gain, n, unnest(range(0, n)) AS j
    FROM edims),
eval_ AS (
    SELECT vid, n, gain * ({_SAMPLE_SQL}) AS s, (j * {AUDIO_GRID}) // n AS w
    FROM esamp),
ewin AS (
    SELECT vid, w, SUM(ABS(s)) AS sw
    FROM eval_ GROUP BY vid, w),
etot AS (
    SELECT vid, SUM(sw) AS tot FROM ewin GROUP BY vid)
SELECT w.vid AS doc_id,
       'pcm' AS decoder,
       MAX(d.n) AS n_samples,
       MAX(t.tot) AS env_total,
       MAX(CASE WHEN w.w = 0 THEN {AUDIO_GRID} * w.sw - t.tot END) AS f0,
       MIN({AUDIO_GRID} * w.sw - t.tot) AS f_min,
       MAX({AUDIO_GRID} * w.sw - t.tot) AS f_max
FROM ewin w
JOIN etot t ON t.vid = w.vid
JOIN edims d ON d.vid = w.vid
GROUP BY w.vid"""
