"""Audio sample tier at Nx corpus (round 12).

Measures, for growing synthetic WAV corpora (real 16-bit PCM data,
~28% planted near-duplicates: gain copies and small trims):

- `embed_with_model` wall time through the audio-v1 seam (the struct
  unpack is the cost — Arrow-batched, embarrassingly parallel, no
  shuffle: time should scale ~linearly with samples/cores);
- `embedding_dup_pairs_lsh` wall time (banded sign-LSH + exact-cosine
  verify — the shared vector pair machinery);
- planted-pair recall at the 0.9 cosine default (gain copies measure
  1.0 within an ulp; ~2% trims ~0.97+).

Usage: python tools/audio_scale_bench.py [base_n] [factors...]
Defaults: base_n=2000, factors 1 4 16.  Prints one JSON line per
factor.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 16]

    from pyspark.sql import SparkSession

    from haensel_ams_data_engineer_challenge_spark.checkpoint import materialize
    from haensel_ams_data_engineer_challenge_spark.multimodal import (
        audioembed as A,
    )
    from haensel_ams_data_engineer_challenge_spark.operators import (
        embed as E,
        similarity as S,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )

    model_path = "/tmp/spark_graft_audio_bench_model"
    A.audio_encoder_build(spark, model_path)

    def build_corpus(n: int):
        """n real PCM WAVs executor-side: ids 0..n-1 are distinct base
        clips (short-period tone under an id-varied smooth envelope);
        every id % 7 == 1 is a GAIN x2 copy of id-1, and every
        id % 7 == 2 is a ~2% TRIM of id-2 — planted pairs (i-1, i)
        and (i-2, i) at known positions."""
        import struct

        import pandas as pd

        def clip(src: int, gain: int, skip: int):
            # ~1500-2100 samples; per-clip ENVELOPE SHAPE = 12 smooth
            # triangular bumps with md5-derived weights (an effectively
            # 12-dim direction space: measured accidental cross-id
            # cosine>=0.9 rate 0.06% — a shared-shape corpus collapses
            # into one giant genuine-near-dup cluster and floods the
            # LSH buckets; the first draft of this bench did exactly
            # that).  Tone period 5 << the ~30-sample feature windows,
            # so window energy tracks the envelope, not tone phase.
            import hashlib

            n_s = 1500 + (src * 37) % 600
            d = hashlib.md5(b"env|%d" % src).digest()
            ws = [1 + d[b] % 7 for b in range(12)]
            half = n_s // 12
            centers = [(2 * b + 1) * n_s // 24 for b in range(12)]
            out = []
            for j in range(skip, n_s):
                env = 20 + sum(
                    w * max(0, half - abs(j - c))
                    for w, c in zip(ws, centers)
                ) // 15
                tone = ((j + src) % 5) - 2
                out.append(tone * env * gain)
            return out

        def gen(batches):
            for pdf in batches:
                payloads = []
                for i in pdf["id"]:
                    i = int(i)
                    if i % 7 == 1:
                        src, gain, skip = i - 1, 2, 0
                    elif i % 7 == 2:
                        src, gain, skip = i - 2, 1, 30
                    else:
                        src, gain, skip = i, 1, 0
                    samples = clip(src, gain, skip)
                    data = struct.pack(f"<{len(samples)}h", *samples)
                    payloads.append(
                        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                        + b"fmt " + struct.pack(
                            "<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16
                        )
                        + b"data" + struct.pack("<I", len(data)) + data
                    )
                yield pd.DataFrame(
                    {"doc_id": pdf["id"].values, "payload": payloads}
                )

        return spark.range(n).mapInPandas(gen, "doc_id long, payload binary")

    # warm the JVM/codegen so the 1x figure isn't startup
    E.embed_with_model(build_corpus(64), model_path).count()

    for f in factors:
        n = base_n * f
        clips = build_corpus(n)
        t0 = time.perf_counter()
        vecs = materialize(E.embed_with_model(clips, model_path))
        n_vec = vecs.count()
        t_embed = time.perf_counter() - t0
        t0 = time.perf_counter()
        pair_rows = S.embedding_dup_pairs_lsh(
            vecs, threshold=0.9, planes_per_band=10,
            max_bucket=S.MAX_VECTOR_BUCKET,
        ).collect()
        t_pairs = time.perf_counter() - t0
        got = {(r["id_a"], r["id_b"]) for r in pair_rows}
        planted = {
            (i - 1, i) for i in range(n) if i % 7 == 1 and i - 1 >= 0
        } | {(i - 2, i) for i in range(n) if i % 7 == 2 and i - 2 >= 0}
        recall = len(got & planted) / max(1, len(planted))
        print(
            json.dumps(
                {
                    "case": f"audio_{f}x",
                    "n_clips": n,
                    "n_featured": n_vec,
                    "embed_s": round(t_embed, 2),
                    "pairs_s": round(t_pairs, 2),
                    "n_pairs": len(got),
                    "n_planted": len(planted),
                    "planted_recall": round(recall, 4),
                }
            )
        )
        vecs.unpersist() if hasattr(vecs, "unpersist") else None


if __name__ == "__main__":
    main()
