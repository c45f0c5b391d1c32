"""Image perceptual-hash tier at Nx corpus (round 11).

Measures, for growing synthetic PNG corpora (real full-IDAT images,
~15% planted near-duplicates: re-encodes and 2x resizes):

- `image_phash` wall time (the per-pixel Python decode is the cost —
  Arrow-batched, embarrassingly parallel, no shuffle: time should
  scale ~linearly with pixels/cores);
- `phash_dup_pairs` wall time and candidate behavior (band self-join
  with the flood cap — should stay ~linear while the planted dup
  recall holds);
- planted-pair recall at the default hamming threshold.

Usage: python tools/phash_scale_bench.py [base_n] [factors...]
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

    from pyspark.sql import SparkSession, functions as F

    from haensel_ams_data_engineer_challenge_spark.multimodal import (
        phash as P,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    sc = spark.sparkContext

    def build_corpus(n: int):
        """n real PNGs executor-side: ids 0..n-1 are distinct base
        images; every id % 7 == 1 is a level-9 RE-ENCODE of id-1, and
        every id % 7 == 2 is a 2x RESIZE of id-2 — planted pairs
        (i-1, i) at known positions."""
        import pandas as pd

        def gen(batches):
            for pdf in batches:
                payloads = []
                for i in pdf["id"]:
                    i = int(i)
                    if i % 7 == 1:
                        src, level, k = i - 1, 9, 1
                    elif i % 7 == 2:
                        src, level, k = i - 2, 6, 2
                    else:
                        src, level, k = i, 6, 1
                    w, h = 24 + (src * 3) % 16, 16 + (src * 5) % 12
                    # per-image GRADIENT structure (id-dependent x/y
                    # slopes and interaction), not just a brightness
                    # offset — dHash is invariant to constant offsets
                    # by design, so offset-only variation would make
                    # every same-dims image a (correctly detected!)
                    # brightness-shifted duplicate and turn the bench
                    # corpus into one giant cluster
                    sx, sy = 3 + src % 11, 5 + src % 7
                    grays = [
                        (src * 31 + x * sx + y * sy
                         + ((x * (y + src)) % 13) * 9) % 256
                        for y in range(h)
                        for x in range(w)
                    ]
                    if k > 1:
                        grays = [
                            grays[(y // k) * w + (x // k)]
                            for y in range(h * k)
                            for x in range(w * k)
                        ]
                        w, h = w * k, h * k
                    payloads.append(P.png_encode_gray(grays, w, h, level))
                yield pd.DataFrame(
                    {"doc_id": pdf["id"].values, "payload": payloads}
                )

        return spark.range(n).mapInPandas(gen, "doc_id long, payload binary")

    # warm the JVM/codegen so the 1x figure isn't startup
    from haensel_ams_data_engineer_challenge_spark.multimodal import phash as _P

    _P.image_phash(build_corpus(64)).count()

    for f in factors:
        n = base_n * f
        images = build_corpus(n)
        t0 = time.perf_counter()
        from haensel_ams_data_engineer_challenge_spark.checkpoint import (
            materialize,
        )

        hashes = materialize(P.image_phash(images))
        n_hashed = hashes.count()
        t_hash = time.perf_counter() - t0
        t0 = time.perf_counter()
        pairs = P.phash_dup_pairs(hashes, pre_materialized=True)
        pair_rows = pairs.collect()
        t_pairs = time.perf_counter() - t0
        got = {(r["id_a"], r["id_b"]) for r in pair_rows}
        planted = {
            (i - 1, i) for i in range(n) if i % 7 == 1 and i - 1 >= 0
        } | {(i - 2, i) for i in range(n) if i % 7 == 2 and i - 2 >= 0}
        recall = len(got & planted) / max(1, len(planted))
        print(
            json.dumps(
                {
                    "case": f"phash_{f}x",
                    "n_images": n,
                    "hash_s": round(t_hash, 2),
                    "pairs_s": round(t_pairs, 2),
                    "n_pairs": len(got),
                    "n_planted": len(planted),
                    "planted_recall": round(recall, 4),
                }
            )
        )
        hashes.unpersist() if hasattr(hashes, "unpersist") else None


if __name__ == "__main__":
    main()
