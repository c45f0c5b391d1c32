"""phash max_hamming knob curve (round 11): planted-duplicate recall
vs total pair volume per threshold — the evidence behind the default
PHASH_MAX_HAMMING=10.

One corpus (the scale bench's planted re-encode/resize generator), ONE
pair scan at the loosest threshold, then per-threshold metrics are
aggregated driver-side from the returned hamming distances (the knob
only filters, so a single scan prices every setting).

Usage: python tools/phash_knob_bench.py [n_images] [max_t] [--bands]
Prints one JSON line per threshold; with --bands also one line per
banding layout (round 13: 4x16-bit vs 8x8-bit) pricing the
guaranteed-recall-at-hamming<=7 layout — candidate volume (pairs at
t=64 == every verified candidate), wall, and recall at the default t.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    max_t = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import SparkSession

    from haensel_ams_data_engineer_challenge_spark.checkpoint import (
        materialize,
    )
    from haensel_ams_data_engineer_challenge_spark.multimodal import (
        phash as P,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )

    # the scale bench's corpus shape, inlined (ids i%7==1 re-encode
    # i-1; i%7==2 2x-resize i-2), plus the round-12 SMOOTH class (r11
    # verdict task 7): i%7==3 is a photo-like low-frequency texture
    # and i%7==4 its fractional box-resize — the regime the per-pixel-
    # random generator's ~0.78 resize-recall plateau does NOT measure
    # (real photographs are smooth; their resizes land at hamming<=6).
    import math

    import pandas as pd

    SINE = [
        int(round(127 * math.sin(2 * math.pi * k / 64))) for k in range(64)
    ]

    def smooth(src: int):
        w, h = 64 + (src * 3) % 32, 56 + (src * 5) % 24
        p1, p2, p3 = src % 64, (src * 7) % 64, (src * 13) % 64
        grays = [
            max(
                0,
                min(
                    255,
                    128
                    + SINE[(x * 64 // w + p1) % 64] * 28 // 64
                    + SINE[(y * 64 // h + p2) % 64] * 22 // 64
                    + SINE[(x * 64 // w + y * 96 // h + p3) % 64] * 18 // 64
                    + SINE[(x * 512 // w + p2) % 64] * 6 // 64
                    + SINE[(y * 512 // h + p1) % 64] * 6 // 64,
                ),
            )
            for y in range(h)
            for x in range(w)
        ]
        return grays, w, h

    def gen(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["id"]:
                i = int(i)
                if i % 7 == 3:
                    grays, w, h = smooth(i)
                    payloads.append(P.png_encode_gray(grays, w, h))
                    continue
                if i % 7 == 4:
                    grays, w, h = smooth(i - 1)
                    nw, nh = w * 2 // 3, h * 2 // 3
                    payloads.append(
                        P.png_encode_gray(
                            P.box_grays(grays, w, h, nw, nh), nw, nh
                        )
                    )
                    continue
                if i % 7 == 1:
                    src, level, k = i - 1, 9, 1
                elif i % 7 == 2:
                    src, level, k = i - 2, 6, 2
                else:
                    src, level, k = i, 6, 1
                w, h = 24 + (src * 3) % 16, 16 + (src * 5) % 12
                sx, sy = 3 + src % 11, 5 + src % 7
                grays = [
                    (src * 31 + x * sx + y * sy + ((x * (y + src)) % 13) * 9)
                    % 256
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

    images = spark.range(n).mapInPandas(gen, "doc_id long, payload binary")
    hashes = materialize(P.image_phash(images))
    rows = P.phash_dup_pairs(
        hashes, max_hamming=max_t, pre_materialized=True
    ).collect()
    reenc = {(i - 1, i) for i in range(n) if i % 7 == 1}
    resized = {(i - 2, i) for i in range(n) if i % 7 == 2 and i >= 2}
    smooth_resized = {(i - 1, i) for i in range(n) if i % 7 == 4}
    for t in range(0, max_t + 1, 2):
        got = {(r["id_a"], r["id_b"]) for r in rows if r["hamming"] <= t}
        print(
            json.dumps(
                {
                    "max_hamming": t,
                    "reencode_recall": round(
                        len(got & reenc) / max(1, len(reenc)), 4
                    ),
                    "resize_recall": round(
                        len(got & resized) / max(1, len(resized)), 4
                    ),
                    "smooth_resize_recall": round(
                        len(got & smooth_resized)
                        / max(1, len(smooth_resized)),
                        4,
                    ),
                    "total_pairs": len(got),
                }
            ),
            flush=True,
        )

    if "--bands" not in sys.argv:
        return
    import time

    t_def = P.PHASH_MAX_HAMMING
    for nb in (4, 8):
        t0 = time.perf_counter()
        cand = P.phash_dup_pairs(
            hashes, max_hamming=64, pre_materialized=True, n_bands=nb
        ).collect()
        wall = time.perf_counter() - t0
        got = {
            (r["id_a"], r["id_b"]) for r in cand if r["hamming"] <= t_def
        }
        print(
            json.dumps(
                {
                    "bands": nb,
                    "max_hamming": t_def,
                    "candidates": len(cand),
                    "pairs_at_default": len(got),
                    "reencode_recall": round(
                        len(got & reenc) / max(1, len(reenc)), 4
                    ),
                    "resize_recall": round(
                        len(got & resized) / max(1, len(resized)), 4
                    ),
                    "smooth_resize_recall": round(
                        len(got & smooth_resized)
                        / max(1, len(smooth_resized)),
                        4,
                    ),
                    "wall_sec": round(wall, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
