"""MinHash LSH quality/cost knobs, measured (round 8): candidate
recall vs warm latency as (k hashes, band size r) sweep — the S-curve
knob a dedup deployment actually tunes (collision probability
1-(1-j^r)^(k/r)).

Exact all-pairs Jaccard over the corpus is quadratic, so ground truth
is RELATIVE (standard for recall sweeps): the union of every tested
configuration's candidates, exact-verified at the Jaccard threshold —
each config's recall is the share of those verified true pairs its
candidates cover.

Usage: python tools/minhash_knob_bench.py [sf_dir] [jaccard_threshold]
Prints one JSON line per configuration; summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: (k, band_size): registered layout is (12, 3) — 4 bands of 3
CONFIGS = [(12, 2), (12, 3), (12, 4), (12, 6), (24, 3), (24, 2)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from haensel_ams_data_engineer_challenge_spark.operators import dedup as D
    from haensel_ams_data_engineer_challenge_spark.session import get_spark
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    spark = get_spark("minhash-knob-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    cand: dict[tuple, set] = {}
    secs: dict[tuple, float] = {}
    for cfg in CONFIGS:
        k, r = cfg
        best, rows = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = {
                (x["id_a"], x["id_b"])
                for x in D.dedup_minhash_lsh(
                    docs, k=k, band_size=r
                ).collect()
            }
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        cand[cfg], secs[cfg] = rows, round(best, 3)

    union = sorted(set().union(*cand.values()))
    pairs_df = spark.createDataFrame(union, "id_a long, id_b long")
    cand_ids = (
        pairs_df.selectExpr("id_a AS doc_id")
        .union(pairs_df.selectExpr("id_b AS doc_id"))
        .distinct()
    )
    cand_docs = docs.join(cand_ids, "doc_id", "left_semi")
    truth = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(
            cand_docs, threshold=threshold
        ).collect()
        if (r["id_a"], r["id_b"]) in set(union)
    }
    for cfg in CONFIGS:
        k, r = cfg
        print(json.dumps({
            "case": "minhash", "n_docs": n_docs, "k": k, "band_size": r,
            "n_bands": k // r, "threshold": threshold,
            "n_candidates": len(cand[cfg]),
            "recall": round(
                len(cand[cfg] & truth) / max(len(truth), 1), 3
            ),
            "n_true": len(truth),
            "warm_sec": secs[cfg],
            "loadavg_1m": round(os.getloadavg()[0], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
