"""ANN quality/cost knobs, measured (round 8): recall@k vs warm
latency as the IVF probe count and the LSH table count sweep — the
two knobs a production deployment actually tunes.  Ground truth is
the exact brute-force top-k.

Usage: python tools/ann_knob_bench.py [sf_dir] [n_queries] [k]
Prints one JSON line per configuration; summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    import haensel_ams_data_engineer_challenge_spark.operators.similarity as S
    from haensel_ams_data_engineer_challenge_spark.session import get_spark
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    spark = get_spark("ann-knob-bench")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = load_table(spark, sf_dir, "embeddings")
    n_vecs = vecs.count()
    queries = vecs.filter(F.col("vec_id") < n_queries)

    truth: dict[int, set[int]] = {}
    for r in S.ann_topk_brute(vecs, queries, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(rows) -> float:
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return round(
            sum(len(got.get(q, set()) & t) for q, t in truth.items())
            / (len(truth) * k),
            3,
        )

    def timed(build):
        best, rows = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = build().collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3), rows

    for n_probe in (1, 2, 3, 5, 10):
        sec, rows = timed(
            lambda: S.ann_topk_ivf(
                vecs, queries, k=k, n_probe=n_probe, index_cache_key="sweep"
            )
        )
        print(json.dumps({
            "case": "ivf", "n_vecs": n_vecs, "n_probe": n_probe,
            "cells": S.IVF_CELLS, "recall": recall(rows), "warm_sec": sec,
            "frac_scanned": round(n_probe / S.IVF_CELLS, 2),
            "loadavg_1m": round(os.getloadavg()[0], 2),
        }), flush=True)

    for tables in (4, 8, 16, 32, 64):
        sec, rows = timed(
            lambda: S.ann_topk_lsh(
                vecs, queries, k=k, tables=tables,
                index_cache_key=f"sweep{tables}",
            )
        )
        print(json.dumps({
            "case": "lsh", "n_vecs": n_vecs, "tables": tables,
            "planes_per_table": S.ANN_LSH_PLANES_PER_TABLE,
            "recall": recall(rows), "warm_sec": sec,
            "loadavg_1m": round(os.getloadavg()[0], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
