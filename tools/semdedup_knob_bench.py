"""SemDeDup's knob, measured: k (cluster count) trades the per-cell
quadratic scan volume against cross-cell recall.  The paper sizes k
proportional to the corpus (constant expected cell size); this harness
shows the curve on real data so the sizing rule is evidence, not
folklore.

Corpus: sf embeddings + a planted near-identical twin for every
SEMDEDUP-regime vector (cos ~0.9998) — recall is over the planted set;
``scan_pairs`` (sum of C(n_cell, 2)) is the work the within-cell scan
actually performs, the quantity k exists to bound.

Usage: python tools/semdedup_knob_bench.py [sf_dir] [mult]
``mult`` replicates the corpus (perturbed, re-keyed) for scale points.
Prints one JSON line per k; summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from pyspark.sql import functions as F

    import haensel_ams_data_engineer_challenge_spark.operators.similarity as S
    from haensel_ams_data_engineer_challenge_spark.checkpoint import materialize
    from haensel_ams_data_engineer_challenge_spark.session import get_spark
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    spark = get_spark("semdedup-knob-bench")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n0 = base.count()

    reps = base
    if mult > 1:
        reps = base.crossJoin(
            spark.range(mult).withColumnRenamed("id", "__rep")
        ).select(
            (F.col("vec_id") * mult + F.col("__rep")).alias("vec_id"),
            # decorrelate the replicas a little so cells stay honest
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.col("__rep") % 7).cast("double") * F.lit(0.03) * (i % 5 - 2),
            ).alias("embedding"),
        )

    # plant a near-identical twin of every vector (ids shifted above
    # the corpus range) — the semantic-dup regime SemDeDup removes
    n = n0 * mult
    twins = reps.select(
        (F.col("vec_id") + 2 * n).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + F.lit(0.001) * ((i % 3) - 1)
        ).alias("embedding"),
    )
    corpus = materialize(reps.unionByName(twins))
    corpus.count()
    planted = n

    # sweep k around the paper's sizing rule (constant expected cell):
    # at 1x this is {4, 10, 32, 100}; at 10x the small-k configs ARE
    # the quadratic cliff the knob exists to avoid (k=4 at 80k vectors
    # is ~800M scan pairs), so the sweep scales with the corpus.
    ks = sorted({max(4, (2 * n) // c) for c in (1000, 400, 125, 40)})
    for k in ks:
        t0 = time.perf_counter()
        assign, _ = S.ivf_kmeans(corpus, k=k, cache_key=f"sdk{mult}|{k}")
        occ = {r["cell"]: r["cnt"] for r in
               assign.groupBy("cell").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        train_s = time.perf_counter() - t0
        scan_pairs = sum(c * (c - 1) // 2 for c in occ.values())

        t0 = time.perf_counter()
        pairs = S.semdedup_pairs(
            corpus, threshold=0.9, k=k, index_cache_key=f"sdk{mult}|{k}"
        )
        hits = (
            pairs.filter(
                (F.col("id_b") - F.col("id_a") == 2 * n)
                & (F.col("id_a") < n)
            ).count()
        )
        scan_s = time.perf_counter() - t0
        print(json.dumps({
            "k": k, "corpus": 2 * n,
            "train_s": round(train_s, 2), "scan_s": round(scan_s, 2),
            "scan_pairs": scan_pairs,
            "max_cell": max(occ.values()), "cells_used": len(occ),
            "recall_planted": round(hits / planted, 4),
        }))


if __name__ == "__main__":
    main()
