"""Skew evidence for connected components: giant-cluster pathologies.

Mirrors the J4 hot-user table (BASELINE.md "Skew evidence"): the
SoCC'14 large-star/small-star O(log n) round bound is CITED in
operators/components.py — this harness MEASURES it on pathological
graphs at sf0.1 scale:

- chain over 30% of docs: worst-case diameter (plain min-label
  propagation needs O(n) rounds; the star algorithm must stay
  logarithmic);
- hub star over 30% of docs: the giant flat cluster, near-converged
  from the start;
- uniform 2-node components: the no-skew baseline at the same node
  count;
- LSH band-bucket flood cap ON vs OFF on a corpus where 30% of docs
  are near-copies of one boilerplate text: the cap is what keeps the
  CC edge set bounded at 100 TB — this measures the pair-count blowup
  the cap prevents and what the uncapped edge set costs downstream in
  CC wall time.

Usage: python tools/cc_skew_bench.py [sf_dir]
Prints one JSON line per measurement; the summary table lives in
BASELINE.md ("Skew evidence").
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GIANT_FRACTION = 0.30


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession, functions as F

    from haensel_ams_data_engineer_challenge_spark.operators.components import (
        connected_components,
    )
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        dedup_minhash_lsh,
    )
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("cc-skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    n_giant = int(GIANT_FRACTION * len(ids))
    giant, rest = ids[:n_giant], ids[n_giant:]

    def run_cc(name: str, pairs_df, extra: dict | None = None) -> None:
        t0 = time.perf_counter()
        # max_local_edges=0: this harness measures the DISTRIBUTED star
        # rounds (the 100 TB path) — don't let the adaptive small-graph
        # fast path swallow the synthetic topologies
        cc = connected_components(pairs_df, max_local_edges=0)
        comp_sizes = cc.groupBy("component").count()
        top = comp_sizes.agg(F.max("count")).first()[0]
        n_comp = comp_sizes.count()
        dt = round(time.perf_counter() - t0, 3)
        print(json.dumps({
            "case": name,
            "rounds": cc.cc_rounds,
            "round_secs": cc.cc_round_secs,
            "sec": dt,
            "giant_component": top,
            "n_components": n_comp,
            **(extra or {}),
        }))

    def edges_df(edges):
        return spark.createDataFrame(edges, "id_a: long, id_b: long")

    # --- synthetic topologies: 30% of docs in ONE component ------------
    chain = list(zip(giant, giant[1:]))
    star = [(giant[0], x) for x in giant[1:]]
    uniform = list(zip(rest[0::2], rest[1::2]))
    run_cc("cc_chain_30pct", edges_df(chain), {"edges": len(chain)})
    run_cc("cc_star_30pct", edges_df(star), {"edges": len(star)})
    run_cc("cc_uniform_pairs", edges_df(uniform), {"edges": len(uniform)})

    # --- LSH flood cap ON/OFF on a 30% near-copy corpus ----------------
    # each near-copy = shared boilerplate + a unique id suffix, so
    # minhash signatures are near-identical and band buckets flood
    boiler = "the quick brown fox jumps over the lazy dog " * 12
    giant_set = set(giant)
    neardup = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(list(giant_set)),
            F.concat(F.lit(boiler), F.lit("tail "), F.col("doc_id").cast("string")),
        ).otherwise(F.col("text")),
    )
    for capped in (True, False):
        pairs = dedup_minhash_lsh(
            neardup, max_bucket_size=32 if capped else None
        )
        t0 = time.perf_counter()
        n_pairs = pairs.count()
        pair_dt = round(time.perf_counter() - t0, 3)
        print(json.dumps({
            "case": f"lsh_pairs_cap_{'on' if capped else 'off'}",
            "n_pairs": n_pairs,
            "pairgen_sec": pair_dt,
        }))
        run_cc(
            f"cc_neardup_cap_{'on' if capped else 'off'}",
            pairs,
            {"n_pairs": n_pairs},
        )


if __name__ == "__main__":
    main()
