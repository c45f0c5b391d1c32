"""Does the hygiene-spine scale linearly in corpus size?

Round-4 verdict #6: at sf0.1 the corpus is 5,000 docs and
`corpus_survivors_split` is dominated by the CC driver loop's ~4 s
scheduler floor — too small to see the data-driven part.  This harness
multiplies the corpus N×: each copy keeps the original text plus a
short doc_id-salted tail, so copies are NEAR-dups of their original
(high-Jaccard clusters of N+... docs — a realistic dedup workload, not
an exact-dup degenerate case), writes the result as a temp
documents.parquet, and times the REAL registered spine over it —
cold and warm — next to the 1× run in the same session.

Also re-measures the worst-case chain topology at N× node count: the
SoCC'14 O(log n) round bound predicts rounds grow by ~log(N), not N.

Usage: python tools/spine_scale_bench.py [sf_dir] [multiplier]
Prints one JSON line per measurement; summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ID_STRIDE = 10_000_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.operators.components import (
        connected_components,
    )
    from haensel_ams_data_engineer_challenge_spark.registry import registry
    from haensel_ams_data_engineer_challenge_spark.session import get_spark
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    spark = get_spark("spine-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spine = registry()["corpus_survivors_split"][0]

    def time_spine(case: str, docs_dir: str, n_docs: int) -> None:
        for attempt in ("cold", "warm"):
            t0 = time.perf_counter()
            df = spine(spark, docs_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            print(json.dumps({
                "case": f"spine_{case}_{attempt}", "n_docs": n_docs, "sec": dt,
            }), flush=True)

    docs = load_table(spark, sf_dir, "documents")
    n_base = docs.count()

    # 1x baseline in the same session (same JVM warmth regime)
    time_spine("1x", sf_dir, n_base)

    # Nx corpus: copy i shifts ids by i*ID_STRIDE and salts the text
    # tail so copies are near-dups (not byte-identical) of the original
    work = tempfile.mkdtemp(prefix="spine_scale_")
    try:
        copies = None
        for i in range(mult):
            c = docs.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(i * ID_STRIDE)).cast("long")
            )
            if i > 0:
                c = c.withColumn(
                    "text",
                    F.concat(
                        F.col("text"),
                        F.lit(" tail "),
                        F.col("doc_id").cast("string"),
                    ),
                )
            copies = c if copies is None else copies.unionByName(c)
        copies.write.mode("overwrite").parquet(f"{work}/documents.parquet")
        time_spine(f"{mult}x", work, n_base * mult)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # chain topology at Nx node count: rounds must grow ~log(N)
    ids = list(range(int(0.3 * n_base * mult)))
    chain = spark.createDataFrame(
        list(zip(ids, ids[1:])), "id_a: long, id_b: long"
    )
    t0 = time.perf_counter()
    cc = connected_components(chain, max_local_edges=0)  # measure the star rounds
    n_comp = cc.groupBy("component").count().count()
    print(json.dumps({
        "case": f"cc_chain_{mult}x", "nodes": len(ids), "rounds": cc.cc_rounds,
        "sec": round(time.perf_counter() - t0, 3), "n_components": n_comp,
    }), flush=True)


if __name__ == "__main__":
    main()
