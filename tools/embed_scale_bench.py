"""Encoder-seam throughput at Nx corpus (round 10): embed_with_model
is the Python rung of the pipeline — mapInPandas with a per-worker
artifact cache — so its costs must be (a) linear in the corpus,
(b) load-once-per-worker regardless of batch count, and (c) a bounded
multiple of the JVM hash_embed path (the price of ANY Python encoder;
a real learned model costs far more per token than this floor).

Usage: python tools/embed_scale_bench.py [sf_dir] [multipliers...]
Prints one JSON line per (embedder, Nx); summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(a) for a in sys.argv[2:]] or [1, 4, 16]

    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.operators import embed as E
    from haensel_ams_data_engineer_challenge_spark.operators import (
        similarity as S,
    )
    from haensel_ams_data_engineer_challenge_spark.session import get_spark
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    spark = get_spark("embed-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()

    for m in mults:
        docs = base
        for j in range(1, m):
            docs = docs.unionByName(
                base.select(
                    (F.col("doc_id") + j * 10_000_000).alias("doc_id"),
                    "text",
                )
            )
        docs = docs.repartition(32).localCheckpoint()
        enc_path = tempfile.mkdtemp(prefix="embed_scale_enc_")
        wv_path = tempfile.mkdtemp(prefix="embed_scale_wv_")
        log_dir = tempfile.mkdtemp(prefix="embed_scale_loads_")
        wv_log_dir = tempfile.mkdtemp(prefix="embed_scale_wv_loads_")
        E.encoder_model_build(docs, enc_path)
        # round 11: the float-weight kind (numpy vocab matrix + SIF
        # integer weights) through the same seam/cache; its load-once
        # claim is MEASURED via its own log dir (review fix: a shared
        # dir would cross-contaminate the model arm's count)
        E.wordvec_model_build(docs, wv_path, pooling="sif")
        for kind in ("hash_embed", "model", "wordvec_sif"):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                if kind == "hash_embed":
                    out = S.hash_embed(docs)
                elif kind == "wordvec_sif":
                    out = E.embed_with_model(
                        docs, wv_path, load_log_dir=wv_log_dir
                    )
                else:
                    out = E.embed_with_model(
                        docs, enc_path, load_log_dir=log_dir
                    )
                n = out.count()
                best = min(best or 9e9, time.perf_counter() - t0)
            rec = {
                "embedder": kind, "mult": m, "docs": n_base * m,
                "vectors": n, "sec": round(best, 2),
            }
            if kind != "hash_embed":
                import glob

                d = log_dir if kind == "model" else wv_log_dir
                rec["worker_loads"] = len(glob.glob(f"{d}/*.loaded"))
            print(json.dumps(rec), flush=True)
        docs.unpersist()


if __name__ == "__main__":
    main()
