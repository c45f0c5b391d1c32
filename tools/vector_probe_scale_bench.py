"""Is the embedding near-dup probe O(batch), not O(index)?

Round-9 scale evidence for similarity.vector_dup_probe — the
embedding twin of tools/minhash_index_scale_bench.py.  A FIXED-size
vector batch probes a persisted banded-LSH bucket index (the
streaming-ingest 16x10 layout — 1024 buckets/band; the small-corpus
8x3 dedup layout floods at scale, which is exactly what this harness
first demonstrated) built over an N-times corpus:

- BUILD is O(corpus), paid once (served from disk thereafter).
- PROBE: batch bucket rows broadcast into the index scan; candidates
  + exact-cosine verify are bounded by bucket occupancy, not corpus
  size — wall time should grow with a shallow scan slope.
- APPEND (lsh_index_append): anti-join id scan + batch hashing —
  same shallow slope.

Corpus construction: the sf embeddings (unit-norm) replicated Nx,
each copy kicked by +2.0 on a per-(id, copy) axis — cosine to the
original ~1/sqrt(5) ~ 0.45, far below the 0.9 threshold, and distinct
copies differ in axis so they are mutually non-dup too (the corpus
grows without growing any near-dup cluster).  The probe batch is the
1x originals: half perturbed by +0.02 on axis 0 (true near-dups at
cosine ~0.9998), half kicked by +2.0 on a per-id axis (novel).

Usage: python tools/vector_probe_scale_bench.py [sf_dir] [mults]
(defaults /root/testdata/sf0.1 and 1,10,100).  One JSON line per
measurement; summary belongs in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ID_STRIDE = 10_000_000
THRESHOLD = 0.9


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [
        int(m) for m in (sys.argv[2] if len(sys.argv) > 2 else "1,10,100").split(",")
    ]

    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.operators import similarity as S
    from haensel_ams_data_engineer_challenge_spark.session import get_spark
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    spark = get_spark("vector-probe-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_base = vecs.count()

    def _kick(df, axis_expr: str, scale: float):
        """embedding + scale * e_{axis} (axis from an int expression)."""
        return df.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, i) -> CASE WHEN i = ({axis_expr}) "
                f"THEN x + CAST({scale} AS DOUBLE) ELSE x END)"
            ),
        )

    # fixed probe batch: even originals lightly perturbed (near-dups),
    # odd originals heavily kicked on a per-id axis (novel)
    batch = vecs.withColumn(
        "vec_id", (F.col("vec_id") + F.lit(900 * ID_STRIDE)).cast("long")
    )
    near = _kick(batch.filter("vec_id % 2 = 0"), "0", 0.02)
    novel = _kick(batch.filter("vec_id % 2 = 1"), "cast(vec_id % 64 as int)", 2.0)
    batch = near.unionByName(novel).persist()
    n_batch = batch.count()

    work = tempfile.mkdtemp(prefix="vprobe_scale_")
    try:
        for mult in mults:
            if mult <= 1:
                corpus = vecs
            else:
                copies = [vecs]
                for i in range(1, mult):
                    copies.append(
                        _kick(
                            vecs.withColumn(
                                "vec_id",
                                (F.col("vec_id") + F.lit(i * ID_STRIDE)).cast("long"),
                            ),
                            f"cast((vec_id + {i}) % 64 as int)", 2.0,
                        )
                    )
                c = copies[0]
                for cc in copies[1:]:
                    c = c.unionByName(cc)
                corpus_path = f"{work}/m{mult}"
                c.write.mode("overwrite").parquet(corpus_path)
                corpus = spark.read.parquet(corpus_path)
            n_corpus = n_base * mult

            idx_path = f"{work}/idx{mult}"
            t0 = time.perf_counter()
            from haensel_ams_data_engineer_challenge_spark.streaming.vectors import (
                VECTOR_DEDUP_BANDS,
                VECTOR_DEDUP_PLANES,
            )

            # env override to demonstrate the sizing rule (probe cost
            # ~ batch x corpus / 2^planes): VPROBE_PLANES=13 restores
            # 1x-like occupancy at a 100x corpus
            VECTOR_DEDUP_PLANES = int(
                os.environ.get("VPROBE_PLANES", VECTOR_DEDUP_PLANES)
            )

            buckets = S.lsh_index_persistent(
                corpus, idx_path,
                tables=VECTOR_DEDUP_BANDS,
                planes_per_table=VECTOR_DEDUP_PLANES,
            )
            n_rows = buckets.count()
            print(json.dumps({
                "case": f"build_{mult}x", "n_corpus": n_corpus,
                "index_rows": n_rows,
                "sec": round(time.perf_counter() - t0, 3),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }), flush=True)

            for attempt in ("cold", "warm"):
                t0 = time.perf_counter()
                n_dups = (
                    S.vector_dup_probe(
                        batch, buckets, corpus, THRESHOLD,
                        VECTOR_DEDUP_BANDS, VECTOR_DEDUP_PLANES,
                    )
                    .select("vec_id").distinct().count()
                )
                print(json.dumps({
                    "case": f"probe_{mult}x_{attempt}", "n_corpus": n_corpus,
                    "n_batch": n_batch, "n_dup_vecs": n_dups,
                    "sec": round(time.perf_counter() - t0, 3),
                    "loadavg_1m": round(os.getloadavg()[0], 2),
                }), flush=True)

            t0 = time.perf_counter()
            S.lsh_index_append(
                batch, idx_path,
                tables=VECTOR_DEDUP_BANDS,
                planes_per_table=VECTOR_DEDUP_PLANES,
            )
            print(json.dumps({
                "case": f"append_{mult}x", "n_corpus": n_corpus,
                "n_batch": n_batch,
                "sec": round(time.perf_counter() - t0, 3),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }), flush=True)

            if mult > 1:
                shutil.rmtree(f"{work}/m{mult}", ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
