"""Is the incremental near-dup probe O(batch), not O(corpus)?

Round-9 scale evidence for operators/minhash_index.py: a FIXED-size
new batch probed against a persisted MinHash band index built over an
N-times corpus.  The claimed shape:

- BUILD is O(corpus) — paid once (the artifact is served from disk
  thereafter; that is the point of persisting it).
- PROBE per batch: the batch's own banding + the band equi-join +
  exact verify of the candidate sliver.  The index side contributes a
  parallel column-pruned SCAN (the batch band set broadcasts, so no
  corpus-sized shuffle); candidates and the verify stage are bounded
  by the batch and the flood cap, not the corpus.  Probe wall time
  should therefore grow with a shallow scan slope, far below linear.
- APPEND is O(batch) + the anti-join's index id scan — same shallow
  slope.

Corpus construction = spine_scale_bench's bounded near-dup groups
(copies in groups of CLUSTER keep band buckets under the flood cap so
the index is realistic, not degenerate).  The probe batch is fixed at
the 1x originals: half keep their text with a short appended tail
(true near-dups of every group's representatives), half get a
text-length salt (genuinely novel).

Usage: python tools/minhash_index_scale_bench.py [sf_dir] [mults]
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
CLUSTER = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [
        int(m) for m in (sys.argv[2] if len(sys.argv) > 2 else "1,10,100").split(",")
    ]

    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.operators import (
        minhash_index as MI,
    )
    from haensel_ams_data_engineer_challenge_spark.session import get_spark
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    spark = get_spark("minhash-index-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = docs.count()

    # fixed probe batch: even originals -> near-dup (short tail), odd
    # originals -> novel (text-length salt)
    batch = docs.withColumn(
        "doc_id", (F.col("doc_id") + F.lit(900 * ID_STRIDE)).cast("long")
    ).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" probe tail")),
        ).otherwise(
            # 2x-word-count of DISTINCT salt words: the shingle set
            # triples, Jaccard vs the original drops to ~1/3 — safely
            # below both the verify threshold and the LSH band
            # collision knee (a single appended mega-token would add
            # ~3 shingles and leave Jaccard ~0.9)
            F.concat(
                F.col("text"), F.lit(" "),
                F.expr(
                    r"""array_join(transform(
                        sequence(1, 2 * size(split(text, '\\s+'))),
                        i -> substr(md5(concat(text, '|', i)), 1, 8)
                    ), ' ')"""
                ),
            )
        ),
    )
    batch = batch.persist()
    n_batch = batch.count()

    work = tempfile.mkdtemp(prefix="mhidx_scale_")
    try:
        for mult in mults:
            if mult <= 1:
                corpus_dir, n_docs = sf_dir, n_base
            else:
                copies = None
                for i in range(mult):
                    c = docs.withColumn(
                        "doc_id",
                        (F.col("doc_id") + F.lit(i * ID_STRIDE)).cast("long"),
                    )
                    if i > 0:
                        g = i // CLUSTER
                        # SPACED salt words (2x the original word
                        # count, deterministic per (text, group)):
                        # within a group copies share the salt and
                        # stay near-dups; across groups Jaccard drops
                        # to ~0.2 — below the band collision knee, so
                        # buckets hold ~CLUSTER docs at EVERY
                        # multiplier.  (A single repeat(md5) mega-token
                        # salt adds only ~3 shingles: all N copies of
                        # an original then share one bucket, and at
                        # 100x that crosses MAX_BAND_BUCKET — the
                        # flood cap kills the cluster and the probe
                        # "misses" its dups by design, an
                        # unrepresentative corpus, not a probe defect.)
                        c = c.withColumn(
                            "text",
                            F.concat(
                                F.col("text"),
                                F.lit(f" grp{g} "),
                                F.expr(
                                    r"""array_join(transform(
                                        sequence(1, 2 * size(split(text, '\\s+'))),
                                        i -> substr(md5(concat(text, '|g{g}|', i)), 1, 8)
                                    ), ' ')""".format(g=g)
                                ),
                                F.lit(" tail "),
                                F.col("doc_id").cast("string"),
                            ),
                        )
                    copies = c if copies is None else copies.unionByName(c)
                corpus_dir = f"{work}/m{mult}"
                copies.write.mode("overwrite").parquet(
                    f"{corpus_dir}/documents.parquet"
                )
                n_docs = n_base * mult

            corpus = load_table(spark, corpus_dir, "documents").select(
                "doc_id", "text"
            )
            idx_path = f"{work}/idx{mult}"
            t0 = time.perf_counter()
            bands = MI.minhash_index_build(corpus, idx_path)
            n_rows = bands.count()
            print(json.dumps({
                "case": f"build_{mult}x", "n_corpus": n_docs,
                "index_rows": n_rows,
                "sec": round(time.perf_counter() - t0, 3),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }), flush=True)

            for attempt in ("cold", "warm"):
                t0 = time.perf_counter()
                n_dup_docs = (
                    MI.near_dup_probe(batch, bands, corpus)
                    .select("doc_id").distinct().count()
                )
                print(json.dumps({
                    "case": f"probe_{mult}x_{attempt}", "n_corpus": n_docs,
                    "n_batch": n_batch, "n_dup_docs": n_dup_docs,
                    "sec": round(time.perf_counter() - t0, 3),
                    "loadavg_1m": round(os.getloadavg()[0], 2),
                }), flush=True)

            t0 = time.perf_counter()
            MI.minhash_index_append(batch, idx_path)
            print(json.dumps({
                "case": f"append_{mult}x", "n_corpus": n_docs,
                "n_batch": n_batch,
                "sec": round(time.perf_counter() - t0, 3),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }), flush=True)

            if mult > 1:
                shutil.rmtree(corpus_dir, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
