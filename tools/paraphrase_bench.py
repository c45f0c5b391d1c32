"""Paraphrase recall: hash_embed vs the encoder seam, measured
(round 10, r9-verdict task 6) — the honest quality table for the
semantic tier.  SemDeDup's point is catching same-meaning/different-
words duplicates; hash_embed (exact bag-of-words) cannot, by
construction.  This bench PLANTS synonym-swapped paraphrase pairs into
the real corpus and runs the registry's exact near-dup machinery
(embedding_dup_pairs_lsh, 10 planes, flood cap, threshold 0.9) over
both embedders.

Planted pair i: a base doc of unique filler tokens plus three
canonical terms from the encoder's synonym classes, and its paraphrase
with the variant terms swapped in — same meaning classes, ~14/17
token overlap, hash cosine ~0.8 (below the 0.9 dup bar).

Usage: python tools/paraphrase_bench.py [sf_dir] [n_pairs]
Prints one JSON line per embedder; summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: (canonical sentence, variant sentence) word templates — three
#: synonym classes per pair, the rest unique per planted pair.
CANON = ["fast", "large", "start"]
VARIANT = ["quick", "big", "begin"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.checkpoint import materialize
    from haensel_ams_data_engineer_challenge_spark.operators import embed as E
    from haensel_ams_data_engineer_challenge_spark.operators import (
        similarity as S,
    )
    from haensel_ams_data_engineer_challenge_spark.session import get_spark
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    spark = get_spark("paraphrase-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def pair_texts(i: int) -> tuple[str, str]:
        filler = [f"filler{i}x{j}" for j in range(14)]
        base = " ".join(filler[:5] + CANON[:1] + filler[5:9]
                        + CANON[1:2] + filler[9:] + CANON[2:])
        para = " ".join(filler[:5] + VARIANT[:1] + filler[5:9]
                        + VARIANT[1:2] + filler[9:] + VARIANT[2:])
        return base, para

    rows = []
    for i in range(n_pairs):
        base, para = pair_texts(i)
        rows.append((10_000_000 + 2 * i, base, "en", "plant", len(base)))
        rows.append((10_000_000 + 2 * i + 1, para, "en", "plant", len(para)))
    planted = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs = load_table(spark, sf_dir, "documents").unionByName(
        planted.withColumn("n_chars", F.col("n_chars").cast("int")),
        allowMissingColumns=True,
    ).select("doc_id", "text")
    want = {
        (10_000_000 + 2 * i, 10_000_000 + 2 * i + 1) for i in range(n_pairs)
    }

    enc_path = tempfile.mkdtemp(prefix="paraphrase_enc_")
    E.encoder_model_build(docs, enc_path)
    # round 11: the float-weight kind, both pooling forms — synonym
    # pairs land NEARBY (cosine ~0.99 via shared canonical base
    # directions) rather than identical, the realistic geometry
    wv_mean = tempfile.mkdtemp(prefix="paraphrase_wv_")
    E.wordvec_model_build(docs, wv_mean)
    wv_sif = tempfile.mkdtemp(prefix="paraphrase_wvs_")
    E.wordvec_model_build(docs, wv_sif, pooling="sif")

    def embedder(kind: str):
        if kind == "hash_embed":
            return S.hash_embed(docs)
        if kind == "wordvec_mean":
            return E.embed_with_model(docs, wv_mean)
        if kind == "wordvec_sif":
            return E.embed_with_model(docs, wv_sif)
        return E.embed_with_model(docs, enc_path)

    for kind in ("hash_embed", "model", "wordvec_mean", "wordvec_sif"):
        best, pairs = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            vecs = materialize(embedder(kind))
            pairs = {
                (r["id_a"], r["id_b"])
                for r in S.embedding_dup_pairs_lsh(
                    vecs,
                    threshold=0.9,
                    planes_per_band=10,
                    max_bucket=S.MAX_VECTOR_BUCKET,
                ).collect()
            }
            dt = time.perf_counter() - t0
            # release the checkpointed vectors before the next rep/arm
            # (review fix: 8 retained copies skewed later arms)
            vecs.unpersist()
            best = dt if best is None else min(best, dt)
        caught = sum(1 for p in want if p in pairs)
        print(json.dumps({
            "embedder": kind,
            "planted_pairs": n_pairs,
            "caught": caught,
            "recall": round(caught / n_pairs, 3),
            "total_pairs_found": len(pairs),
            "sec": round(best, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
