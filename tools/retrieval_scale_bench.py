"""Scale evidence for bm25_topk (round 6).

The registered bm25 arm of `contamination_check` runs on the driver
testdata, whose synthetic corpus has ~31 distinct BPE terms — every
query term matches every document, posting lists are maximally dense,
and the contrib join degenerates to |queries| x |corpus| x
terms-per-query rows.  That is BM25's worst case and NOT what real
text looks like: real vocabularies are Zipfian, so almost all posting
lists are short and the broadcast-vocab prune discards almost all of
the corpus token stream.

This bench synthesizes a Zipf-distributed corpus (deterministic,
JVM-side: per-token md5-derived uniform u mapped through the inverse
power-law CDF token_id = floor(V * u^alpha)) orders of magnitude
bigger than the testdata corpus, runs the same bm25_topk, and reports
wall time plus the intermediate sizes that decide scale behavior
(pruned postings, contrib rows).  Expected shape: corpus tokens grow
100x over the testdata volume while contrib rows stay in the same
order of magnitude — the prune and the Zipf tail, not the corpus
size, bound the work.

Usage: python tools/retrieval_scale_bench.py [n_docs] [doc_len] [vocab] [n_queries]
Prints one JSON line per measurement; summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: Zipf-ish skew: u^ALPHA with ALPHA=4 gives a power-law rank-frequency
#: curve (rank-1 token ~ a few % of the stream, median token rare).
ALPHA = 4.0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 100

    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.operators.retrieval import (
        bm25_topk,
    )
    from haensel_ams_data_engineer_challenge_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "retrieval-scale-bench", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    # deterministic Zipfian corpus: token t of doc d draws
    # u = md5(d|t)[:8]/2^32, token_id = floor(V * u^ALPHA)
    docs = (
        spark.range(n_docs).withColumnRenamed("id", "doc_id")
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(doc_len)),
                    lambda t: F.concat(
                        F.lit("w"),
                        F.floor(
                            F.lit(float(vocab))
                            * F.pow(
                                F.conv(
                                    F.substring(
                                        F.md5(
                                            F.concat_ws(
                                                "|",
                                                F.col("doc_id").cast("string"),
                                                t.cast("string"),
                                            )
                                        ),
                                        1, 8,
                                    ),
                                    16, 10,
                                ).cast("double")
                                / F.lit(4294967296.0),
                                F.lit(ALPHA),
                            )
                        ).cast("string"),
                    ),
                ),
            ),
        )
        .persist()
    )
    n = docs.count()
    queries = docs.filter(
        F.col("doc_id") % max(1, n_docs // n_queries) == 0
    ).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.col("text"), " "), 1, 16)
        ).alias("text"),
    )

    # the sizes that decide scale behavior, measured independently of
    # the operator: how much of the corpus token stream survives the
    # broadcast-vocab prune, and how many contrib rows the scoring
    # join emits
    from haensel_ams_data_engineer_challenge_spark.operators.retrieval import (
        search_tokens,
    )

    qt = queries.select(
        F.col("query_id"),
        F.explode(F.array_distinct(search_tokens("text"))).alias("term"),
    )
    vocab_df = qt.select("term").distinct()
    ex = docs.select("doc_id", F.explode(search_tokens("text")).alias("term"))
    pruned = ex.join(F.broadcast(vocab_df), "term").count()
    contrib = (
        ex.join(F.broadcast(vocab_df), "term")
        .groupBy("doc_id", "term").count()
        .join(F.broadcast(qt), "term").count()
    )

    MAX_DF = 0.05
    for arm, cap in (("uncapped", None), ("max_df_0.05", MAX_DF)):
        for attempt in range(2):
            t0 = time.time()
            out = bm25_topk(docs, queries, k=5, max_df_frac=cap)
            rows = out.count()
            wall = time.time() - t0
            print(json.dumps({
                "bench": "bm25_zipf", "arm": arm, "attempt": attempt,
                "n_docs": n, "doc_len": doc_len, "vocab": vocab,
                "n_queries": n_queries,
                "corpus_tokens": n_docs * doc_len,
                "pruned_postings": pruned, "contrib_rows_uncapped": contrib,
                "result_rows": rows, "wall_s": round(wall, 2),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
