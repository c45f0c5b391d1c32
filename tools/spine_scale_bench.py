"""Does the hygiene-spine scale linearly in corpus size?

Round-4 verdict #6: at sf0.1 the corpus is 5,000 docs and
`corpus_survivors_split` is dominated by the CC driver loop's ~4 s
scheduler floor — too small to see the data-driven part.  This harness
multiplies the corpus N× and times the REAL registered spine over it —
cold and warm — next to the 1× run in the same session.

Corpus construction (round-6, replaces the round-5 unbounded form):
each copy keeps the original text plus a doc_id-salted tail, so copies
are NEAR-dups — but cluster size is BOUNDED at ``CLUSTER`` copies per
group: copies in different groups also append a group-salt of hash
characters comparable to the text length (cross-group Jaccard ~1/3,
below the LSH collision band), while within-group copies differ only
in the short tail (Jaccard ~0.95).  Why bounded: the round-5 form made
ALL N copies of an original one near-dup cluster, so at 100× the
121-doc band buckets crossed dedup's MAX_BAND_BUCKET=32 flood cap and
were dropped as boilerplate — zero edges, trivial CC, an
unrepresentative run.  Bounded groups keep buckets at ~CLUSTER docs
(under the cap at every multiplier) so the edge set grows linearly
with the corpus and the 100× run forces the DISTRIBUTED CC path
(edges >> the local union-find cap).

Also measures, per multiplier: the LSH candidate-edge count and the
CC star-round count on those edges (max_local_edges=0, so the
O(log n) machinery is what's timed), and re-measures the worst-case
chain topology at N× node count: the SoCC'14 round bound predicts
rounds grow ~log(N), not N.

Usage: python tools/spine_scale_bench.py [sf_dir] [mult1,mult2,...]
(default multipliers: 1,10,100 — the 1× leg is the same-session
scheduler-floor reference.)
Prints one JSON line per measurement; summary lives in BASELINE.md.
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
#: copies per near-dup group — safely under dedup.MAX_BAND_BUCKET=32
CLUSTER = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [
        int(m) for m in (sys.argv[2] if len(sys.argv) > 2 else "1,10,100").split(",")
    ]

    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.operators import dedup as D
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
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }), flush=True)

    def edge_stats(case: str, docs_dir: str) -> None:
        """LSH edge count + distributed-CC round count for this corpus."""
        docs = load_table(spark, docs_dir, "documents")
        pairs = D.dedup_minhash_lsh(docs)
        t0 = time.perf_counter()
        n_edges = pairs.count()
        t1 = time.perf_counter()
        cc = connected_components(pairs, max_local_edges=0)
        n_comp = cc.select("component").distinct().count()
        print(json.dumps({
            "case": f"edges_{case}", "n_edges": n_edges,
            "lsh_sec": round(t1 - t0, 3),
            "cc_rounds": cc.cc_rounds,
            "cc_sec": round(time.perf_counter() - t1, 3),
            "n_components": n_comp,
        }), flush=True)

    def pack_stats(case: str, docs_dir: str, n_docs: int) -> None:
        """Cross-doc sequence packing at N× (round-6 verdict task 6):
        wall time + sequence count; the prefix-sum shape must scale
        with the corpus, not with any single group."""
        from haensel_ams_data_engineer_challenge_spark.operators.pack import (
            pack_sequences,
        )

        d = load_table(spark, docs_dir, "documents")
        for attempt in ("cold", "warm"):
            t0 = time.perf_counter()
            n_seqs = pack_sequences(d, seq_len=512).count()
            print(json.dumps({
                "case": f"pack_{case}_{attempt}", "n_docs": n_docs,
                "n_seqs": n_seqs,
                "sec": round(time.perf_counter() - t0, 3),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }), flush=True)

    def bloom_stats(case: str, docs_dir: str, n_docs: int) -> None:
        """Incremental bloom-prefiltered dedup at N× (round-6 verdict
        task 6): one point where the corpus OVERWHELMS the default
        m_bits (fill → fpr → most of the batch falls through to exact
        verify — correct but degraded) next to a production-sized
        bitmap (~10 bits/key) that stays broadcast-class.  Batch =
        the 1× originals with shifted ids: even ids keep their text
        (true dups), odd ids are salted (genuinely new)."""
        corpus = load_table(spark, docs_dir, "documents")
        batch = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(900 * ID_STRIDE)).cast("long")
        ).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.col("text")
            ).otherwise(F.concat(F.col("text"), F.lit(" fresh-salt "),
                                 F.col("doc_id").cast("string"))),
        )
        n_batch = batch.count()
        default_bits = D.BLOOM_M_BITS
        # production sizing: ~10 bits/key, next power of two
        prod_bits = 1 << max(17, (10 * n_docs).bit_length())
        for label, m_bits in (("default", default_bits), ("sized", prod_bits)):
            t0 = time.perf_counter()
            new_ids = D.incremental_new_docs(batch, corpus, m_bits=m_bits)
            n_new = new_ids.count()
            dt = round(time.perf_counter() - t0, 3)
            bitmap_words = D.bloom_bitmap(
                corpus.select(F.md5(D.normalize_text("text")).alias("text_hash")),
                "text_hash", m_bits,
            ).count()
            print(json.dumps({
                "case": f"bloom_{case}_{label}", "n_corpus": n_docs,
                "n_batch": n_batch, "m_bits": m_bits,
                "bitmap_words": bitmap_words,
                "bitmap_kib": round(bitmap_words * 16 / 1024, 1),
                "n_new": n_new, "sec": dt,
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }), flush=True)

    docs = load_table(spark, sf_dir, "documents")
    n_base = docs.count()

    work = tempfile.mkdtemp(prefix="spine_scale_")
    try:
        for mult in mults:
            if mult <= 1:
                time_spine("1x", sf_dir, n_base)
                edge_stats("1x", sf_dir)
                pack_stats("1x", sf_dir, n_base)
                bloom_stats("1x", sf_dir, n_base)
                continue
            # Nx corpus: copy i shifts ids by i*ID_STRIDE; group
            # g = i // CLUSTER gets a text-length group-salt (distinct
            # per original per group) + a short per-copy tail
            copies = None
            for i in range(mult):
                c = docs.withColumn(
                    "doc_id", (F.col("doc_id") + F.lit(i * ID_STRIDE)).cast("long")
                )
                if i > 0:
                    g = i // CLUSTER
                    c = c.withColumn(
                        "text",
                        F.concat(
                            F.col("text"),
                            F.lit(f" grp{g} "),
                            F.expr(
                                "repeat(md5(concat(text, 'g{g}')), "
                                "cast(ceil(length(text)/32) as int))".format(g=g)
                            ),
                            F.lit(" tail "),
                            F.col("doc_id").cast("string"),
                        ),
                    )
                copies = c if copies is None else copies.unionByName(c)
            out = f"{work}/m{mult}/documents.parquet"
            copies.write.mode("overwrite").parquet(out)
            time_spine(f"{mult}x", f"{work}/m{mult}", n_base * mult)
            edge_stats(f"{mult}x", f"{work}/m{mult}")
            pack_stats(f"{mult}x", f"{work}/m{mult}", n_base * mult)
            bloom_stats(f"{mult}x", f"{work}/m{mult}", n_base * mult)
            shutil.rmtree(f"{work}/m{mult}", ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # chain topology at max-mult node count: rounds must grow ~log(N)
    mult = max(mults)
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
