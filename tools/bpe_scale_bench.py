"""BPE training scale bench (round-7 verdict #3): measure the three
training paths on a realistic Zipfian corpus at production merge
counts.

- sequential (`bpe_train`): one pair-count shuffle + 1-row collect +
  materialize PER MERGE — the round-6 'weak for production vocab'
  shape; measured at a small merge count and extrapolated per-merge.
- batched (`bpe_train_batched`): k provably-sequential-equal merges
  per driver round; the headline number is ROUNDS at n_merges=1000
  (the scheduler-latency multiplier at 100 TB).
- local (`bpe_train_local`): the word-TYPE table collected under a
  cap (Heaps' law keeps it broadcast-class), exact greedy driver-side
  with incremental pair maintenance — the production-vocabulary path.

Corpus: deterministic Zipfian vocabulary (rank-r frequency ~ 1/r)
over random-letter word shapes — unlike the driver testdata's ~31
distinct BPE terms, this gives the pair distribution real structure
(the same rationale as tools/retrieval_scale_bench.py).

Usage: python tools/bpe_scale_bench.py [n_docs] [words_per_doc] [n_merges]
"""

from __future__ import annotations

import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
    bpe_train,
    bpe_train_batched,
    bpe_train_local,
)
from haensel_ams_data_engineer_challenge_spark.session import get_spark

VOCAB = 20_000
SEED = 1234


def zipf_corpus(n_docs: int, words_per_doc: int):
    rng = random.Random(SEED)
    vocab = []
    seen = set()
    while len(vocab) < VOCAB:
        w = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(3, 10)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    # Zipf ranks: cumulative inverse-rank sampling
    weights = [1.0 / (r + 1) for r in range(VOCAB)]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)
    import bisect

    def draw():
        return vocab[bisect.bisect_left(cum, rng.random())]

    return [
        (i, " ".join(draw() for _ in range(words_per_doc)))
        for i in range(n_docs)
    ]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    wpd = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    spark = get_spark("bpe_scale_bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.createDataFrame(
        zipf_corpus(n_docs, wpd), "doc_id long, text string"
    ).cache()
    n_tok = n_docs * wpd
    print(f"corpus: {n_docs} docs x {wpd} words = {n_tok} tokens, "
          f"vocab {VOCAB}")

    t0 = time.perf_counter()
    local = bpe_train_local(docs, n_merges)
    t_local = time.perf_counter() - t0
    print(f"local   n_merges={len(local):5d}: {t_local:7.1f} s "
          f"(collect word types + driver greedy)")

    rounds: list[int] = []
    t0 = time.perf_counter()
    batched = bpe_train_batched(docs, n_merges, round_log=rounds)
    t_batch = time.perf_counter() - t0
    print(f"batched n_merges={len(batched):5d}: {t_batch:7.1f} s, "
          f"rounds={len(rounds)} (avg batch {len(batched)/max(len(rounds),1):.1f}, "
          f"first 10 batch sizes {rounds[:10]})")
    assert batched == local[:len(batched)], "batched != exact greedy prefix"

    fast_rounds: list[int] = []
    t0 = time.perf_counter()
    fast = bpe_train_batched(docs, n_merges, round_log=fast_rounds, exact=False)
    t_fast = time.perf_counter() - t0
    overlap = len(set(fast) & set(local)) / max(len(local), 1)
    print(f"fast    n_merges={len(fast):5d}: {t_fast:7.1f} s, "
          f"rounds={len(fast_rounds)} (avg batch "
          f"{len(fast)/max(len(fast_rounds),1):.1f}); merge-set overlap "
          f"with exact greedy {overlap:.3f}")

    seq_n = min(50, n_merges)
    t0 = time.perf_counter()
    seq = bpe_train(docs, seq_n)
    t_seq = time.perf_counter() - t0
    print(f"seq     n_merges={len(seq):5d}: {t_seq:7.1f} s "
          f"({t_seq / max(len(seq), 1):.2f} s/merge -> "
          f"{t_seq / max(len(seq), 1) * n_merges:.0f} s extrapolated "
          f"at {n_merges})")
    assert seq == local[:len(seq)], "sequential != local greedy prefix"
    print("equivalence: batched == sequential == local (asserted)")


if __name__ == "__main__":
    main()
