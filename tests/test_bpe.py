"""BPE train/segment vs a transparent Python reference (the
connected-components verification precedent for iterative algorithms:
the Spark loop must reproduce the reference implementation exactly)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
    END,
    bpe_segment,
    bpe_train,
)

# ---------------------------------------------------------------------------
# reference implementation (Sennrich et al. 2016, algorithm 1)
# ---------------------------------------------------------------------------


def _py_words(texts):
    return Counter(
        w for t in texts for w in re.findall(r"[a-z0-9]+", t.lower())
    )


def _py_symbols(word):
    return [*word[:-1], word[-1] + END]


def _py_merge(symbols, a, b):
    out = []
    for s in symbols:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def py_bpe_train(texts, n_merges):
    freqs = _py_words(texts)
    state = {w: _py_symbols(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in state.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += freqs[w]
        if not pairs:
            break
        # max count, lexicographic (a, b) tie-break — bpe_train's order
        (a, b), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        state = {w: _py_merge(s, a, b) for w, s in state.items()}
    return merges


def py_bpe_segment(text, merges):
    out = []
    for w in re.findall(r"[a-z0-9]+", text.lower()):
        syms = _py_symbols(w)
        for a, b in merges:
            syms = _py_merge(syms, a, b)
        out.extend(syms)
    return out


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "the newest lower low",
    "a aa aaa aaaa",          # overlap-greedy stress ('a a' merges)
]


def test_train_matches_python_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    assert bpe_train(docs, 8) == py_bpe_train(TEXTS, 8)


def test_train_matches_reference_on_real_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    assert bpe_train(docs, 6) == py_bpe_train(texts, 6)


def test_train_early_stop_and_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    # single-char words have no pairs -> early stop, empty merges
    assert bpe_train(docs, 5) == []
    with pytest.raises(ValueError):
        bpe_train(docs, -1)


def test_batched_training_equals_sequential(spark):
    """bpe_train_batched is bit-identical to the sequential loop (and
    the python reference) at every max_batch — the selection rule only
    batches merges provably equal to greedy."""
    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        bpe_train_batched,
    )

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    expect = py_bpe_train(TEXTS, 12)
    for mb in (1, 3, 64):
        assert bpe_train_batched(docs, 12, max_batch=mb) == expect, mb


def test_batched_training_equals_sequential_on_real_docs(spark, sf_dir):
    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        bpe_train_batched,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    assert bpe_train_batched(docs, 25) == py_bpe_train(texts, 25)


def test_batched_training_small_top_m_stays_exact(spark):
    """A tiny collected window (top_m=3) forces the tail bound to do
    real work; results must still equal greedy."""
    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        bpe_train_batched,
    )

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    assert bpe_train_batched(docs, 10, top_m=3) == py_bpe_train(TEXTS, 10)


def test_local_training_equals_sequential(spark, sf_dir):
    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        bpe_train_local,
    )

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    assert bpe_train_local(docs, 12) == py_bpe_train(TEXTS, 12)
    real = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in real.select("text").collect()]
    assert bpe_train_local(real, 25) == py_bpe_train(texts, 25)
    with pytest.raises(ValueError, match="word types"):
        bpe_train_local(real, 5, max_types=3)


def test_local_training_fuzz_vs_reference(spark):
    """Seeded random corpora exercise the incremental pair-count
    maintenance (repeated pairs within a word, pair retirement,
    alphabet growth) against the transparent reference."""
    import random

    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        bpe_train_local,
    )

    rng = random.Random(7)
    alphabet = "abcde"
    for trial in range(6):
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(rng.randint(2, 6))
        ]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        assert bpe_train_local(docs, 15) == py_bpe_train(texts, 15), texts


def test_batched_fast_mode_is_deterministic_and_near_greedy(spark):
    """exact=False trades bit-equality for round count: deterministic,
    starts with greedy's argmax, produces valid merges."""
    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        bpe_train_batched,
    )

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    r1: list[int] = []
    fast = bpe_train_batched(docs, 12, round_log=r1, exact=False)
    assert fast == bpe_train_batched(docs, 12, exact=False)  # deterministic
    assert len(fast) == 12
    assert fast[0] == py_bpe_train(TEXTS, 1)[0]  # argmax always exact
    assert len(r1) < 12  # genuinely fewer rounds than merges
    # high overlap with the exact greedy merge set
    exact = set(py_bpe_train(TEXTS, 12))
    assert len(set(fast) & exact) >= 8


def test_select_safe_batch_rules():
    """The driver-side selection bound, on crafted candidate lists."""
    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        _select_safe_batch,
    )

    # the classic trap: (a,b) creates (x,ab) with count up to n(a,b),
    # so nothing at or below the toucher's 100 may batch with it
    assert _select_safe_batch(
        [("a", "b", 100), ("x", "a", 100), ("c", "d", 50)], 0, 64
    ) == []
    # disjoint candidates batch freely
    assert _select_safe_batch(
        [("a", "b", 100), ("c", "d", 90), ("e", "f", 80)], 0, 64
    ) == [("a", "b"), ("c", "d"), ("e", "f")]
    # shared FIRST symbols batch (only (x,a)/(b,y)/(a,b) counts move)
    assert _select_safe_batch(
        [("e", "r", 100), ("e", "s", 90), ("e", "d", 80)], 0, 64
    ) == [("e", "r"), ("e", "s"), ("e", "d")]
    # shared SECOND symbols batch
    assert _select_safe_batch(
        [("t", "h", 100), ("c", "h", 90)], 0, 64
    ) == [("t", "h"), ("c", "h")]
    # chains do not: (h,e) is a (b,y) form of accepted (t,h)
    assert _select_safe_batch(
        [("t", "h", 100), ("h", "e", 90), ("x", "y", 10)], 0, 64
    ) == [("t", "h")]
    # self-merge conflicts on both sides
    assert _select_safe_batch(
        [("e", "e", 100), ("x", "e", 90), ("z", "w", 10)], 0, 64
    ) == [("e", "e")]
    assert _select_safe_batch(
        [("e", "e", 100), ("e", "x", 90), ("z", "w", 10)], 0, 64
    ) == [("e", "e")]
    # a toucher bounds everything below it, not above
    assert _select_safe_batch(
        [("a", "b", 100), ("c", "d", 90), ("b", "x", 85), ("e", "f", 80)],
        0, 64,
    ) == [("a", "b"), ("c", "d")]
    # a candidate whose CONCAT equals an accepted symbol is a toucher
    assert _select_safe_batch(
        [("ab", "c", 100), ("a", "b", 90), ("d", "e", 50)], 0, 64
    ) == [("ab", "c")]
    # the tail bound of a truncated collection caps acceptance
    assert _select_safe_batch(
        [("a", "b", 100), ("c", "d", 60)], 60, 64
    ) == [("a", "b")]
    # max_batch truncates but keeps the prefix exact
    assert _select_safe_batch(
        [("a", "b", 100), ("c", "d", 90), ("e", "f", 80)], 0, 2
    ) == [("a", "b"), ("c", "d")]


def test_segment_matches_python_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    merges = py_bpe_train(TEXTS, 8)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == py_bpe_segment(t, merges), t


def test_segment_round_trip_reconstructs_words(spark):
    """Stripping END and concatenating tokens yields the original
    word stream regardless of the merge list."""
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    merges = py_bpe_train(TEXTS, 5)
    rows = bpe_segment(docs, merges).select("doc_id", "bpe_tokens").collect()
    for r in rows:
        rebuilt = "".join(r["bpe_tokens"]).replace(END, " ").strip()
        assert rebuilt == " ".join(
            re.findall(r"[a-z0-9]+", TEXTS[r["doc_id"]].lower())
        )


def test_segment_empty_doc_gets_empty_array(spark):
    docs = spark.createDataFrame(
        [(1, "???"), (2, "ok then")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment(docs, [("o", "k" + END)]).collect()
    }
    assert got[1] == []
    assert got[2] == ["ok" + END, "t", "h", "e", "n" + END]


def test_segment_is_row_local(spark):
    """Segmentation is a pure projection — no join, no exchange, no
    generate: the bracket-replace chain is per-row string work that
    scales embarrassingly at any corpus size."""
    docs = spark.createDataFrame(
        [(i, "low lower " * 20) for i in range(50)], "doc_id long, text string"
    )
    plan = (
        bpe_segment(docs, [("l", "o")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_segment_rejects_unsafe_or_oversized_merges(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        MAX_SEGMENT_MERGES,
        segment_sql,
    )

    docs = spark.createDataFrame([(1, "ok")], "doc_id long, text string")
    with pytest.raises(ValueError, match="invalid merge symbol"):
        bpe_segment(docs, [("a'", "b")])
    with pytest.raises(ValueError, match="invalid merge symbol"):
        segment_sql([("a]", "b")], "[a-z0-9]+")
    too_many = [("a", "b")] * (MAX_SEGMENT_MERGES + 1)
    with pytest.raises(ValueError, match="MAX_SEGMENT_MERGES"):
        bpe_segment(docs, too_many)


def test_arrow_segmentation_matches_expression_form(spark):
    """bpe_segment_arrow == bpe_segment on a small merge list, and
    handles a 200-merge list (past MAX_SEGMENT_MERGES) matching the
    python reference."""
    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        MAX_SEGMENT_MERGES,
        bpe_segment_arrow,
    )

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    small = py_bpe_train(TEXTS, 8)
    a = {r["doc_id"]: r["bpe_tokens"]
         for r in bpe_segment(docs, small).select("doc_id", "bpe_tokens").collect()}
    b = {r["doc_id"]: r["bpe_tokens"]
         for r in bpe_segment_arrow(docs, small).select("doc_id", "bpe_tokens").collect()}
    assert a == b

    sf = "/root/testdata/sf0.001"
    real = spark.read.parquet(f"{sf}/documents.parquet").limit(50)
    texts = [r["text"] for r in real.select("text").collect()]
    big = py_bpe_train(texts, 200)
    assert len(big) > MAX_SEGMENT_MERGES  # genuinely past the expression cap
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment_arrow(real, big).select("doc_id", "bpe_tokens").collect()
    }
    for r in real.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == py_bpe_segment(r["text"], big)

    with pytest.raises(ValueError, match="invalid merge symbol"):
        bpe_segment_arrow(docs, [("a[", "b")])


def test_probe_filter_truncates_not_filters_in_exact_mode():
    """Round-7 advice #1: the alphabet probe must TRUNCATE the exact
    batch at the first aliasing member, never drop it from the middle
    — members after an alias are unproven because sequential greedy
    WOULD apply the aliasing merge and its created counts can redirect
    every later pick."""
    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        _probe_filter,
    )

    batch = [("a", "b"), ("c", "d"), ("e", "f")]
    # alias in the middle: exact keeps only the proven prefix
    assert _probe_filter(batch, {"cd"}, exact=True) == [("a", "b")]
    # alias at the head: empty prefix -> caller applies argmax alone
    assert _probe_filter(batch, {"ab"}, exact=True) == []
    # no alias: untouched
    assert _probe_filter(batch, {"zz"}, exact=True) == batch
    # alias at the tail: prefix of two survives
    assert _probe_filter(batch, {"ef"}, exact=True) == [("a", "b"), ("c", "d")]
    # non-exact mode keeps the independent-member filter semantics
    assert _probe_filter(batch, {"cd"}, exact=False) == [("a", "b"), ("e", "f")]


def test_batched_training_exact_when_argmax_aliases(spark, monkeypatch):
    """Force the probe to see batch[0]'s concatenation as an existing
    symbol: the exact path must fall back to applying the argmax ALONE
    (a single merge is always sequential-exact) rather than dropping
    it and emitting lower-count members first."""
    import haensel_ams_data_engineer_challenge_spark.operators.bpe as bpe_mod

    calls = []
    real_probe = bpe_mod._probe_filter

    def spy(batch, existing, exact):
        # pretend the top merge's concat aliases an existing symbol on
        # the first multi-member round
        if not calls and len(batch) > 1:
            existing = set(existing) | {batch[0][0] + batch[0][1]}
        calls.append(len(batch))
        return real_probe(batch, existing, exact)

    monkeypatch.setattr(bpe_mod, "_probe_filter", spy)
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = bpe_mod.bpe_train_batched(docs, 8, max_batch=8)
    assert calls, "probe was never exercised"
    # applying the (synthetically) aliasing argmax alone IS sequential
    # greedy's move, so the full trajectory still matches the reference
    assert got == py_bpe_train(TEXTS, 8)
