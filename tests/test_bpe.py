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
