"""Tokenizer-training statistics: vocab top-N and BPE pair counts."""

from __future__ import annotations

from collections import Counter

from haensel_ams_data_engineer_challenge_spark.operators.vocab import (
    bpe_pair_top,
    vocab_top_terms,
)

DOCS = [
    (1, "low lower lowest low low"),
    (2, "new newer new low low-end"),
    (3, ""),            # empty: contributes nothing
    (4, "x"),           # single token: terms yes, pairs no
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_tokens(text):
    import re

    return re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", text)


def test_vocab_matches_python_counter(spark):
    res = {r["term"]: (r["n_occurrences"], r["rank"])
           for r in vocab_top_terms(_df(spark), n=100).collect()}
    exp = Counter()
    for _id, t in DOCS:
        exp.update(_py_tokens(t))
    assert {t: c for t, (c, _r) in res.items()} == dict(exp)
    # rank order: count desc, term asc
    ordered = sorted(res.items(), key=lambda kv: kv[1][1])
    keys = [(-c, t) for t, (c, _r) in ordered]
    assert keys == sorted(keys)
    assert res["low"][0] == 5 and res["low"][1] == 1


def test_pair_counts_are_adjacent_bpe_pairs(spark):
    res = {r["term"]: r["n_occurrences"]
           for r in bpe_pair_top(_df(spark), n=100).collect()}
    exp = Counter()
    for _id, t in DOCS:
        toks = _py_tokens(t)
        exp.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    assert res == dict(exp)
    assert "low low" in res            # crosses the repeated word
    assert "low - end" not in res      # punctuation splits into 3 tokens
    assert "low -" in res


def test_topn_truncates_deterministically(spark):
    top2 = vocab_top_terms(_df(spark), n=2).collect()
    assert [r["rank"] for r in top2] == [1, 2]
    assert top2[0]["term"] == "low"


def test_topn_plan_has_no_global_sort(spark):
    """Top-N must be TakeOrdered (per-partition heap), never a full
    Sort + rank over the whole vocabulary."""
    plan = (
        vocab_top_terms(_df(spark), n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    # the only window runs over the already-limited n rows
    assert plan.index("TakeOrderedAndProject") > plan.index("Window")
