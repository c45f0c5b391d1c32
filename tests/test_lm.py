"""Unigram LM scoring: python-reference parity, nulls, determinism."""

from __future__ import annotations

import math
import re
from collections import Counter

from haensel_ams_data_engineer_challenge_spark.operators.lm import (
    unigram_doc_scores,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "???"),               # no [a-z0-9]+ tokens -> absent from output
    (4, "cat cat cat"),
]


def _py_scores():
    toks = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in DOCS}
    c = Counter(t for ts in toks.values() for t in ts)
    n, v = sum(c.values()), len(c)
    lnp_s = {t: math.floor(math.log((k + 1.0) / (n + v)) * 1e6) for t, k in c.items()}
    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        lp = sum(lnp_s[t] for t in ts) / 1e6
        out[i] = (lp, -lp / len(ts))
    return out


def test_unigram_scores_match_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["lm_logprob"], r["lm_xent"])
        for r in unigram_doc_scores(docs).collect()
    }
    exp = _py_scores()
    assert set(got) == set(exp) == {1, 2, 4}
    for k in exp:
        assert got[k] == exp[k], k  # bitwise — quantized contributions


def test_repetitive_doc_scores_lower_xent(spark):
    """'cat cat cat' repeats the corpus-common token — lower mean
    negative log-likelihood than the mixed-vocab docs."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["lm_xent"] for r in unigram_doc_scores(docs).collect()}
    assert got[4] < got[2]


def test_partitioning_invariance(spark):
    """Quantized contributions sum exactly in any order: 1 vs 7
    partitions give bit-identical scores."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(unigram_doc_scores(docs.coalesce(1)).collect())
    b = sorted(unigram_doc_scores(docs.repartition(7)).collect())
    assert a == b
