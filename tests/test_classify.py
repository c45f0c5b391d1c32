"""Multinomial NB classifier: python-reference parity, full-grid
scoring (classes sharing no token), determinism."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from haensel_ams_data_engineer_challenge_spark.operators.classify import (
    nb_classify_docs,
)

DOCS = [
    (1, "en", "the cat sat on the mat"),
    (2, "en", "the dog sat quietly"),
    (3, "de", "der hund sitzt auf der matte"),
    (4, "de", "die katze sitzt"),
    (5, "fr", "le chat est assis"),
    (6, "en", "???"),                      # zero tokens -> absent
    (7, "en", "zzz qqq xxx"),              # tokens unseen by de/fr
]


def _py_nb(rows):
    toks = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, _l, t in rows}
    labels = {i: l for i, l, _t in rows}
    docs = {i: ts for i, ts in toks.items() if ts}
    counts = defaultdict(Counter)
    ndoc = Counter()
    for i, ts in docs.items():
        ndoc[labels[i]] += 1
        counts[labels[i]].update(ts)
    vocab = {t for c in counts.values() for t in c}
    v, ndocs = len(vocab), sum(ndoc.values())
    cls = {}
    for c in counts:
        ntok = sum(counts[c].values())
        cls[c] = (
            math.floor(math.log(ndoc[c] / ndocs) * 1e6),
            math.floor(math.log(1.0 / (ntok + v)) * 1e6),
            ntok + v,
        )
    lnp = {
        (c, t): math.floor(math.log((k + 1.0) / cls[c][2]) * 1e6)
        for c, cnt in counts.items() for t, k in cnt.items()
    }
    out = {}
    for i, ts in docs.items():
        scored = []
        for c, (prior_s, lnp0_s, _d) in cls.items():
            s = prior_s
            for t in ts:
                s += lnp.get((c, t), lnp0_s)
            scored.append((-s, c))
        ns, c = min(scored)
        out[i] = (c, -ns / 1e6)
    return out


def test_nb_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["nb_pred"], r["nb_logp"])
        for r in nb_classify_docs(docs).collect()
    }
    exp = _py_nb(DOCS)
    assert set(got) == set(exp) == {1, 2, 3, 4, 5, 7}
    for k in exp:
        assert got[k] == exp[k], k  # bitwise — quantized scores


def test_nb_matches_reference_on_real_docs(spark, sf_dir):
    real = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = [(r["doc_id"], r["lang"], r["text"])
            for r in real.select("doc_id", "lang", "text").collect()]
    exp = _py_nb(rows)
    got = {
        r["doc_id"]: (r["nb_pred"], r["nb_logp"])
        for r in nb_classify_docs(real).collect()
    }
    assert got == exp


def test_nb_separates_disjoint_vocabularies(spark):
    """Classes with disjoint vocabularies classify their own docs
    correctly — the sanity floor for any classifier filter."""
    rows = []
    for i in range(20):
        rows.append((i, "a", f"alpha beta gamma token{i % 3}"))
        rows.append((100 + i, "b", f"delta epsilon zeta other{i % 3}"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r["nb_pred"] for r in nb_classify_docs(docs).collect()}
    assert all(got[i] == "a" for i in range(20))
    assert all(got[100 + i] == "b" for i in range(20))


def test_nb_partitioning_invariance(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    a = sorted(nb_classify_docs(docs.coalesce(1)).collect())
    b = sorted(nb_classify_docs(docs.repartition(7)).collect())
    assert a == b


def test_nb_pivot_and_grid_paths_agree(spark, monkeypatch):
    """The fused few-class scoring path and the general grid path are
    bit-identical (same quantized integers, same tie-break)."""
    import haensel_ams_data_engineer_challenge_spark.operators.classify as C

    docs = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    fast = sorted(nb_classify_docs(docs).collect())
    monkeypatch.setattr(C, "NB_PIVOT_MAX_CLASSES", 0)  # force grid
    slow = sorted(nb_classify_docs(docs).collect())
    assert fast == slow
