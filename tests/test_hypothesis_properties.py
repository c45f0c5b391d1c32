"""Hypothesis property tests: the distributed operators against
tiny pure-Python reference implementations on adversarial inputs
(duplicate timestamps, empty sides, single users, boundary gaps).

Examples are kept small and few — each example round-trips through
Spark. The value is input shapes the sf-testdata never produces.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, example, given, settings, strategies as st

from haensel_ams_data_engineer_challenge_spark.operators.asof import (
    journey_asof_join,
)
from haensel_ams_data_engineer_challenge_spark.operators.sessionize import sessionize

BASE = datetime(2024, 1, 1)

# few users + coarse offsets force collisions: same-ts ties, shared users
_user = st.integers(0, 2)
_offset = st.integers(0, 40)

_events = st.lists(
    st.tuples(_user, _offset, st.booleans()),  # (user, minutes, is_purchase)
    min_size=0,
    max_size=25,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _python_asof(events):
    """Reference: session -> earliest purchase of same user strictly
    after it (ties on conv_ts -> min *string* conv_id, matching the
    engine + DuckDB oracle which order the string column: '10' < '9'
    lexicographically)."""
    sessions = [(i, u, m) for i, (u, m, _) in enumerate(events)]
    convs = [(i, u, m) for i, (u, m, p) in enumerate(events) if p]
    out = {}
    for sid, su, sm in sessions:
        cands = [(cm, str(cid)) for cid, cu, cm in convs if cu == su and cm > sm]
        if cands:
            out[str(sid)] = min(cands)[1]
    return out


# pinned: ids '9' and '10' purchase at the same ts for the same user —
# int ordering picks 9, string ordering picks '10'; engine/oracle are
# string-ordered so the model must be too (round-2 judge repro).
@example([(0, 0, False)] * 9 + [(0, 1, True)] * 2)
@given(_events)
@SETTINGS
def test_asof_matches_python_reference(spark, events):
    if not events:
        return
    sess_rows = [
        (str(i), str(u), BASE + timedelta(minutes=m)) for i, (u, m, _) in enumerate(events)
    ]
    conv_rows = [
        (str(i), str(u), BASE + timedelta(minutes=m), 1.0)
        for i, (u, m, p) in enumerate(events)
        if p
    ]
    sessions = spark.createDataFrame(
        sess_rows, "session_id string, user_id string, ts timestamp_ntz"
    ).selectExpr(
        "session_id", "user_id", "ts",
        "date_format(ts, 'yyyy-MM-dd') as event_date",
        "date_format(ts, 'HH:mm:ss') as event_time",
        "'x' as channel_name",
        "0 as holder_engagement", "0 as closer_engagement",
        "0 as impression_interaction",
    )
    if conv_rows:
        convs = spark.createDataFrame(
            conv_rows, "conv_id string, user_id string, conv_ts timestamp_ntz, revenue double"
        )
    else:
        convs = spark.createDataFrame(
            [], "conv_id string, user_id string, conv_ts timestamp_ntz, revenue double"
        )
    got = {
        r.session_id: r.conv_id
        for r in journey_asof_join(sessions, convs).collect()
    }
    assert got == _python_asof(events)


def _python_sessionize(rows, gap=1800):
    out, state = {}, {}
    for eid, uid, ts in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        ep = int(ts.timestamp())
        last, n = state.get(uid, (None, 0))
        if last is None or ep - last > gap:
            n += 1
        state[uid] = (ep, n)
        out[eid] = f"{uid}-{n}"
    return out


@given(
    st.lists(
        st.tuples(_user, st.integers(0, 7200)),  # (user, seconds offset)
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_sessionize_matches_python_reference(spark, rows):
    data = [
        (i, u, BASE + timedelta(seconds=s)) for i, (u, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, user_id long, ts timestamp_ntz")
    got = {r.event_id: r.session_key for r in sessionize(df).collect()}
    assert got == _python_sessionize(data)


# ---------------------------------------------------------------------------
# round-6 operators: BPE round-trip, exact NTILE balance, BM25 invariants
# ---------------------------------------------------------------------------

_word = st.text(alphabet="ab1", min_size=1, max_size=5)
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_docs_strategy = st.lists(_doc, min_size=1, max_size=6)


@given(_docs_strategy, st.integers(0, 4))
@SETTINGS
def test_bpe_train_segment_reference_property(spark, texts, n_merges):
    """For ANY corpus over a tiny alphabet: the Spark-trained merge
    sequence equals the python reference's, and segmentation
    round-trips (tokens concatenate back to the word stream)."""
    import re as _re

    from tests.test_bpe import py_bpe_segment, py_bpe_train

    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        END,
        bpe_segment,
        bpe_train,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges)
    assert merges == py_bpe_train(texts, n_merges)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_bpe_segment(t, merges)
        rebuilt = "".join(got[i]).replace(END, " ").strip()
        assert rebuilt == " ".join(_re.findall(r"[a-z0-9]+", t.lower()))


@given(st.integers(1, 25), st.integers(1, 7), st.integers(1, 5))
@SETTINGS
def test_ntile_bucket_sizes_property(spark, n, q, mod):
    """Exact NTILE on ANY (n, q, tie-density): buckets are contiguous
    in rank order, sizes differ by at most 1, larger buckets first."""
    from collections import Counter

    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.operators.rank import (
        ntile_exact,
    )

    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % mod).cast("double").alias("v")
    )
    rows = ntile_exact(df, q, ["v", "k"]).collect()
    sizes = Counter(r["bucket"] for r in rows)
    assert sum(sizes.values()) == n
    vals = [sizes[b] for b in sorted(sizes)]
    assert max(vals) - min(vals) <= 1
    assert vals == sorted(vals, reverse=True)
    # bucket is monotone in the (v, k) total order
    ordered = sorted(rows, key=lambda r: (r["v"], r["k"]))
    buckets = [r["bucket"] for r in ordered]
    assert buckets == sorted(buckets)


@given(_docs_strategy)
@SETTINGS
def test_bm25_invariants_property(spark, texts):
    """BM25 on ANY corpus/query draw: scores positive and ranked
    descending per query, n_matched <= distinct query terms, top-k
    bound respected, self excluded."""
    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.operators.retrieval import (
        bm25_topk,
        search_tokens,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    queries = docs.select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(search_tokens("text"), 1, 4)).alias("text"),
    )
    rows = bm25_topk(docs, queries, k=3).collect()
    qterms = {
        r["query_id"]: len(set(r["text"].split()))
        for r in queries.collect()
    }
    per_q = {}
    for r in rows:
        assert r["doc_id"] != r["query_id"]
        assert r["score"] > 0.0
        assert 1 <= r["n_matched"] <= max(qterms[r["query_id"]], 1)
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert len(rs) <= 3
        rs.sort(key=lambda r: r["rank"])
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# cross-document sequence packing (round 8): fuzz the global-stream
# slicing against a trivially-correct python model on adversarial doc
# mixes (empty docs, single tokens, seq_len boundaries)
# ---------------------------------------------------------------------------

_doc_words = st.lists(
    st.sampled_from(["aa", "b", "ccc", "dd"]), min_size=0, max_size=9
)
_corpus = st.lists(_doc_words, min_size=0, max_size=8)


def _python_pack(docs_words, seq_len, sep="<|doc|>"):
    stream = []
    for ws in docs_words:
        if ws:
            stream.extend(ws)
            stream.append(sep)
    seqs = {}
    for pos, tok in enumerate(stream):
        seqs.setdefault(pos // seq_len, []).append(tok)
    return {
        sid: (" ".join(toks), len(toks)) for sid, toks in seqs.items()
    }


@example([["aa"] * 4, [], ["b"]], 5)       # boundary: exactly seq_len
@example([[], [], []], 4)                  # all-empty corpus
@given(_corpus, st.integers(2, 7))
@SETTINGS
def test_pack_sequences_matches_python_model(spark, docs_words, seq_len):
    from haensel_ams_data_engineer_challenge_spark.operators.pack import (
        PACK_SEP,
        pack_sequences,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    docs = spark.createDataFrame(rows, "doc_id long, text string") if rows else (
        spark.createDataFrame([], "doc_id long, text string")
    )
    got = {
        r["seq_id"]: (r["seq_text"], r["n_tokens"])
        for r in pack_sequences(docs, seq_len=seq_len).collect()
    }
    exp = _python_pack(docs_words, seq_len, PACK_SEP)
    assert got == exp


# ---------------------------------------------------------------------------
# NB classifier (round 8): fuzz the quantized argmax against the
# python model on tiny adversarial corpora (single-class, shared
# vocabularies, tie-heavy scores)
# ---------------------------------------------------------------------------

_nb_doc = st.tuples(
    st.sampled_from(["x", "y"]),                       # label
    st.lists(st.sampled_from(["t0", "t1", "t2"]), min_size=1, max_size=5),
)


@example([("x", ["t0"]), ("y", ["t0"])])               # pure tie -> label order
@given(st.lists(_nb_doc, min_size=1, max_size=10))
@SETTINGS
def test_nb_matches_python_model(spark, labeled):
    import math
    from collections import Counter, defaultdict

    from haensel_ams_data_engineer_challenge_spark.operators.classify import (
        nb_classify_docs,
    )

    rows = [(i, lbl, " ".join(ws)) for i, (lbl, ws) in enumerate(labeled)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["nb_pred"], r["nb_logp"])
        for r in nb_classify_docs(docs).collect()
    }

    counts, ndoc = defaultdict(Counter), Counter()
    toks = {i: ws for i, (lbl, ws) in enumerate(labeled)}
    for i, (lbl, ws) in enumerate(labeled):
        ndoc[lbl] += 1
        counts[lbl].update(ws)
    vocab = {t for c in counts.values() for t in c}
    v, ndocs = len(vocab), sum(ndoc.values())
    cls = {
        c: (
            math.floor(math.log(ndoc[c] / ndocs) * 1e6),
            math.floor(math.log(1.0 / (sum(counts[c].values()) + v)) * 1e6),
            sum(counts[c].values()) + v,
        )
        for c in counts
    }
    lnp = {
        (c, t): math.floor(math.log((k + 1.0) / cls[c][2]) * 1e6)
        for c, cnt in counts.items() for t, k in cnt.items()
    }
    exp = {}
    for i, ws in toks.items():
        scored = []
        for c, (prior_s, lnp0_s, _d) in cls.items():
            s = prior_s + sum(lnp.get((c, t), lnp0_s) for t in ws)
            scored.append((-s, c))
        ns, c = min(scored)
        exp[i] = (c, -ns / 1e6)
    assert got == exp


# ---------------------------------------------------------------------------
# feature-hash embedder (round 8): fuzz exact signed-count vectors
# against the python model
# ---------------------------------------------------------------------------

_he_doc = st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                   min_size=0, max_size=8)


@example([["aa", "aa", "bb"], []])
@given(st.lists(_he_doc, min_size=1, max_size=6))
@SETTINGS
def test_hash_embed_matches_python_model(spark, corpora):
    import hashlib

    import haensel_ams_data_engineer_challenge_spark.operators.similarity as S

    dim = 8
    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["vec_id"]: r["embedding"]
           for r in S.hash_embed(docs, dim=dim).collect()}

    exp = {}
    for i, ws in enumerate(corpora):
        if not ws:
            continue
        v = [0.0] * dim
        for t in ws:
            b = int(hashlib.md5(f"he|{t}".encode()).hexdigest()[:15], 16) % dim
            s = 1 if int(hashlib.md5(f"hs|{t}".encode()).hexdigest()[:1], 16) % 2 == 0 else -1
            v[b] += s
        exp[i] = v
    assert got == exp


# ---------------------------------------------------------------------------
# round 9: WAV header parse — encode/parse roundtrip over arbitrary
# geometry, and arbitrary byte noise never crashes (returns None or a
# consistent parse; the decode ladder depends on totality)
# ---------------------------------------------------------------------------


@given(
    channels=st.integers(1, 8),
    rate=st.integers(1, 192_000),
    bits=st.sampled_from([8, 16, 24, 32]),
    n_samples=st.integers(0, 10_000_000),
)
@SETTINGS
def test_wav_header_roundtrip(channels, rate, bits, n_samples):
    import struct

    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_audio_header,
    )

    block = channels * (bits // 8)
    data_size = n_samples * block
    payload = (
        b"RIFF" + struct.pack("<I", (36 + data_size) & 0xFFFFFFFF) + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                      rate * block & 0xFFFFFFFF, block, bits)
        + b"data" + struct.pack("<I", data_size & 0xFFFFFFFF)
    )
    parsed = parse_audio_header(payload)
    assert parsed == (
        "wav", channels, rate, bits, (data_size & 0xFFFFFFFF) // block
    )


@given(st.binary(min_size=0, max_size=200))
@SETTINGS
def test_wav_parser_total_on_noise(payload):
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        parse_audio_header,
        parse_image_header,
    )

    # must never raise — the ladder's first rung sees every payload
    parse_audio_header(payload)
    parse_image_header(payload)


# ---------------------------------------------------------------------------
# round 9: global training-order shuffle — permutation property over
# adversarial id sets (sparse, negative, colliding ranges)
# ---------------------------------------------------------------------------


@given(
    ids=st.sets(st.integers(-1000, 1000), min_size=1, max_size=40),
    n_shards=st.integers(1, 5),
)
@SETTINGS
def test_global_shuffle_permutation_property(spark, ids, n_shards):
    from haensel_ams_data_engineer_challenge_spark.operators.sampling import (
        global_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in sorted(ids)], "doc_id long")
    out = global_shuffle(df, n_shards=n_shards, seed="h").collect()
    assert {r.doc_id for r in out} == ids
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < n_shards
        by_shard.setdefault(r.shard, []).append(r.pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
