"""Cross-document sequence packing (operators/pack.pack_sequences,
round-7 verdict #2) + the rank.global_prefix_sum machinery it rides.

The oracle gate pins (seq_id, n_tokens, md5(seq_text)) against the
DuckDB twin; these tests pin the rest of the contract: exact stream
reconstruction, the fixed-length guarantee, n_docs, zero-token-doc
exclusion, and bit-stability across input partitionings.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.functions.text import BPE_ISH_PATTERN
from haensel_ams_data_engineer_challenge_spark.operators.pack import (
    PACK_SEP,
    pack_sequences,
)
from haensel_ams_data_engineer_challenge_spark.operators.rank import (
    global_prefix_sum,
)


def _docs(spark, texts_by_id):
    return spark.createDataFrame(
        sorted(texts_by_id.items()), "doc_id long, text string"
    )


def _ref_stream(texts_by_id):
    """The packed global stream: (doc_id, token) in doc_id order with
    one separator per non-empty doc."""
    out = []
    for i, t in sorted(texts_by_id.items()):
        toks = re.findall(BPE_ISH_PATTERN, t)
        if toks:
            for tok in toks + [PACK_SEP]:
                out.append((i, tok))
    return out


CORPUS = {i: " ".join(f"w{i}x{j}" for j in range(1 + (i * 13) % 17)) for i in range(30)}
CORPUS[77] = ""          # zero tokens: contributes nothing, not even a sep
CORPUS[78] = "   \t  "   # whitespace-only: same


def test_reconstructs_the_concatenated_stream_exactly(spark):
    L = 16
    rows = pack_sequences(_docs(spark, CORPUS), seq_len=L).orderBy("seq_id").collect()
    stream = _ref_stream(CORPUS)
    rebuilt = " ".join(r["seq_text"] for r in rows)
    assert rebuilt == " ".join(tok for _, tok in stream)
    assert [r["seq_id"] for r in rows] == list(range(len(rows)))
    assert sum(r["n_tokens"] for r in rows) == len(stream)


def test_every_sequence_full_except_possibly_the_last(spark):
    L = 16
    rows = pack_sequences(_docs(spark, CORPUS), seq_len=L).orderBy("seq_id").collect()
    stream_len = len(_ref_stream(CORPUS))
    for r in rows[:-1]:
        assert r["n_tokens"] == L
        assert len(r["seq_text"].split(" ")) == L
    assert rows[-1]["n_tokens"] == stream_len - L * (len(rows) - 1)


def test_n_docs_counts_contributing_documents(spark):
    L = 16
    rows = pack_sequences(_docs(spark, CORPUS), seq_len=L).collect()
    stream = _ref_stream(CORPUS)
    expect = {}
    for p, (d, _) in enumerate(stream):
        expect.setdefault(p // L, set()).add(d)
    assert {r["seq_id"]: r["n_docs"] for r in rows} == {
        s: len(ds) for s, ds in expect.items()
    }


def test_bit_stable_across_input_partitionings(spark):
    a = pack_sequences(_docs(spark, CORPUS), seq_len=10).orderBy("seq_id").collect()
    b = (
        pack_sequences(_docs(spark, CORPUS).repartition(13), seq_len=10)
        .orderBy("seq_id")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_short_docs_share_a_sequence_no_padding_waste(spark):
    """The point of packing: many short docs -> few full sequences."""
    # 4 alpha tokens + sep each (digits would split into extra tokens
    # under the BPE-ish regex)
    docs = {i: f"tiny doc number {'x' * (i + 1)}" for i in range(10)}
    rows = pack_sequences(_docs(spark, docs), seq_len=25).orderBy("seq_id").collect()
    assert len(rows) == 2            # 50 tokens -> 25 + 25
    assert rows[0]["n_docs"] == 5    # five whole docs in sequence 0
    assert rows[0]["n_tokens"] == 25 and rows[1]["n_tokens"] == 25


def test_doc_split_across_boundary_keeps_token_order(spark):
    # 7 alpha tokens + sep each -> doc 1 spans [0, 8), doc 2 [8, 16)
    docs = {
        1: " ".join("a" * (j + 1) for j in range(7)),
        2: " ".join("b" * (j + 1) for j in range(7)),
    }
    rows = pack_sequences(_docs(spark, docs), seq_len=5).orderBy("seq_id").collect()
    stream = [t for _, t in _ref_stream(docs)]
    assert [r["seq_text"].split(" ") for r in rows] == [
        stream[i : i + 5] for i in range(0, len(stream), 5)
    ]
    # the boundary sequence carries pieces of both docs
    assert rows[1]["n_docs"] == 2


def test_seq_len_validation(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, {1: "x"}), seq_len=0)


def test_global_prefix_sum_matches_single_window_form(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 11 + 1) for i in range(200)], "k long, w long"
    ).repartition(9)
    got = {
        r["k"]: r["p"]
        for r in global_prefix_sum(df, ["k"], "w", out_col="p").collect()
    }
    expect, run = {}, 0
    for k in range(200):
        expect[k] = run
        run += (k * 37) % 11 + 1
    assert got == expect


def test_pack_sequences_over_existing_token_column(spark):
    """tokens_col packs a pre-segmented array (the learned-tokenizer
    hand-off) — equal to packing the same arrays reconstructed as
    whitespace text when tokens are regex-clean."""
    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.operators.pack import (
        pack_sequences,
    )

    rows = [
        (i, [f"tok{chr(97 + i)}{chr(97 + j)}" for j in range(5 + i)])
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, bpe_tokens array<string>")
    via_col = sorted(
        tuple(r) for r in pack_sequences(
            docs, seq_len=7, tokens_col="bpe_tokens"
        ).collect()
    )
    text_docs = docs.select(
        "doc_id", F.array_join("bpe_tokens", " ").alias("text")
    )
    via_text = sorted(
        tuple(r) for r in pack_sequences(text_docs, seq_len=7).collect()
    )
    assert via_col == via_text
    # docs with empty token arrays contribute nothing
    docs2 = docs.unionByName(
        spark.createDataFrame([(99, [])], "doc_id long, bpe_tokens array<string>")
    )
    again = sorted(
        tuple(r) for r in pack_sequences(
            docs2, seq_len=7, tokens_col="bpe_tokens"
        ).collect()
    )
    assert again == via_col
