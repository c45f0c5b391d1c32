"""Byte-level BPE (operators/bpe_bytes.py, round 15 verdict #1): the
GPT-2/tiktoken dialect — scanner bit-equal to the published split
pattern, byte<->unicode table pins, training vs a transparent python
reference, sequential == min-rank encoder equivalence on trained merge
lists, lossless round-trip on unicode-heavy text, and the DuckDB twin
bit-equal to the Arrow segmenter."""

from __future__ import annotations

import random
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators import bpe_bytes as BB
from haensel_ams_data_engineer_challenge_spark.operators.bpe import greedy_merges

#: unicode-heavy fixture corpus: emoji, CJK, mixed scripts, combining
#: marks, contractions, exotic whitespace, number categories beyond
#: Nd, byte-boundary splits (multi-byte UTF-8 everywhere).
FIXTURES = [
    "Hello world",
    "  lots   of space",
    "don't stop, they're 'll've here",
    "a\n\nb\tc\r\nd",
    "x \xa0 y z",
    "C'EST UNE PHRASE",
    "num 42nd and ① Ⅷ ٣ ３",
    "日本語のテキストと English が混在",
    "emoji 😀🎉 clusters 👩‍🔬 too",
    "München straße àéîõü",
    "price: €5.99! (50%)",
    "x  's", "x  'sand", "x  's42", "x  'llama and 'more",
    "café  'tis the season",
    "trailing space ",
    "  'd  've x",
    "", " ", "   ", "'", "' '", "\n", "ÿ", " ogham ",
    "ẞuͤbeŕ combining",
]


def _naive_segment(text: str, merges) -> list[str]:
    """Transparent reference: merges applied per pre-token in learned
    order, greedy left-to-right, one scan per merge."""
    toks: list[str] = []
    for w in BB.gpt2_pre_tokenize(text):
        syms = list(BB.encode_pretoken(w))
        for a, b in merges:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        toks.extend(syms)
    return toks


def _minrank_segment(text: str, merges) -> list[str]:
    """The production encoder loop (GPT-2 encoder.py shape):
    repeatedly merge the lowest-rank adjacent pair."""
    ranks = {p: i for i, p in enumerate(merges)}
    toks: list[str] = []
    for w in BB.gpt2_pre_tokenize(text):
        syms = list(BB.encode_pretoken(w))
        while len(syms) >= 2:
            best = min(
                (
                    (ranks[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in ranks
                ),
                default=None,
            )
            if best is None:
                break
            a, b = merges[best[0]]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


def _py_train(texts, n_merges):
    cnt: Counter[str] = Counter()
    for t in texts:
        for w in BB.gpt2_pre_tokenize(t):
            cnt[BB.encode_pretoken(w)] += 1
    ptoks = sorted(cnt)
    return greedy_merges(
        [list(p) for p in ptoks], [cnt[p] for p in ptoks], n_merges
    )


# ---------------------------------------------------------------------------
# pre-tokenizer + byte table
# ---------------------------------------------------------------------------


def test_scanner_matches_published_pattern():
    """The scanner is bit-equal to the published GPT-2 split pattern
    under the regex engine GPT-2's own encoder used — fixtures plus a
    whitespace/contraction-heavy fuzz sweep."""
    regex = pytest.importorskip("regex")
    pat = regex.compile(BB.GPT2_SPLIT_PATTERN)
    for t in FIXTURES:
        assert pat.findall(t) == BB.gpt2_pre_tokenize(t), repr(t)
    alphabet = list("ab N'stremvld.,!?-09①é中😀") + [
        "\t", "\n", " ", "\xa0", "\x85", "　", "'",
    ]
    rng = random.Random(15)
    for _ in range(3000):
        s = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 24))
        )
        assert pat.findall(s) == BB.gpt2_pre_tokenize(s), repr(s)


def test_scanner_invariants():
    for t in FIXTURES:
        toks = BB.gpt2_pre_tokenize(t)
        assert "".join(toks) == t  # partition, nothing lost
        assert all(toks)  # no empty pre-tokens


def test_byte_unicode_table_pins():
    """The canonical GPT-2 map: identity on printable latin-1, shifted
    codepoints for the rest in byte order, a 256-value bijection."""
    tbl = BB.byte_unicode_table()
    assert len(tbl) == 256 and len(set(tbl.values())) == 256
    assert tbl[ord("A")] == "A" and tbl[ord("~")] == "~"
    assert tbl[0x20] == "Ġ"  # space -> Ġ
    assert tbl[0x0A] == "Ċ"  # newline -> Ċ
    assert tbl[0x00] == "Ā"
    assert tbl[0xFF] == "ÿ"
    # every mapped char is printable (no whitespace, no controls)
    assert all(not u.isspace() for u in tbl.values())


def test_round_trip_lossless():
    """decode(segment(text)) == text for every fixture, with and
    without merges — the no-OOV property of the 256-byte alphabet."""
    merges = _py_train(FIXTURES, 24)
    for t in FIXTURES:
        assert BB.decode_byte_tokens(_naive_segment(t, [])) == t
        assert BB.decode_byte_tokens(_naive_segment(t, merges)) == t


def test_sequential_equals_minrank_on_trained_merges():
    """For TRAINED merge lists (each symbol built by earlier merges),
    learned-order sequential application == the min-rank encoder loop
    production tokenizers run."""
    merges = _py_train(FIXTURES, 32)
    for t in FIXTURES:
        assert _naive_segment(t, merges) == _minrank_segment(t, merges)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def test_train_local_matches_python_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the dog ate the cat's hat",
        "don't look  back",
        "日本語 text 日本語 text",
        "numbers 123 123 999",
    ] * 3
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    want = _py_train(texts, 12)
    got = BB.bpe_train_bytes_local(docs, 12)
    assert got == want


def test_train_distributed_matches_local(spark):
    texts = [
        "aaa bbb aaa ccc", "aaa bbb ddd", "x 'tis x 'tis", "ééé ééé",
    ] * 2
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(5)
    local = BB.bpe_train_bytes_local(docs, 8)
    dist = BB.bpe_train_bytes(docs, 8)
    assert dist == local == _py_train(texts, 8)


def test_train_rejects_negative(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        BB.bpe_train_bytes(docs, -1)
    with pytest.raises(ValueError):
        BB.bpe_train_bytes_local(docs, -1)


def test_train_local_type_cap(spark):
    docs = spark.createDataFrame(
        [(1, "many distinct words here now")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="pre-token types"):
        BB.bpe_train_bytes_local(docs, 2, max_types=3)


# ---------------------------------------------------------------------------
# segmentation: Arrow stage + DuckDB twin
# ---------------------------------------------------------------------------


def test_segment_arrow_matches_reference_and_twin(spark):
    merges = _py_train(FIXTURES, 16)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURES)], "doc_id long, text string"
    ).repartition(3)
    out = {
        r["doc_id"]: (r["bpe_tokens"], r["hex"])
        for r in BB.bpe_segment_bytes_arrow(
            docs, merges, hex_col="hex"
        ).collect()
    }
    assert len(out) == len(FIXTURES)
    for i, t in enumerate(FIXTURES):
        want = _naive_segment(t, merges)
        assert out[i][0] == want, repr(t)
        assert out[i][1] == [BB.token_bytes(x).hex() for x in want]
        assert BB.decode_byte_tokens(out[i][0]) == t

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(FIXTURES)))
        + ") t(doc_id, text)",
        list(FIXTURES),
    )
    sql = (
        "WITH " + BB.segment_bytes_sql(merges)
        + " SELECT doc_id, bpe_tokens_hex FROM bb_seg ORDER BY doc_id"
    )
    for i, got in con.execute(sql).fetchall():
        assert got == out[i][1], repr(FIXTURES[i])


def test_segment_hex_twin_fuzz():
    """SQL twin == python reference over a whitespace/contraction fuzz
    corpus (the RE2 lookahead repair's adversarial surface)."""
    rng = random.Random(99)
    alphabet = list("ab'stremvld .,") + ["\t", "\n", " ", "\xa0", "　"]
    corpus = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(300)
    ]
    merges = _py_train(corpus, 10)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(corpus)))
        + ") t(doc_id, text)",
        corpus,
    )
    sql = (
        "WITH " + BB.segment_bytes_sql(merges)
        + " SELECT doc_id, bpe_tokens_hex FROM bb_seg ORDER BY doc_id"
    )
    for i, got in con.execute(sql).fetchall():
        want = [
            BB.token_bytes(x).hex()
            for x in _naive_segment(corpus[i], merges)
        ]
        assert got == want, repr(corpus[i])


def test_merges_to_hex():
    # symbols live in byte-unicode space: 'é' (U+00E9) is the single
    # BYTE 0xe9, 'Ġ' the space byte; a two-byte merged symbol like
    # 'Ã©' (UTF-8 of é seeded as two symbols, then merged) is 'c3a9'
    assert BB.merges_to_hex([("Ġ", "s"), ("é", "r")]) == [
        ("20", "73"), ("e9", "72")
    ]
    assert BB.merges_to_hex([("Ã©", "Ġ")]) == [("c3a9", "20")]
    assert BB.encode_pretoken("é") == "Ã©"


# ---------------------------------------------------------------------------
# trainer hand-off: tokenize -> pack -> shards speaks the byte dialect
# ---------------------------------------------------------------------------


def test_pack_and_shards_on_byte_tokens(spark, tmp_path):
    from haensel_ams_data_engineer_challenge_spark.operators.pack import (
        pack_sequences,
    )
    from haensel_ams_data_engineer_challenge_spark.operators.sinks import (
        write_training_shards,
    )

    texts = ["Pack these  docs tightly!", "don't pad 'em", "短い文書です"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = _py_train(texts, 6)
    seg = BB.bpe_segment_bytes_arrow(docs, merges)
    seqs = pack_sequences(seg, seq_len=8, tokens_col="bpe_tokens")
    total = sum(
        len(_naive_segment(t, merges)) + 1 for t in texts  # +1 sep each
    )
    got = seqs.agg(F.sum("n_tokens")).collect()[0][0]
    assert got == total
    manifest = write_training_shards(
        seqs, str(tmp_path / "shards"), 4, token_col="n_tokens"
    )
    assert manifest.agg(F.sum("n_tokens")).collect()[0][0] == total


def test_cli_byte_level_learn_tokenize_pack(spark, tmp_path, capsys):
    """Product surface e2e: corpus --learn-bpe --byte-level-bpe writes
    a dialect-tagged merges file; tokenize and pack auto-detect it and
    run the byte segmenter; tokens reconstruct the EXACT original text
    (case + whitespace preserved — the word dialect cannot do this)."""
    import json

    from haensel_ams_data_engineer_challenge_spark.__main__ import main

    nouns = ["Fox", "Dog", "River", "Stone", "Cloud", "Tree", "Boat",
             "Lamp", "Road", "Hill", "Bird", "Field"]

    def good(i):
        return " ".join(
            f"The {nouns[(i + j) % len(nouns)]}{i}{j} and a "
            f"{nouns[(i + 2 * j + 1) % len(nouns)]}{i} weren't there"
            for j in range(30)
        )

    src = str(tmp_path / "sfdir")
    rows = [(i, good(i), "en", "web", len(good(i))) for i in range(6)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{src}/documents.parquet")

    work = str(tmp_path / "wd")
    assert main([
        "corpus", "--sf-dir", src, "--work-dir", work,
        "--learn-bpe", "8", "--byte-level-bpe",
        "--train", "1.0", "--val", "0.0", "--test", "0.0",
    ]) == 0
    capsys.readouterr()
    payload = json.load(open(f"{work}/bpe_merges.json"))
    assert payload["dialect"] == "byte-level"
    assert len(payload["merges"]) == 8
    # the published file pair ships alongside (round 15): standard
    # loaders consume WORK_DIR/tokenizer without engine code
    exp_merges, exp_vocab = BB.load_gpt2_tokenizer(f"{work}/tokenizer")
    assert exp_merges == [tuple(m) for m in payload["merges"]]
    assert len(exp_vocab) == 256 + 8

    assert main([
        "tokenize", "--docs-parquet", f"{work}/corpus",
        "--merges-json", f"{work}/bpe_merges.json", "--work-dir", work,
    ]) == 0
    out = capsys.readouterr().out
    assert "dialect=byte-level" in out
    back = spark.read.parquet(f"{work}/tokenized")
    for r in back.select("text", "bpe_tokens").limit(8).collect():
        assert BB.decode_byte_tokens(r["bpe_tokens"]) == r["text"]

    assert main([
        "pack", "--docs-parquet", f"{work}/corpus", "--work-dir",
        str(tmp_path / "pk"), "--seq-len", "32", "--n-shards", "2",
        "--merges-json", f"{work}/bpe_merges.json",
    ]) == 0
    out = capsys.readouterr().out
    assert "seqs=" in out and "shards" in out
    manifest = spark.read.parquet(str(tmp_path / "pk" / "manifest"))
    assert manifest.count() >= 1


def test_fused_bpe_arms_equal_separate(spark):
    """The registry's fused Arrow stage (bpe_arrow + bpe_bytes in one
    chain) emits EXACTLY the rows the two separate arms produce — the
    round-14 fusion discipline's pin, so the oracle twins stay
    untouched."""
    from haensel_ams_data_engineer_challenge_spark.operators.bpe import (
        bpe_segment_arrow,
    )

    word_merges = [("e", "r</w>"), ("t", "o"), ("a", "s"), ("i", "n")]
    byte_merges = _py_train(FIXTURES, 10)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURES)],
        "doc_id long, text string",
    ).repartition(3)

    fused = {
        (r["method"], r["doc_id"]): (r["fingerprint"], r["n_tokens"])
        for r in BB.fused_bpe_arms(
            docs, word_merges, byte_merges
        ).collect()
    }
    sep_word = {
        ("bpe_arrow", r["doc_id"]): (r["fp"], r["n"])
        for r in bpe_segment_arrow(docs, word_merges)
        .select(
            "doc_id",
            F.md5(F.concat_ws(" ", "bpe_tokens")).alias("fp"),
            F.size("bpe_tokens").cast("long").alias("n"),
        )
        .collect()
    }
    sep_bytes = {
        ("bpe_bytes", r["doc_id"]): (r["fp"], r["n"])
        for r in BB.bpe_segment_bytes_arrow(
            docs, byte_merges, hex_col="hex"
        )
        .select(
            "doc_id",
            F.md5(F.concat_ws(" ", "hex")).alias("fp"),
            F.size("hex").cast("long").alias("n"),
        )
        .collect()
    }
    assert fused == {**sep_word, **sep_bytes}
    assert len(fused) == 2 * len(FIXTURES)


# ---------------------------------------------------------------------------
# batched byte trainer + vocab ids + the published file format
# ---------------------------------------------------------------------------


def test_train_bytes_batched_bit_equal(spark):
    texts = [
        "the cat sat on the mat", "the dog ate the cat's hat",
        "don't look  back now", "ééé über 42nd",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(4)
    rounds: list[int] = []
    batched = BB.bpe_train_bytes_batched(docs, 14, round_log=rounds)
    assert batched == BB.bpe_train_bytes(docs, 14) == _py_train(texts, 14)
    assert sum(rounds) == len(batched) and len(rounds) <= len(batched)
    with pytest.raises(ValueError):
        BB.bpe_train_bytes_batched(docs, -1)


def test_byte_vocab_ids():
    merges = [("Ġ", "s"), ("e", "r"), ("Ġs", "er")]
    v = BB.byte_vocab(merges, specials=("<|endoftext|>",))
    assert v["!"] == 0x21 and v["A"] == 0x41 and v["ÿ"] == 0xFF
    assert v["Ā"] == 0x00 and v["Ġ"] == 0x20  # shifted ids ARE bytes
    assert v["Ġs"] == 256 and v["er"] == 257 and v["Ġser"] == 258
    assert v["<|endoftext|>"] == 259
    assert len(v) == 260 and len(set(v.values())) == 260
    with pytest.raises(ValueError, match="collides"):
        BB.byte_vocab(merges, specials=("er",))


def test_export_load_round_trip_and_segmentation(tmp_path):
    merges = _py_train(FIXTURES, 20)
    vocab = BB.export_gpt2_tokenizer(
        merges, str(tmp_path), specials=("<|endoftext|>",)
    )
    assert (tmp_path / "vocab.json").exists()
    lines = (tmp_path / "merges.txt").read_text(
        encoding="utf-8"
    ).splitlines()
    assert lines[0] == "#version: 0.2" and len(lines) == len(merges) + 1
    back_merges, back_vocab = BB.load_gpt2_tokenizer(str(tmp_path))
    assert back_merges == merges and back_vocab == vocab
    # segmentation under the loaded merges == under the trained ones
    for t in FIXTURES:
        assert _naive_segment(t, back_merges) == _naive_segment(t, merges)
    # corrupted files refuse loudly
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\na\nxx yy zz\n", encoding="utf-8"
    )
    with pytest.raises(ValueError, match="malformed"):
        BB.load_gpt2_tokenizer(str(tmp_path))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n☃ x\n", encoding="utf-8"
    )
    with pytest.raises(ValueError, match="alphabet"):
        BB.load_gpt2_tokenizer(str(tmp_path))


def test_tokens_to_ids_and_decode(spark):
    merges = _py_train(FIXTURES, 12)
    vocab = BB.byte_vocab(merges)
    inv = {i: t for t, i in vocab.items()}
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURES[:12])],
        "doc_id long, text string",
    )
    seg = BB.bpe_segment_bytes_arrow(docs, merges)
    out = {
        r["doc_id"]: (r["bpe_tokens"], r["token_ids"])
        for r in BB.tokens_to_ids(seg, merges).collect()
    }
    for i, t in enumerate(FIXTURES[:12]):
        toks, ids = out[i]
        assert len(toks) == len(ids)
        assert all(x >= 0 for x in ids)
        assert [inv[x] for x in ids] == toks
        assert BB.decode_byte_tokens([inv[x] for x in ids]) == t
    # a token outside the vocab maps to -1, loudly detectable
    alien = spark.createDataFrame(
        [(1, ["Ġ", "zzz-not-a-token"])],
        "doc_id long, bpe_tokens array<string>",
    )
    got = BB.tokens_to_ids(alien, merges).collect()[0]["token_ids"]
    assert got[0] == 0x20 and got[1] == -1
