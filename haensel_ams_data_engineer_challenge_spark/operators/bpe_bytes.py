"""Byte-level BPE — the GPT-2/tiktoken dialect (round 15, verdict #1).

`operators/bpe.py` trains and segments on lowercase whitespace word
types with ``</w>`` end markers (the Sennrich 2016 formulation).
Production LLM tokenizers speak a different dialect (Radford et al.
2019; tiktoken): **regex pre-tokenization** over the raw text, then
BPE over each pre-token's **UTF-8 bytes** — a 256-symbol base
alphabet, no OOV, no end marker, case and whitespace preserved,
unicode-safe by construction.  This module is that dialect, so the
tokenize -> :func:`..operators.pack.pack_sequences` ->
``write_training_shards`` hand-off emits what a modern trainer
consumes.

Pre-tokenization is the published GPT-2 split pattern::

    's|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+

implemented as a dependency-free scanner (:func:`gpt2_pre_tokenize`)
with EXACT class semantics: ``\\p{L}``/``\\p{N}`` are Unicode general
categories L*/N* (``unicodedata.category``), ``\\s`` is the 25-code-
point Unicode White_Space set — which is what the ``regex`` module
(the engine GPT-2's own encoder used) matches; the stdlib-``re``
extras U+001C-001F are deliberately NOT whitespace here.  When the
``regex`` package is importable the test suite pins the scanner
bit-equal to the published pattern on unicode-heavy fixtures
(tests/test_bpe_bytes.py); the scanner is the engine implementation
so the hot path carries no optional dependency and no regex-engine
quirks.

Merges never cross a pre-token boundary (training counts pairs per
pre-token type; segmentation applies merges per pre-token), exactly
the GPT-2 contract.

Bytes ride as strings through Spark via the standard GPT-2
byte<->unicode table (:func:`byte_unicode_table`): the 188 printable
latin-1 bytes map to themselves, the rest shift to U+0100.. in byte
order, so every token is a printable string and ``F.split(col, '')``
gives the symbol array JVM-side.

Verification split (the bpe.py precedent):

- TRAINING is the iterative driver loop — pytest-pinned against a
  transparent python reference; the distributed and local trainers
  are pinned bit-equal to each other.
- SEGMENTATION under a FIXED merge list is SQL-expressible **in hex
  space**: the oracle re-derives each pre-token's byte stream as
  ``lower(hex(encode(w)))``, brackets it per byte
  (``regexp_replace(h, '(..)', '[\\1]', 'g')``) and applies each
  merge as one literal ``replace('[ab][cd]' -> '[abcd]')`` — the
  bracket trick of ``bpe.segment_sql``, except symbols are hex
  strings so ANY byte content (quotes, brackets, control bytes) is
  SQL-safe.  The RE2 pre-tokenizer twin has no lookahead, so it
  extracts with ``\\s+`` last and repairs the one divergence
  list-side: a multi-char whitespace run followed by a non-space
  keeps its last char for the next token (``\\s+(?!\\S)``'s job),
  attaching it when it is a literal space.  RE2's ``\\s`` is ASCII,
  so the twin spells the White_Space set as an explicit class built
  from the same WS_CODEPOINTS constant the scanner uses.

Reference analogue: none — the reference has no tokenizer; this is
trainer-pipeline surface mandated by the driver (BASELINE.json
north_star), riding the `doc_fingerprint` gate key as the
``bpe_bytes`` arm.
"""

from __future__ import annotations

import unicodedata
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

#: Unicode White_Space (UAX #44) — the \s set of the regex engine the
#: published GPT-2 pattern ran under.  NOT stdlib-re's \s (which adds
#: the U+001C-001F information separators).
WS_CODEPOINTS: tuple[int, ...] = (
    *range(0x09, 0x0E), 0x20, 0x85, 0xA0, 0x1680,
    *range(0x2000, 0x200B), 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
)

_WS = frozenset(map(chr, WS_CODEPOINTS))

#: the published GPT-2 split pattern (documentation + the pytest
#: cross-check when the `regex` package is importable).
GPT2_SPLIT_PATTERN = (
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"""
    r"""| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)

#: contraction suffixes, alternation order of the published pattern
#: (lowercase literals — "'S" is NOT a contraction match).
_CONTRACTIONS_2 = ("s", "t", "m", "d")
_CONTRACTIONS_3 = ("re", "ve", "ll")


def _is_letter(c: str) -> bool:
    return unicodedata.category(c)[0] == "L"


def _is_number(c: str) -> bool:
    return unicodedata.category(c)[0] == "N"


def gpt2_pre_tokenize(text: str) -> list[str]:
    """Split ``text`` per the GPT-2 pattern — a direct scanner
    implementation of the alternation, in order:

    1. contraction suffixes ``'s 't 're 've 'm 'll 'd`` (literal,
       lowercase);
    2. an optional single literal space + a run of letters / numbers /
       other-non-whitespace (three separate run classes);
    3. a whitespace run: all of it when followed by whitespace or
       end-of-string, else all but the last char (``\\s+(?!\\S)`` —
       the survivor char then leads the next token via rule 2's
       optional space when it IS a space, or stands alone otherwise).
    """
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            nxt2 = text[i + 1 : i + 2]
            nxt3 = text[i + 1 : i + 3]
            if nxt3 in _CONTRACTIONS_3:
                out.append(text[i : i + 3])
                i += 3
                continue
            if nxt2 in _CONTRACTIONS_2:
                out.append(text[i : i + 2])
                i += 2
                continue
        k = i + 1 if (c == " " and i + 1 < n) else i
        d = text[k] if k < n else ""
        if d and d not in _WS:
            if _is_letter(d):
                run = _is_letter
            elif _is_number(d):
                run = _is_number
            else:
                def run(ch: str) -> bool:
                    return ch not in _WS and not (
                        _is_letter(ch) or _is_number(ch)
                    )
            j = k
            while j < n and run(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        # whitespace branch (c is whitespace: a bare ' ' followed by
        # non-space is unreachable here — rule 2 consumed it)
        j = i
        while j < n and text[j] in _WS:
            j += 1
        if j < n and j - i >= 2:
            j -= 1  # leave the last ws char for the next token
        out.append(text[i:j])
        i = j
    return out


# ---------------------------------------------------------------------------
# byte <-> unicode
# ---------------------------------------------------------------------------

#: latin-1 byte ranges that are printable and non-space: these map to
#: themselves; every other byte shifts to 0x100.. in byte order.
_PRINTABLE_RANGES = ((0x21, 0x7E), (0xA1, 0xAC), (0xAE, 0xFF))


def byte_unicode_table() -> dict[int, str]:
    """The GPT-2 byte->unicode map: a bijection from the 256 byte
    values onto printable codepoints, identity on printable latin-1
    (e.g. 0x41 -> 'A') and 0x100 + offset for the rest in ascending
    byte order (e.g. 0x20 -> U+0120 'Ġ', 0x0A -> U+010A 'Ċ')."""
    table: dict[int, str] = {}
    shift = 0x100
    for b in range(256):
        if any(lo <= b <= hi for lo, hi in _PRINTABLE_RANGES):
            table[b] = chr(b)
        else:
            table[b] = chr(shift)
            shift += 1
    return table


_B2U = byte_unicode_table()
_U2B = {u: b for b, u in _B2U.items()}


def encode_pretoken(w: str) -> str:
    """Pre-token -> its UTF-8 bytes rendered in byte-unicode space
    (one printable char per byte): the seed symbol string."""
    return "".join(_B2U[b] for b in w.encode("utf-8"))


def token_bytes(token: str) -> bytes:
    """Inverse of the byte-unicode rendering for one token."""
    return bytes(_U2B[ch] for ch in token)


def decode_byte_tokens(tokens: list[str]) -> str:
    """Round-trip: concatenate token byte contents and decode UTF-8.
    Lossless for any segmentation of any input text (the base
    alphabet is all 256 bytes — no OOV)."""
    return b"".join(token_bytes(t) for t in tokens).decode("utf-8")


def merges_to_hex(
    merges: list[tuple[str, str]]
) -> list[tuple[str, str]]:
    """Merge pairs (byte-unicode symbols) -> lowercase-hex byte
    strings, the representation :func:`segment_bytes_sql` embeds."""
    return [
        (token_bytes(a).hex(), token_bytes(b).hex()) for a, b in merges
    ]


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def byte_pretoken_types(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(ptok, freq, symbols) — the byte-BPE training state: one row
    per distinct PRE-TOKEN (byte-unicode rendered), frequency-
    weighted, seeded with single-byte symbols.

    Pre-tokenization + byte mapping are Python by necessity (unicode
    category scanner), so they run as ONE Arrow stage with map-side
    combining: each batch emits its local (ptok, n) counter — bytes
    transferred are O(distinct types per batch), not O(corpus) — and
    a JVM groupBy-sum finishes.  Symbols split JVM-side."""
    import pandas as pd

    def _count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in batches:
            counts: Counter[str] = Counter()
            for t in pdf[text_col]:
                for w in gpt2_pre_tokenize(t or ""):
                    counts[encode_pretoken(w)] += 1
            yield pd.DataFrame(
                {"ptok": list(counts), "n": list(counts.values())}
            )

    local = docs.select(text_col).mapInPandas(_count, "ptok string, n long")
    return (
        local.groupBy("ptok")
        .agg(F.sum("n").alias("freq"))
        .withColumn("symbols", F.split("ptok", ""))
    )


def bpe_train_bytes(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Distributed byte-BPE training: the exact greedy loop of
    ``bpe.bpe_train`` (one pair-count aggregate + one-row argmax +
    row-local fold per merge, lineage-truncating materialize) over
    the byte pre-token state.  Ties break lexicographically on
    (a, b) — deterministic at any parallelism."""
    from .bpe import train_merge_loop

    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    return train_merge_loop(byte_pretoken_types(docs, text_col), n_merges)


def bpe_train_bytes_local(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_types: int | None = None,
) -> list[tuple[str, str]]:
    """PRODUCTION path (the ``bpe.bpe_train_local`` shape): ONE
    distributed aggregation builds the pre-token type table, then the
    exact greedy loop runs driver-side with incremental pair-count
    maintenance — no per-merge Spark jobs.  Pinned bit-equal to
    :func:`bpe_train_bytes`."""
    from .bpe import MAX_LOCAL_TYPES, greedy_merges

    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    cap = MAX_LOCAL_TYPES if max_types is None else max_types
    tdf = byte_pretoken_types(docs, text_col).select("ptok", "freq")
    n_types = tdf.count()
    if n_types > cap:
        raise ValueError(
            f"{n_types} pre-token types > max_types={cap}; raise the cap "
            "(driver memory permitting) or use bpe_train_bytes"
        )
    rows = tdf.collect()
    syms = [list(r["ptok"]) for r in rows]
    freqs = [r["freq"] for r in rows]
    return greedy_merges(syms, freqs, n_merges)


# ---------------------------------------------------------------------------
# segmentation
# ---------------------------------------------------------------------------


def bpe_segment_bytes_arrow(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    hex_col: str | None = None,
) -> DataFrame:
    """Append ``out_col``: the byte-level BPE segmentation (tokens in
    byte-unicode space) under a learned merge sequence — row-local,
    zero shuffles at any corpus size, one Arrow stage.

    Merges apply per PRE-TOKEN in learned order, greedy left-to-right
    — the same sequential semantics as the oracle's replace chain and
    (for trained merge lists, where every symbol is built by earlier
    merges) the same result as the min-rank encoder loop production
    tokenizers run; both equivalences are pytest-pinned.  A per-batch
    cache keyed on the distinct pre-token amortizes the scan under
    Zipf.  ``hex_col`` optionally emits the same tokens as lowercase
    hex byte strings (the oracle's representation)."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, StringType, StructField, StructType,
    )

    fields = list(docs.schema.fields) + [
        StructField(out_col, ArrayType(StringType()), False)
    ]
    if hex_col is not None:
        fields.append(StructField(hex_col, ArrayType(StringType()), False))
    out_schema = StructType(fields)
    mlist = list(merges)

    def _seg(ptok_bu: str) -> list[str]:
        syms = list(ptok_bu)
        for a, b in mlist:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return syms

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            col: list[list[str]] = []
            for t in pdf[text_col]:
                toks: list[str] = []
                for w in gpt2_pre_tokenize(t or ""):
                    bu = encode_pretoken(w)
                    got = cache.get(bu)
                    if got is None:
                        got = cache[bu] = _seg(bu)
                    toks.extend(got)
                col.append(toks)
            pdf = pdf.copy()
            pdf[out_col] = col
            if hex_col is not None:
                pdf[hex_col] = [
                    [token_bytes(t).hex() for t in toks] for toks in col
                ]
            yield pdf

    return docs.mapInPandas(_apply, out_schema)


# ---------------------------------------------------------------------------
# DuckDB twin
# ---------------------------------------------------------------------------


def _re2_ws_class() -> str:
    """The White_Space set as an explicit RE2 character class (RE2's
    \\s is ASCII-only), from the same WS_CODEPOINTS the scanner
    uses."""
    parts: list[str] = []
    i = 0
    cps = WS_CODEPOINTS
    while i < len(cps):
        j = i
        while j + 1 < len(cps) and cps[j + 1] == cps[j] + 1:
            j += 1
        lo = f"\\x{{{cps[i]:04X}}}"
        parts.append(lo if i == j else f"{lo}-\\x{{{cps[j]:04X}}}")
        i = j + 1
    return "[" + "".join(parts) + "]"


def re2_split_pattern() -> str:
    """RE2 (DuckDB) pre-tokenizer: the GPT-2 alternation minus the
    unsupported lookahead — ``\\s+`` extracts whole whitespace runs
    and :func:`segment_bytes_sql` repairs the boundary list-side."""
    ws = _re2_ws_class()
    return (
        "'s|'t|'re|'ve|'m|'ll|'d"
        "| ?\\p{L}+| ?\\p{N}+"
        f"| ?[^{ws[1:-1]}\\p{{L}}\\p{{N}}]+|{ws}+"
    )


def segment_bytes_sql(
    merges: list[tuple[str, str]], pfx: str = "bb"
) -> str:
    """DuckDB twin of :func:`bpe_segment_bytes_arrow` for a FIXED
    merge list: CTE ``{pfx}_seg`` = (doc_id, bpe_tokens_hex) over the
    ``documents`` view, tokens as lowercase hex byte strings.

    Three steps (module docstring): RE2 extraction + whitespace-
    boundary repair; per-pre-token hex bracket encoding; one literal
    replace per merge.  ``merges`` are byte-unicode pairs — converted
    here via :func:`merges_to_hex`, so the embedded SQL is pure
    ``[0-9a-f]`` and needs no escaping.

    The repair re-derives ``\\s+(?!\\S)`` semantics from RE2's whole-
    run ``\\s+`` tokens.  For a whitespace run of length >= 2 followed
    by a token: the run keeps all but its last char; a non-space last
    char stands alone; a literal-space last char attaches as the next
    token's optional leading space.  One second-order case: when the
    attach target is a CONTRACTION ('s 't ...), the true scanner sits
    at the space, where contractions cannot match — it emits the
    punct run ``" '"`` and a fresh LETTER run that swallows the
    contraction's suffix together with an immediately following
    letter token (``" 'sand"`` -> ``" '", "sand"``); the repair
    splits/merges accordingly and drops the swallowed token."""
    pat = re2_split_pattern().replace("'", "''")
    ws = _re2_ws_class()
    expr = "regexp_replace(lower(hex(encode(w))), '(..)', '[\\1]', 'g')"
    for a, b in merges_to_hex(merges):
        expr = f"replace({expr}, '[{a}][{b}]', '[{a}{b}]')"
    def is_ws2(i: str) -> str:
        return (
            f"regexp_matches(rtoks[{i}], '^{ws}+$')"
            f" AND length(rtoks[{i}]) >= 2"
        )

    def attach(i: str) -> str:
        return (
            f"({i}) > 1 AND {is_ws2(f'({i}) - 1')}"
            f" AND rtoks[({i}) - 1][-1] = ' '"
        )

    def contr(i: str) -> str:
        return (
            f"rtoks[{i}] IN"
            " ('''s', '''t', '''re', '''ve', '''m', '''ll', '''d')"
        )

    def starts_l(i: str) -> str:
        return f"regexp_matches(rtoks[{i}], '^\\p{{L}}')"

    return f"""
        {pfx}_raw AS (
            SELECT doc_id,
                   regexp_extract_all(text, '{pat}') AS rtoks
            FROM documents),
        {pfx}_fix AS (
            SELECT doc_id,
                   flatten(list_transform(
                       range(1, len(rtoks) + 1),
                       i -> CASE
                           WHEN {is_ws2("i")} AND i < len(rtoks)
                           THEN CASE
                               WHEN rtoks[i][-1] = ' '
                               THEN [rtoks[i][1:-2]]
                               ELSE [rtoks[i][1:-2], rtoks[i][-1]]
                           END
                           WHEN {attach("i - 1")}
                                AND {contr("i - 1")}
                                AND {starts_l("i")}
                           THEN []
                           WHEN {attach("i")}
                                AND {contr("i")}
                           THEN CASE
                               WHEN i < len(rtoks)
                                    AND {starts_l("i + 1")}
                               THEN [' ''',
                                     substr(rtoks[i], 2) || rtoks[i + 1]]
                               ELSE [' ''', substr(rtoks[i], 2)]
                           END
                           WHEN {attach("i")}
                           THEN [' ' || rtoks[i]]
                           ELSE [rtoks[i]]
                       END)) AS ptoks
            FROM {pfx}_raw),
        {pfx}_br AS (
            SELECT doc_id,
                   list_transform(ptoks, w -> {expr}) AS brs
            FROM {pfx}_fix),
        {pfx}_seg AS (
            SELECT doc_id,
                   flatten(list_transform(brs, s ->
                       str_split(substr(s, 2, length(s) - 2), '][')
                   )) AS bpe_tokens_hex
            FROM {pfx}_br)"""


def load_merges_json(path: str) -> tuple[str, list[tuple[str, str]]]:
    """Read a ``bpe_merges.json`` (CLI ``corpus --learn-bpe`` output)
    -> (dialect, merges).  A bare list is the legacy word-type
    dialect; a dict carries an explicit ``dialect`` tag ('byte-level'
    from ``--byte-level-bpe``) so ``tokenize``/``pack`` pick the
    matching segmenter without a flag."""
    import json

    with open(path) as fh:
        payload = json.load(fh)
    if isinstance(payload, dict):
        dialect = payload.get("dialect", "word")
        merges = payload.get("merges", [])
    else:
        dialect, merges = "word", payload
    if dialect not in ("word", "byte-level"):
        raise ValueError(f"unknown BPE dialect {dialect!r} in {path}")
    return dialect, [tuple(m) for m in merges]


def fused_bpe_arms(
    docs: DataFrame,
    word_merges: list[tuple[str, str]],
    byte_merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Registry helper (the round-14 chain-fusion discipline): the
    ``bpe_arrow`` arm (word dialect, ``bpe.bpe_segment_arrow``
    semantics) and the ``bpe_bytes`` arm ride ONE Arrow stage — at
    bench scale each mapInPandas chain costs ~0.8 s of FIXED floors,
    so two single-purpose chains over the same corpus waste one.

    Output: (method, doc_id, fingerprint, n_tokens) with EXACTLY the
    rows the two separate arms produce (md5 over the space-joined
    token stream — word tokens for 'bpe_arrow', hex byte tokens for
    'bpe_bytes'); tests/test_bpe_bytes.py pins fused == separate
    row-for-row, so the oracle twins are untouched."""
    import hashlib
    import re as _re

    import pandas as pd

    from .bpe import END

    word_re = _re.compile("[a-z0-9]+")
    wlist = list(word_merges)
    blist = list(byte_merges)

    def _fold(syms: list[str], merges: list[tuple[str, str]]) -> list[str]:
        for a, b in merges:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return syms

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wcache: dict[str, list[str]] = {}
        bcache: dict[str, list[str]] = {}
        for pdf in batches:
            methods: list[str] = []
            ids: list[int] = []
            fps: list[str] = []
            ns: list[int] = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = t or ""
                wtoks: list[str] = []
                for w in word_re.findall(t.lower()):
                    got = wcache.get(w)
                    if got is None:
                        got = wcache[w] = _fold(
                            [*w[:-1], w[-1] + END], wlist
                        )
                    wtoks.extend(got)
                btoks: list[str] = []
                for w in gpt2_pre_tokenize(t):
                    bu = encode_pretoken(w)
                    got = bcache.get(bu)
                    if got is None:
                        got = bcache[bu] = _fold(list(bu), blist)
                    btoks.extend(got)
                methods += ["bpe_arrow", "bpe_bytes"]
                ids += [int(i), int(i)]
                fps.append(
                    hashlib.md5(" ".join(wtoks).encode()).hexdigest()
                )
                fps.append(
                    hashlib.md5(
                        " ".join(
                            token_bytes(x).hex() for x in btoks
                        ).encode()
                    ).hexdigest()
                )
                ns += [len(wtoks), len(btoks)]
            yield pd.DataFrame(
                {"method": methods, id_col: ids,
                 "fingerprint": fps, "n_tokens": ns}
            )

    return docs.select(id_col, text_col).mapInPandas(
        _apply,
        f"method string, {id_col} long, fingerprint string, n_tokens long",
    )


def bpe_train_bytes_batched(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_batch: int = 64,
    round_log: list[int] | None = None,
    exact: bool = True,
) -> list[tuple[str, str]]:
    """Batched byte-BPE training: k provably-safe merges per driver
    round over the byte pre-token state (``bpe.batched_merge_loop`` —
    the count-bound + alphabet-probe machinery is symbol-agnostic).
    ``exact=True`` (default) is pytest-pinned bit-equal to
    :func:`bpe_train_bytes`; the trade-offs of ``exact=False`` are
    ``bpe.bpe_train_batched``'s, verbatim."""
    from .bpe import batched_merge_loop

    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    return batched_merge_loop(
        byte_pretoken_types(docs, text_col), n_merges,
        max_batch=max_batch, round_log=round_log, exact=exact,
    )


# ---------------------------------------------------------------------------
# vocabulary ids + the published tokenizer file format
# ---------------------------------------------------------------------------


def byte_vocab(
    merges: list[tuple[str, str]], specials: tuple[str, ...] = ()
) -> dict[str, int]:
    """token (byte-unicode) -> id, the GPT-2 id convention: ids
    0..255 are the 256 single-byte symbols in BYTE order (i.e. the
    byte value itself maps through the byte-unicode table), id 256+i
    is merge i's concatenation, then ``specials`` (e.g.
    ``("<|endoftext|>",)``) in order.  A merge whose concatenation
    already exists keeps the FIRST id (duplicates cannot arise from a
    real training run — each symbol is created once)."""
    vocab: dict[str, int] = {
        _B2U[b]: b for b in range(256)
    }
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    for s in specials:
        if s in vocab:
            raise ValueError(f"special token {s!r} collides with vocab")
        vocab[s] = len(vocab)
    return vocab


def export_gpt2_tokenizer(
    merges: list[tuple[str, str]],
    out_dir: str,
    specials: tuple[str, ...] = (),
) -> dict[str, int]:
    """Write the PUBLISHED GPT-2 tokenizer file pair — ``vocab.json``
    (token -> id) and ``merges.txt`` (``#version: 0.2`` header, one
    space-separated merge per line, learned order) — so the trainer
    hand-off is consumable by standard tokenizer loaders without any
    engine code.  Returns the vocab.  Driver-side file IO (tokenizer
    artifacts are KBs, not data)."""
    import json
    import os

    vocab = byte_vocab(merges, specials)
    os.makedirs(out_dir, exist_ok=True)
    with open(
        os.path.join(out_dir, "vocab.json"), "w", encoding="utf-8"
    ) as fh:
        json.dump(vocab, fh, ensure_ascii=False)
    with open(
        os.path.join(out_dir, "merges.txt"), "w", encoding="utf-8"
    ) as fh:
        fh.write("#version: 0.2\n")
        for a, b in merges:
            fh.write(f"{a} {b}\n")
    return vocab


def load_gpt2_tokenizer(
    in_dir: str,
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Read a GPT-2-format tokenizer dir -> (merges, vocab); the
    inverse of :func:`export_gpt2_tokenizer`, and a loader for
    tokenizers produced by OTHER trainers in the same format.
    Refuses merge pairs containing symbols outside the byte-unicode
    alphabet closure (a corrupted file must not segment silently
    wrong)."""
    import json
    import os

    with open(
        os.path.join(in_dir, "vocab.json"), encoding="utf-8"
    ) as fh:
        vocab = json.load(fh)
    merges: list[tuple[str, str]] = []
    with open(
        os.path.join(in_dir, "merges.txt"), encoding="utf-8"
    ) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(f"malformed merges.txt line {line!r}")
            merges.append((parts[0], parts[1]))
    alphabet = set(_U2B)
    for a, b in merges:
        for sym in (a, b):
            if not set(sym) <= alphabet:
                raise ValueError(
                    f"merge symbol {sym!r} contains characters outside "
                    "the byte-unicode alphabet — not a byte-level "
                    "GPT-2 tokenizer file"
                )
    return merges, vocab


def tokens_to_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    tokens_col: str = "bpe_tokens",
    out_col: str = "token_ids",
    specials: tuple[str, ...] = (),
) -> DataFrame:
    """Append ``out_col`` = array<int> ids for a byte-unicode token
    column under :func:`byte_vocab`'s id assignment — row-local JVM
    execution via one literal map expression (the vocab is
    KB-scale); unknown tokens raise at build time when found in the
    merge closure check... they cannot arise from this engine's
    segmenter under the same merges, so an unknown token maps to -1
    and the caller's invariant check catches drift loudly."""
    vocab = byte_vocab(merges, specials)
    mapping = F.create_map(
        *[F.lit(x) for kv in vocab.items() for x in kv]
    )
    return df.withColumn(
        out_col,
        F.transform(
            F.col(tokens_col),
            lambda t: F.coalesce(
                F.element_at(mapping, t), F.lit(-1)
            ).cast("int"),
        ),
    )
