"""JSONL document source: declared schema, quarantine policy,
deterministic derived ids."""

from __future__ import annotations

import json

from haensel_ams_data_engineer_challenge_spark.sources.jsonl import (
    read_documents_jsonl,
)


def _write(tmp_path, lines, name="dump.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_reads_well_formed_lines_with_defaults(spark, tmp_path):
    path = _write(tmp_path, [
        json.dumps({"id": 7, "text": "hello world", "lang": "en", "source": "web"}),
        json.dumps({"text": "no id or lang here"}),
    ])
    docs, bad = read_documents_jsonl(spark, path)
    assert bad.count() == 0
    rows = {r["text"]: r for r in docs.collect()}
    assert rows["hello world"]["doc_id"] is not None  # id-derived hash
    assert rows["hello world"]["n_chars"] == 11
    d = rows["no id or lang here"]
    assert d["lang"] == "und" and d["source"] == "jsonl"
    assert d["doc_id"] is not None  # content-derived


def test_string_ids_parse_and_derive_stable_doc_ids(spark, tmp_path):
    """Public dumps ship string ids/URLs; they must parse (not
    quarantine) and derive deterministic long doc_ids.  ALL wire ids
    hash uniformly (one collision model, round-7 advice #4) — so
    '42', '042' and ' 42' stay DISTINCT instead of collapsing to 42,
    and numeric ids can't silently collide with hash-derived ones."""
    path = _write(tmp_path, [
        json.dumps({"id": "https://example.com/a", "text": "doc a"}),
        json.dumps({"id": "c4-0001-000042", "text": "doc b"}),
        json.dumps({"id": "42", "text": "doc c"}),   # numeric string
        json.dumps({"id": "042", "text": "doc d"}),  # distinct wire id
        json.dumps({"id": " 42", "text": "doc e"}),  # distinct wire id
    ])
    docs, bad = read_documents_jsonl(spark, path)
    assert bad.count() == 0
    rows = {r["text"]: r["doc_id"] for r in docs.collect()}
    assert len(set(rows.values())) == 5    # distinct, deterministic
    # re-read produces the identical ids
    docs2, _ = read_documents_jsonl(spark, path)
    assert {r["text"]: r["doc_id"] for r in docs2.collect()} == rows


def test_derived_ids_are_deterministic_and_order_independent(spark, tmp_path):
    texts = [json.dumps({"text": f"document number {i}"}) for i in range(20)]
    p1 = _write(tmp_path, texts, "a.jsonl")
    p2 = _write(tmp_path, list(reversed(texts)), "b.jsonl")
    d1, _ = read_documents_jsonl(spark, p1)
    d2, _ = read_documents_jsonl(spark, p2)
    m1 = {r["text"]: r["doc_id"] for r in d1.collect()}
    m2 = {r["text"]: r["doc_id"] for r in d2.collect()}
    assert m1 == m2


def test_malformed_and_empty_lines_quarantined_not_dropped(spark, tmp_path):
    path = _write(tmp_path, [
        json.dumps({"id": 1, "text": "fine"}),
        '{"id": 2, "text": "unterminated',     # malformed JSON
        "not json at all",
        json.dumps({"id": 3, "text": ""}),      # empty text
        json.dumps({"id": 4}),                  # missing text
    ])
    docs, bad = read_documents_jsonl(spark, path)
    assert docs.count() == 1
    assert bad.count() == 4
    raws = [r["raw_line"] for r in bad.collect()]
    assert any("unterminated" in r for r in raws)
    assert any("not json at all" in r for r in raws)


def test_feeds_the_corpus_operators(spark, tmp_path):
    """The jsonl source output plugs straight into the dedup tier."""
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        dedup_exact,
    )

    path = _write(tmp_path, [
        json.dumps({"text": "same text"}),
        json.dumps({"text": "same text"}),
        json.dumps({"text": "different text"}),
    ])
    docs, _ = read_documents_jsonl(spark, path)
    groups = dedup_exact(docs).collect()
    # identical texts share a derived id -> one group of n_copies 2
    by_copies = sorted(r["n_copies"] for r in groups)
    assert by_copies == [1, 2]


def test_jsonl_url_field_rides_as_uri(spark, tmp_path):
    """Round 14: dumps that ship a crawl url (C4/Dolma) expose it as
    the ``uri`` column the ingest URL tier keys on; absent urls are
    null and pass the tier untouched."""
    import json as _json

    lines = [
        _json.dumps({"id": "a", "text": "doc with a url",
                     "url": "http://x.example/a?utm_source=t"}),
        _json.dumps({"id": "b", "text": "doc without one"}),
    ]
    p = str(tmp_path / "d.jsonl")
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    docs, bad = read_documents_jsonl(spark, p)
    assert bad.count() == 0
    rows = {r["text"]: r["uri"] for r in docs.collect()}
    assert rows["doc with a url"] == "http://x.example/a?utm_source=t"
    assert rows["doc without one"] is None
