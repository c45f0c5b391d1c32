"""WARC source: record framing, response filtering, quarantine
accounting, deterministic ids, gzip shards."""

from __future__ import annotations

import gzip

from haensel_ams_data_engineer_challenge_spark.sources.warc import (
    read_documents_warc,
)


def _record(wtype, uri, payload: bytes, extra=b""):
    hdr = (
        b"WARC/1.0\r\n"
        + b"WARC-Type: " + wtype + b"\r\n"
        + (b"WARC-Target-URI: " + uri + b"\r\n" if uri else b"")
        + extra
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        + b"\r\n"
    )
    return hdr + payload + b"\r\n\r\n"


def _http(status: bytes, html: bytes):
    return (
        b"HTTP/1.1 " + status + b"\r\nContent-Type: text/html\r\n\r\n" + html
    )


GOOD_HTML = (
    b"<html><head><script>var x=1;</script><style>p{}</style></head>"
    b"<body><h1>Title &amp; More</h1><p>Hello   world.</p></body></html>"
)


def _shard():
    return (
        _record(b"warcinfo", b"", b"software: test")               # rejected
        + _record(b"request", b"http://a.example/x", b"GET /x")    # rejected
        + _record(b"response", b"http://a.example/x",
                  _http(b"200 OK", GOOD_HTML))                     # admitted
        + _record(b"response", b"http://b.example/y",
                  _http(b"404 Not Found", b"<html>gone</html>"))   # rejected
        + _record(b"response", b"http://c.example/z",
                  _http(b"200 OK", b"<p>Second page text</p>"))    # admitted
    )


def test_warc_parses_responses_and_audits_rejections(spark, tmp_path):
    (tmp_path / "s1.warc").write_bytes(_shard())
    docs, audit = read_documents_warc(spark, str(tmp_path))
    rows = {r["source"]: r for r in docs.collect()}
    assert set(rows) == {"a.example", "c.example"}
    assert rows["a.example"]["text"] == "Title & More Hello world."
    assert rows["a.example"]["lang"] == "und"
    assert rows["a.example"]["n_chars"] == len("Title & More Hello world.")
    a = audit.collect()[0]
    assert (a["n_records"], a["n_rejected"], a["n_malformed"]) == (5, 3, 0)


def test_warc_gzip_shard_and_deterministic_ids(spark, tmp_path):
    (tmp_path / "s1.warc.gz").write_bytes(gzip.compress(_shard()))
    docs1, _ = read_documents_warc(spark, str(tmp_path))
    ids1 = {r["source"]: r["doc_id"] for r in docs1.collect()}
    assert set(ids1) == {"a.example", "c.example"}
    # re-read: identical uri-derived ids
    docs2, _ = read_documents_warc(spark, str(tmp_path))
    assert {r["source"]: r["doc_id"] for r in docs2.collect()} == ids1


def test_warc_truncated_tail_quarantined_not_crashing(spark, tmp_path):
    shard = _shard() + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\nshort"
    (tmp_path / "bad.warc").write_bytes(shard)
    docs, audit = read_documents_warc(spark, str(tmp_path))
    assert docs.count() == 2                       # good prefix still lands
    a = audit.collect()[0]
    assert a["n_malformed"] == 1


def test_warc_garbage_file_counts_malformed(spark, tmp_path):
    (tmp_path / "junk.warc").write_bytes(b"this is not a warc at all")
    (tmp_path / "junk2.warc.gz").write_bytes(b"\x1f\x8bnot really gzip")
    docs, audit = read_documents_warc(spark, str(tmp_path))
    assert docs.count() == 0
    got = {r["path"].rsplit("/", 1)[-1]: r["n_malformed"] for r in audit.collect()}
    assert got == {"junk.warc": 1, "junk2.warc.gz": 1}


def test_warc_feeds_downstream_operators(spark, tmp_path):
    """The WARC source output plugs straight into the dedup tier."""
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        dedup_exact,
    )

    dup = _record(b"response", b"http://d.example/1",
                  _http(b"200 OK", b"<p>same text here</p>"))
    dup2 = _record(b"response", b"http://d.example/2",
                   _http(b"200 OK", b"<p>same text here</p>"))
    (tmp_path / "s.warc").write_bytes(_shard() + dup + dup2)
    docs, _ = read_documents_warc(spark, str(tmp_path))
    by_copies = sorted(r["n_copies"] for r in dedup_exact(docs).collect())
    assert by_copies == [1, 1, 2]
