"""Zstd wire formats (sources/zstdwire.py + the .warc.zst rungs —
round 15, r14 verdict #5): decompressor ladder (real round-trip when
an implementation exists in this interpreter, LOUD refusal with
guidance when none does — a branch, not a skip), full reader plumbing
via the injection seam (executors can't see monkeypatches), truncated
-stream quarantine, and dedup-tier integration."""

from __future__ import annotations

import gzip
import json
import zlib

from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.sources.zstdwire import (
    ZSTD_MAGIC,
    _resolve_decompressor,
    is_zstd,
    read_documents_jsonl_zst,
    zstd_decompress,
)


def _make_fake_zstd():
    """Stand-in codec for plumbing tests: real frame layout (magic
    prefix), zlib body, the contract's ValueError on corruption.
    Built as a CLOSURE so cloudpickle ships it by value — executors
    cannot import the test module by name."""
    magic = ZSTD_MAGIC

    def fake_zstd(blob: bytes) -> bytes:
        import zlib as _z

        if blob[:4] != magic:
            raise ValueError("not a zstd frame")
        try:
            return _z.decompress(blob[4:])
        except _z.error as exc:
            raise ValueError(f"corrupt stream: {exc}") from exc

    return fake_zstd


def _fake_compress(data: bytes) -> bytes:
    return ZSTD_MAGIC + zlib.compress(data)


def test_ladder_real_or_loud_refusal():
    """Whichever this interpreter has: a real decompressor round-trips
    real zstd bytes; no decompressor refuses with actionable guidance
    naming both remedies.  Both branches are strong assertions."""
    import pytest

    assert is_zstd(ZSTD_MAGIC + b"xxxx") and not is_zstd(b"PK\x03\x04")
    dec = _resolve_decompressor()
    if dec is None:
        with pytest.raises(RuntimeError) as exc:
            zstd_decompress(b"\x28\xb5\x2f\xfdwhatever", "s3://x/y.zst")
        msg = str(exc.value)
        assert "zstandard" in msg and "compression.zstd" in msg
        assert "s3://x/y.zst" in msg
    else:
        try:
            from compression import zstd as _z

            blob = _z.compress(b"hello zstd world")
        except ImportError:
            import zstandard as _z

            blob = _z.ZstdCompressor().compress(b"hello zstd world")
        assert zstd_decompress(blob) == b"hello zstd world"
        assert is_zstd(blob)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="corrupt|truncated"):
            zstd_decompress(blob[:5], "trunc.zst")


def test_jsonl_zst_round_trip_and_quarantine(spark, tmp_path):
    lines = [
        json.dumps({"id": "1", "text": "alpha doc body", "lang": "en",
                    "url": "http://a.example/1"}),
        json.dumps({"id": "2", "text": "beta doc body", "url": ""}),
        "{broken json line",
        json.dumps({"id": "4", "text": ""}),  # empty text: quarantined
    ]
    (tmp_path / "dump.jsonl.zst").write_bytes(
        _fake_compress(("\n".join(lines) + "\n").encode())
    )
    # a truncated stream: the whole file quarantines as one row
    (tmp_path / "trunc.jsonl.zst").write_bytes(
        _fake_compress(b"ignored")[:10]
    )
    docs, bad = read_documents_jsonl_zst(
        spark, str(tmp_path), _decompress=_make_fake_zstd()
    )
    rows = {r["text"]: r for r in docs.collect()}
    assert set(rows) == {"alpha doc body", "beta doc body"}
    assert rows["alpha doc body"]["uri"] == "http://a.example/1"
    assert rows["beta doc body"]["uri"] is None  # '' nullifed
    assert rows["alpha doc body"]["n_chars"] == 14
    bad_rows = [r["raw_line"] for r in bad.collect()]
    assert len(bad_rows) == 3
    assert any("broken json" in b for b in bad_rows)
    assert any("__zstd_quarantine__" in b and "trunc.jsonl.zst" in b
               for b in bad_rows)


def test_warc_zst_documents_and_audit(spark, tmp_path):
    from haensel_ams_data_engineer_challenge_spark.sources.warc import (
        read_documents_warc,
    )

    def record(uri, html):
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        )
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + b"WARC-Target-URI: " + uri + b"\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n"
        )

    shard = record(
        b"http://z.example/p",
        b"<html><body><p>"
        + b"zstd shard page text with plenty of words here " * 3
        + b"</p></body></html>",
    )
    (tmp_path / "a.warc.zst").write_bytes(_fake_compress(shard))
    (tmp_path / "b.warc.zst").write_bytes(_fake_compress(shard)[:12])
    docs, audit = read_documents_warc(
        spark, str(tmp_path), _zstd_decompress=_make_fake_zstd()
    )
    got = docs.collect()
    assert len(got) == 1 and got[0]["source"] == "z.example"
    aud = {r["path"].rsplit("/", 1)[-1]: r for r in audit.collect()}
    assert aud["a.warc.zst"]["n_malformed"] == 0
    assert aud["b.warc.zst"]["n_malformed"] == 1  # corrupt member


def test_warc_zst_links(spark, tmp_path):
    from haensel_ams_data_engineer_challenge_spark.sources.warc import (
        read_links_warc,
    )

    def record(uri, html):
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        )
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + b"WARC-Target-URI: " + uri + b"\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n"
        )

    shard = record(
        b"http://z.example/p",
        b'<p><a href="/q">inner</a> <a href="http://w.example/">w</a></p>',
    )
    (tmp_path / "l.warc.zst").write_bytes(_fake_compress(shard))
    links = read_links_warc(
        spark, str(tmp_path), _zstd_decompress=_make_fake_zstd()
    ).collect()
    got = {(r["src_uri"], r["dst_uri"]) for r in links}
    assert got == {
        ("http://z.example/p", "http://z.example/q"),
        ("http://z.example/p", "http://w.example/"),
    }


def test_zst_feeds_dedup_tier(spark, tmp_path):
    """Integration: documents arriving via .jsonl.zst join the same
    dedup tiers as any other source — an exact duplicate across the
    zst dump and a plain corpus collapses to one survivor."""
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        dedup_exact,
    )

    lines = [
        json.dumps({"id": "z1", "text": "shared corpus page body"}),
        json.dumps({"id": "z2", "text": "a page only in the zst dump"}),
    ]
    (tmp_path / "d.jsonl.zst").write_bytes(
        _fake_compress(("\n".join(lines) + "\n").encode())
    )
    zdocs, _ = read_documents_jsonl_zst(
        spark, str(tmp_path), _decompress=_make_fake_zstd()
    )
    plain = spark.createDataFrame(
        [(999, "shared corpus page body", "en", "web", 23, None)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long, uri string",
    )
    groups = dedup_exact(zdocs.unionByName(plain)).collect()
    assert len(groups) == 2
    n_copies = {r["n_copies"] for r in groups}
    assert n_copies == {1, 2}


def test_gz_rung_untouched(spark, tmp_path):
    """Regression: the existing .gz path still routes through gzip
    (the zstd rung is an elif on path suffix/magic)."""
    from haensel_ams_data_engineer_challenge_spark.sources.warc import (
        read_documents_warc,
    )

    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        + b"<p>gz page with sufficient body text to survive</p>"
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + b"WARC-Target-URI: http://g.example/\r\n"
        + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body + b"\r\n\r\n"
    )
    (tmp_path / "g.warc.gz").write_bytes(gzip.compress(rec))
    docs, audit = read_documents_warc(spark, str(tmp_path))
    assert docs.count() == 1
    assert audit.agg(F.sum("n_malformed")).collect()[0][0] == 0


def test_cli_corpus_routes_zst_dumps(spark, tmp_path, capsys, monkeypatch):
    """corpus --docs-jsonl *.jsonl.zst routes through the zstd reader
    (monkeypatched here — the reader itself is covered above; this
    pins the CLI dispatch)."""
    from haensel_ams_data_engineer_challenge_spark.__main__ import main
    from haensel_ams_data_engineer_challenge_spark.sources import zstdwire

    nouns = ["fox", "dog", "river", "stone", "cloud", "tree"]

    def good(i):
        return " ".join(
            f"the {nouns[(i + j) % len(nouns)]}{i}{j} was here so"
            for j in range(20)
        )

    docs = spark.createDataFrame(
        [(i, good(i), "en", "zst", len(good(i)), None) for i in range(5)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long, uri string",
    )
    bad = spark.createDataFrame([("oops",)], "raw_line string")
    seen: dict = {}

    def fake_reader(sp, path, glob="*.jsonl.zst", _decompress=None):
        seen["path"], seen["glob"] = path, glob
        return docs, bad

    monkeypatch.setattr(zstdwire, "read_documents_jsonl_zst", fake_reader)
    work = str(tmp_path / "wd")
    assert main([
        "corpus", "--docs-jsonl", str(tmp_path / "dump.jsonl.zst"),
        "--work-dir", work,
        "--train", "1.0", "--val", "0.0", "--test", "0.0",
    ]) == 0
    out = capsys.readouterr().out
    assert "quarantined=1" in out
    assert seen["glob"] == "dump.jsonl.zst"
    assert spark.read.parquet(f"{work}/corpus").count() == 5
