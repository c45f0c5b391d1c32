"""WARC document source — the web-crawl wire format (CommonCrawl).

Web-scale corpora start as WARC shards (ISO 28500): a concatenation of
records, each a ``WARC/1.x`` header block (CRLF-delimited, terminated
by an empty line) followed by ``Content-Length`` payload bytes and a
trailing CRLF CRLF.  CommonCrawl ships ~64k gzip shards per crawl, so
the parallel unit is the FILE: Spark's ``binaryFile`` source lists the
shards and hands each to one task (a .warc.gz member stream is not
block-splittable anyway — the same layout rule as the jsonl source's
.gz note: shard count, not split count, is the parallelism).  Parsing
runs in mapInPandas over the file bytes — pure stdlib (gzip + bytes
splitting), no external crawl libraries.

Discipline mirrors sources/jsonl.py:

- only ``WARC-Type: response`` records with an HTTP 200 status line
  and a non-empty extracted text become documents;
- records that parse but are rejected (non-response types, non-200,
  empty payload/text) are COUNTED per file in an audit DataFrame —
  dropped data is observable, never silent;
- a file whose framing is irrecoverably malformed (no WARC/ magic, a
  Content-Length that walks off the end) contributes its remaining
  bytes to the quarantine count rather than crashing the job: at
  100 TB some shards WILL be truncated;
- ``doc_id`` derives from xxhash64 of the WARC-Target-URI (or the
  payload when absent) — deterministic, order-independent, one
  collision model (the jsonl round-8 rule); computed JVM-side after
  parsing;
- ``source`` is the URI host; ``lang`` is the sentinel ``und`` (a
  downstream langid pass assigns it — functions/text.langid).

HTML -> text (round 14, r13 verdict task 2): the default extractor is
the stdlib block-level MAIN-CONTENT extractor (sources/htmltext.py —
jusText/trafilatura rule family: structural nav/header/footer/aside
pruning + link-density + block-length classification + adjacency
rescue), with charset detection (BOM > HTTP header > meta sniff >
UTF-8 > Latin-1) recorded per document in an ``encoding`` audit
column.  The old CRUDE strip (script/style removal, tag removal,
entity decode, whitespace collapse) is kept at the same seam
(``extractor="crude"``) — testable, and the honest baseline the
before/after boilerplate-share table in BASELINE.md measures against.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

#: parsed-record wire schema (pre doc_id derivation)
_REC_SCHEMA = (
    "uri string, host string, text string, encoding string, "
    "n_records long, n_rejected long, n_malformed long"
)


def _extract_text(html: str) -> str:
    """Crude stdlib HTML->text (module docstring): good enough to feed
    the downstream quality/dedup tiers deterministic text; swap for a
    real extractor at this seam."""
    import html as html_mod
    import re

    s = re.sub(r"(?is)<(script|style)\b.*?</\1>", " ", html)
    s = re.sub(r"(?s)<[^>]+>", " ", s)
    s = html_mod.unescape(s)
    return re.sub(r"\s+", " ", s).strip()


#: HTTP Content-Type charset parameter (ASCII header line).
_CT_CHARSET_RE = re.compile(
    rb"(?im)^content-type:.*?charset=[\"']?([A-Za-z0-9_.:-]+)"
)


def _parse_warc_bytes(blob: bytes, extractor: str = "main"):
    """Yield (uri, host, text, encoding) per usable response record
    plus the (n_records, n_rejected, n_malformed) file audit counts.

    ``extractor``: ``"main"`` (default) runs the block-level
    main-content extractor with charset detection; ``"crude"`` keeps
    the round-13 tag-strip over a replace-decoded UTF-8 view (its
    encoding label is the constant ``utf-8/replace``)."""
    from urllib.parse import urlparse

    from .htmltext import decode_html_bytes, extract_main_text

    n_records = n_rejected = n_malformed = 0
    docs = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record padding
        while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not blob.startswith(b"WARC/", pos):
            n_malformed += 1  # lost framing: count the tail, stop
            break
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            n_malformed += 1
            break
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
            key, _, val = line.partition(b":")
            headers[key.strip().lower().decode("ascii", "replace")] = (
                val.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            n_malformed += 1
            break
        body_start = hdr_end + 4
        if body_start + length > n:
            n_malformed += 1  # truncated shard tail
            break
        body = blob[body_start : body_start + length]
        pos = body_start + length
        n_records += 1
        if headers.get("warc-type") != "response":
            n_rejected += 1
            continue
        # HTTP response payload: status line + headers + CRLF CRLF + html
        http_end = body.find(b"\r\n\r\n")
        status = body[: body.find(b"\r\n")] if http_end >= 0 else b""
        if http_end < 0 or b" 200" not in status:
            n_rejected += 1
            continue
        raw_html = body[http_end + 4 :]
        if extractor == "crude":
            text = _extract_text(raw_html.decode("utf-8", "replace"))
            encoding = "utf-8/replace"
        else:
            m = _CT_CHARSET_RE.search(body[:http_end])
            header_charset = (
                m.group(1).decode("ascii", "replace") if m else None
            )
            html, encoding = decode_html_bytes(raw_html, header_charset)
            text = extract_main_text(html)
        if not text:
            n_rejected += 1
            continue
        uri = headers.get("warc-target-uri", "")
        docs.append(
            (uri, urlparse(uri).netloc if uri else "", text, encoding)
        )
    return docs, (n_records, n_rejected, n_malformed)


def read_documents_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    extractor: str = "main",
    _zstd_decompress=None,
) -> tuple[DataFrame, DataFrame]:
    """Read WARC shards -> (documents, audit).

    ``documents`` carries the engine schema (doc_id, text, lang,
    source, n_chars) plus the ``encoding`` audit column (which
    charset-detection rung decoded the payload); ``audit`` is one row
    per shard file (path, n_records, n_rejected, n_malformed) — the
    observable account of everything not admitted.  ``extractor`` is
    the HTML->text seam: ``"main"`` (block-level main-content, the
    production default) or ``"crude"`` (the tag-strip baseline).

    Round 15 (r14 verdict #5): ``.warc.zst`` shards decompress
    through ``sources.zstdwire.zstd_decompress`` (stdlib/zstandard
    ladder, loud refusal when neither exists); a corrupt zstd member
    lands the same one-row malformed audit as a corrupt gzip member.
    ``_zstd_decompress`` is the test injection seam (executors can't
    see driver monkeypatches).
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def parse(batches):
        import gzip

        import pandas as pd

        from .zstdwire import ZSTD_MAGIC, zstd_decompress

        zdec = _zstd_decompress or zstd_decompress

        for pdf in batches:
            for _, row in pdf.iterrows():
                blob = bytes(row["content"])
                bad = None
                if row["path"].endswith(".gz") or blob[:2] == b"\x1f\x8b":
                    try:
                        blob = gzip.decompress(blob)
                    except OSError:
                        bad = True
                elif (
                    row["path"].endswith(".zst")
                    or blob[:4] == ZSTD_MAGIC
                ):
                    try:
                        blob = zdec(blob)
                    except ValueError:
                        bad = True
                if bad:
                    yield pd.DataFrame(
                        [(None, None, None, None, 0, 0, 1)],
                        columns=["uri", "host", "text", "encoding",
                                 "n_records", "n_rejected",
                                 "n_malformed"],
                    ).assign(path=row["path"])
                    continue
                docs, (nr, nj, nm) = _parse_warc_bytes(blob, extractor)
                rows = [
                    (uri, host, text, enc, nr, nj, nm)
                    for uri, host, text, enc in docs
                ] or [(None, None, None, None, nr, nj, nm)]
                yield pd.DataFrame(
                    rows,
                    columns=["uri", "host", "text", "encoding",
                             "n_records", "n_rejected", "n_malformed"],
                ).assign(path=row["path"])

    parsed = files.mapInPandas(parse, _REC_SCHEMA + ", path string")
    audit = (
        parsed.groupBy("path")
        .agg(
            F.max("n_records").cast("long").alias("n_records"),
            F.max("n_rejected").cast("long").alias("n_rejected"),
            F.max("n_malformed").cast("long").alias("n_malformed"),
        )
    )
    docs = parsed.filter(F.col("text").isNotNull()).select(
        F.xxhash64(
            F.coalesce(F.nullif(F.col("uri"), F.lit("")), F.col("text"))
        ).alias("doc_id"),
        "text",
        F.lit("und").alias("lang"),
        F.when(F.col("host") == "", F.lit("warc"))
        .otherwise(F.col("host"))
        .alias("source"),
        F.length("text").cast("long").alias("n_chars"),
        "encoding",
        # the target URI rides along (round 14): the ingest URL tier
        # keys on canonical_url(uri) ahead of content dedup
        F.nullif(F.col("uri"), F.lit("")).alias("uri"),
    )
    return docs, audit


def _parse_warc_links(
    blob: bytes,
) -> list[tuple[str, str, str, bool]]:
    """(src_uri, dst_uri, anchor_text, nofollow) edges of every usable
    response record: the record walk of :func:`_parse_warc_bytes`
    with the LINK view of the page (htmltext.extract_links) instead
    of the text view.  hrefs resolve against the record's target URI
    (urljoin), fragments drop with the resolution, and only http(s)
    destinations survive (mailto:/javascript:/data: are not crawl
    edges).  Records without a target URI yield no edges — an edge
    needs a source key."""
    from urllib.parse import urldefrag, urljoin, urlparse

    from .htmltext import decode_html_bytes, extract_links

    edges: list[tuple[str, str, str]] = []
    pos = 0
    n = len(blob)
    while pos < n:
        while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n or not blob.startswith(b"WARC/", pos):
            break
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
            key, _, val = line.partition(b":")
            headers[key.strip().lower().decode("ascii", "replace")] = (
                val.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + length > n:
            break
        body = blob[body_start : body_start + length]
        pos = body_start + length
        uri = headers.get("warc-target-uri", "")
        if headers.get("warc-type") != "response" or not uri:
            continue
        http_end = body.find(b"\r\n\r\n")
        status = body[: body.find(b"\r\n")] if http_end >= 0 else b""
        if http_end < 0 or b" 200" not in status:
            continue
        m = _CT_CHARSET_RE.search(body[:http_end])
        header_charset = (
            m.group(1).decode("ascii", "replace") if m else None
        )
        html, _enc = decode_html_bytes(body[http_end + 4 :], header_charset)
        for href, anchor, nofollow in extract_links(html):
            try:
                dst = urldefrag(urljoin(uri, href))[0]
            except ValueError:
                continue  # unparseable href: not an edge
            if urlparse(dst).scheme in ("http", "https") and dst:
                edges.append((uri, dst, anchor, nofollow))
    return edges


def read_links_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    _zstd_decompress=None,
) -> DataFrame:
    """Read WARC shards -> the crawl LINK GRAPH edge list
    (src_uri, dst_uri, anchor_text, nofollow), one row per anchor
    (round 15, r14 verdict #2); ``nofollow`` records
    rel="nofollow"/"ugc"/"sponsored" so centrality consumers can
    exclude disclaimed links (linkgraph.host_graph(follow_only=True)).

    Same scale shape as :func:`read_documents_warc` (binaryFile scan,
    per-payload CPU inside one Arrow stage, no shuffle); downstream
    keying/aggregation is `operators.linkgraph`.  Corrupt gzip
    members yield no edges here — run the documents reader for the
    per-shard audit counts."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )

    def parse(batches):
        import gzip

        import pandas as pd

        from .zstdwire import ZSTD_MAGIC, zstd_decompress

        zdec = _zstd_decompress or zstd_decompress

        for pdf in batches:
            rows: list[tuple[str, str, str, bool]] = []
            for blob in pdf["content"]:
                blob = bytes(blob)
                if blob[:2] == b"\x1f\x8b":
                    try:
                        blob = gzip.decompress(blob)
                    except OSError:
                        continue
                elif blob[:4] == ZSTD_MAGIC:
                    try:
                        blob = zdec(blob)
                    except ValueError:
                        continue
                rows.extend(_parse_warc_links(blob))
            yield pd.DataFrame(
                rows,
                columns=["src_uri", "dst_uri", "anchor_text", "nofollow"],
            )

    return files.mapInPandas(
        parse,
        "src_uri string, dst_uri string, anchor_text string, "
        "nofollow boolean",
    )


def read_robots_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    _zstd_decompress=None,
) -> DataFrame:
    """Read WARC shards -> (host, robots_txt): the RAW text of every
    ``/robots.txt`` response record (round 15 — the crawl-policy
    input for ``functions.robots``).

    The documents reader is wrong for this: robots.txt is plain text,
    and the HTML block extractor would collapse its line structure.
    Here the payload decodes as UTF-8-with-replacement (robots files
    are ASCII-by-spec; stray bytes must not kill the record) and
    rides whole.  Multiple captures of one host keep the LONGEST body
    (the least-truncated capture) — deterministic.  Same binaryFile /
    gzip / zstd scan shape as the other WARC readers."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def parse(batches):
        import gzip
        from urllib.parse import urlparse

        import pandas as pd

        from .zstdwire import ZSTD_MAGIC, zstd_decompress

        zdec = _zstd_decompress or zstd_decompress

        for pdf in batches:
            rows: list[tuple[str, str]] = []
            for blob in pdf["content"]:
                blob = bytes(blob)
                if blob[:2] == b"\x1f\x8b":
                    try:
                        blob = gzip.decompress(blob)
                    except OSError:
                        continue
                elif blob[:4] == ZSTD_MAGIC:
                    try:
                        blob = zdec(blob)
                    except ValueError:
                        continue
                pos, n = 0, len(blob)
                while pos < n:
                    while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
                        pos += 1
                    if pos >= n or not blob.startswith(b"WARC/", pos):
                        break
                    hdr_end = blob.find(b"\r\n\r\n", pos)
                    if hdr_end < 0:
                        break
                    headers: dict[str, str] = {}
                    for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
                        key, _, val = line.partition(b":")
                        headers[
                            key.strip().lower().decode("ascii", "replace")
                        ] = val.strip().decode("utf-8", "replace")
                    try:
                        length = int(headers.get("content-length", ""))
                    except ValueError:
                        break
                    body_start = hdr_end + 4
                    if body_start + length > n:
                        break
                    body = blob[body_start : body_start + length]
                    pos = body_start + length
                    uri = headers.get("warc-target-uri", "")
                    if headers.get("warc-type") != "response" or not uri:
                        continue
                    parsed = urlparse(uri)
                    if parsed.path != "/robots.txt":
                        continue
                    http_end = body.find(b"\r\n\r\n")
                    status = (
                        body[: body.find(b"\r\n")] if http_end >= 0 else b""
                    )
                    if http_end < 0 or b" 200" not in status:
                        continue
                    rows.append((
                        parsed.netloc,
                        body[http_end + 4 :].decode("utf-8", "replace"),
                    ))
            yield pd.DataFrame(rows, columns=["host", "robots_txt"])

    parsed = files.mapInPandas(parse, "host string, robots_txt string")
    return (
        parsed.groupBy("host")
        .agg(F.max_by("robots_txt", F.length("robots_txt")).alias(
            "robots_txt"
        ))
    )
