"""URL canonicalization (round 14, r13 verdict task 5).

Production crawl pipelines dedup by NORMALIZED URL before paying for
content dedup: the same page re-crawled as ``HTTP://Example.com:80/a/``
and ``http://example.com/a?utm_source=x`` must collide.  This module
is the row-local canonicalizer — pure Column expressions (JVM-side,
whole-stage codegen; no Python in the hot path), so it composes into
any scan/filter/join without an Arrow hop:

1. scheme + host lowercased (RFC 3986 §6.2.2.1 case normalization);
2. default ports stripped (``:80`` for http, ``:443`` for https);
3. percent-escape normalization (§6.2.2.1-2): hex digits uppercased
   and escapes of UNRESERVED characters (``A-Z a-z 0-9 - . _ ~``)
   decoded — ``%7Euser`` == ``~user`` — via ``chr(conv(hex,16,10))``,
   all inside the expression;
4. tracking parameters removed (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``mc_eid``, ``igshid``, ``yclid``, ``spm``, ``_ga`` —
   NOT bare ``ref``, which is content-bearing) and the
   surviving query parameters SORTED (order-insensitive compare);
5. trailing path slashes stripped (``/a/`` == ``/a``; the root path
   collapses into the bare authority) and the fragment dropped
   (``#section`` never reaches the server).

A string without a ``scheme://`` prefix (relative reference, garbage)
falls back to its trim UNMODIFIED — case folding is reserved for the
scheme/host, the only parts RFC 3986 declares case-insensitive, so
distinct relative paths like ``/About`` vs ``/about`` do NOT collide
in the hard-reject dedup tier.  Empty / whitespace-only input yields
NULL (same as null in): the ingest URL tier passes NULL keys through,
so unusable URLs never collide onto one key and silently drop rows.
Never a raise (``try_parse_url``: an invalid URL yields NULL
components, not an executor exception).

Reference analogue: none — the reference ingests CSV/SQLite; this is
crawl-pipeline surface like sources/warc.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: query parameters that identify a CRAWL VARIANT, not a resource:
#: ad-click and analytics tags (the uBlock/adparams core set — public
#: knowledge; extend per deployment).
#: NOTE (review fix): bare ``ref`` (and ``ref_src``) are EXCLUDED —
#: ``ref`` is widely content-bearing (VCS refs, pagination/category
#: selectors), and the URL tier is a HARD reject: stripping it would
#: permanently drop distinct pages as re-crawls.  Only parameters
#: that are unambiguously click/analytics tags belong here.
TRACKING_PARAM_RE = (
    "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid|yclid|"
    "spm|_ga)$"
)

#: characters whose percent-escapes decode (RFC 3986 unreserved).
_UNRESERVED_RE = "^[A-Za-z0-9._~-]$"


def _normalize_escapes(col: Column) -> Column:
    """Percent-escape normalization inside one expression: split on
    '%', keep the head verbatim, and for every following segment
    uppercase the two hex digits — decoding them to the literal
    character when it is unreserved (chr(conv(hex,16,10))), keeping
    the (uppercased) escape otherwise.  Malformed escapes ('%' not
    followed by two hex digits) stay literal."""
    parts = F.split(col, "%")
    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def seg(p: Column) -> Column:
        hex2 = F.upper(F.substring(p, 1, 2))
        ch = F.chr(F.conv(hex2, 16, 10).cast("long"))
        tail = F.substring(p, 3, 1 << 24)
        return F.when(
            ~hex2.rlike("^[0-9A-F]{2}$"),
            F.concat(F.lit("%"), p),  # malformed escape: literal
        ).otherwise(
            F.concat(
                F.when(ch.rlike(_UNRESERVED_RE), ch).otherwise(
                    F.concat(F.lit("%"), hex2)
                ),
                tail,
            )
        )

    return F.when(F.size(parts) <= 1, col).otherwise(
        F.concat(
            F.element_at(parts, 1),
            F.array_join(F.transform(rest, seg), ""),
        )
    )


def canonical_url(col) -> Column:
    """The canonical form of a URL column (module docstring rules) —
    the dedup key the ingest tier anti-joins on ahead of content
    dedup.  NULL-safe: null in, null out."""
    raw = F.col(col) if isinstance(col, str) else col
    # full whitespace trim (F.trim strips spaces only — a URL wrapped
    # in tabs/newlines, common in crawl metadata, must still parse and
    # a whitespace-only field must yield NULL, not a colliding key)
    u = F.regexp_replace(raw, r"^\s+|\s+$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    authority = F.try_parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(F.coalesce(authority, F.lit("")), r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = _normalize_escapes(
        F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    )
    path = F.regexp_replace(path, "/+$", "")
    query = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    params = F.array_sort(
        F.filter(
            F.transform(F.split(query, "&"), _normalize_escapes),
            lambda p: (p != "")
            & ~F.lower(F.regexp_extract(p, "^([^=]*)", 1)).rlike(
                TRACKING_PARAM_RE
            ),
        )
    )
    qpart = F.when(F.size(params) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(params, "&"))
    )
    canon = F.concat(
        scheme, F.lit("://"), host, port_part, path, qpart
    )
    usable = (scheme != "") & host.isNotNull() & (host != "")
    return F.when(
        u.isNull() | (u == ""), F.lit(None).cast("string")
    ).otherwise(F.when(usable, canon).otherwise(u))
