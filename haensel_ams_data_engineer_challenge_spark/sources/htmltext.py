"""Main-content HTML extraction + charset detection (round 14, r13
verdict task 2 — the production rung for the WARC seam).

The old seam was a tag-strip: every nav link, cookie banner and footer
line landed in ``text`` and every downstream quality/dedup tier
inherited the noise.  This module is a pure-stdlib block-level
extractor in the jusText / trafilatura rule family (public knowledge:
Pomikálek 2011 "Removing boilerplate and duplicate content from web
corpora"; Kohlschütter 2010 boilerpipe):

1. parse the HTML into BLOCKS with :class:`html.parser.HTMLParser`
   (block-level elements open/close blocks; ``script``/``style``/
   ``noscript``/``template``/``svg``/``iframe`` subtrees are dropped
   whole; text inside ``<a>`` is counted separately per block);
2. structural pruning: blocks inside ``nav``/``header``/``footer``/
   ``aside``/``form`` are boilerplate by construction;
3. density classification: a block is a CANDIDATE if its link density
   (link chars / chars) is at most ``MAX_LINK_DENSITY``; a candidate
   is GOOD if it carries at least ``GOOD_MIN_CHARS`` characters —
   link-dense lists (menus, tag clouds, related-article rails) and
   short stubs between them never qualify;
4. context rescue (the jusText near-good rule, simplified): when the
   page HAS good blocks, short candidates ADJACENT to a good block in
   block order ride along (headings above a paragraph, bylines,
   single-sentence ledes); isolated short candidates (copyright
   lines between footers) drop;
5. recall fallback: a page with NO good block at all (short pages,
   fragments, fixtures) keeps every candidate — structure + link
   density still prune nav/menu noise, but short legitimate pages are
   not erased.

Scale shape: everything here is per-payload CPU inside the WARC
source's ``mapInPandas`` — no shuffle, no driver work; at 100 TB the
cost is the same "decode one record" unit the crude strip paid,
linear in payload bytes.

Charset detection (:func:`decode_html_bytes`): BOM (UTF-8/UTF-16) ->
HTTP ``Content-Type`` charset -> ``<meta charset>`` / ``http-equiv``
sniff in the first 2 KiB -> strict UTF-8 probe -> Latin-1 fallback
(never fails: Latin-1 maps every byte).  The chosen label rides the
document row as an ``encoding`` audit column.

Reference analogue: none — the reference ingests CSV/SQLite
(api_utils.py); this tier exists for the 100 TB crawl corpus the
engine's dedup/quality operators target.
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser

#: elements whose whole subtree is invisible text-wise.  ``title`` is
#: document metadata, not body content; ``head`` itself is NOT listed
#: — a crawl page with an unclosed <head> would otherwise suppress the
#: whole body, and head's only text-bearing child is title.
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe", "title"}
)

#: structural boilerplate containers (HTML5 sectioning/chrome).
_BOILER_TAGS = frozenset({"nav", "header", "footer", "aside", "form"})

#: elements that open/close a text block.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "li", "ul", "ol",
        "h1", "h2", "h3", "h4", "h5", "h6", "td", "th", "tr", "table",
        "blockquote", "pre", "br", "dd", "dt", "figure", "figcaption",
        "body",
    }
)

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

#: a block with at least this many characters (whitespace excluded)
#: can stand on its own as main content.
GOOD_MIN_CHARS = 80

#: maximum link density for a block to be content at all: menus and
#: "related articles" rails are mostly anchor text.
MAX_LINK_DENSITY = 0.4


class _BlockParser(HTMLParser):
    """HTML -> [(text, n_chars, n_link_chars, structural_boiler)]."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int, bool]] = []
        self._parts: list[str] = []
        self._chars = 0
        self._link_chars = 0
        self._skip = 0
        self._boiler = 0
        self._link = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append(
                (text, self._chars, self._link_chars, self._boiler > 0)
            )
        self._parts = []
        self._chars = 0
        self._link_chars = 0
        # anchors cannot legally span block elements — an UNCLOSED <a>
        # (ubiquitous in real crawl HTML) must not leak link-ness into
        # every later block, which would classify the whole document
        # link-dense and extract it to empty (review fix)
        self._link = 0

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag in _BOILER_TAGS:
            self._flush()
            self._boiler += 1
            return
        if tag == "a":
            self._link += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):  # noqa: D102
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag in _BOILER_TAGS:
            self._flush()
            self._boiler = max(0, self._boiler - 1)
            return
        if tag == "a":
            self._link = max(0, self._link - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):  # noqa: D102
        if self._skip or not data:
            return
        self._parts.append(data)
        n = sum(1 for c in data if not c.isspace())
        self._chars += n
        if self._link:
            self._link_chars += n

    def close(self) -> None:  # noqa: D102
        super().close()
        self._flush()


def html_blocks(html: str) -> list[tuple[str, int, int, bool]]:
    """Parse ``html`` into text blocks: (text, n_chars, n_link_chars,
    structural_boilerplate).  Never raises on malformed markup —
    HTMLParser is tolerant by design; a catastrophic parser error
    yields a single unclassified block of the raw text."""
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        flat = " ".join(re.sub(r"(?s)<[^>]*>", " ", html).split())
        return [(flat, len(flat.replace(" ", "")), 0, False)] if flat else []
    return p.blocks


def extract_main_text(html: str) -> str:
    """Main-content text of an HTML page (module docstring rules):
    blocks joined by newlines (so the line-level boilerplate pass
    downstream still sees line units).  Empty string when the page
    has no content blocks at all (pure chrome / link farm)."""
    blocks = html_blocks(html)
    # candidates: outside chrome containers, not link-dominated
    cand = [
        (i, text, chars)
        for i, (text, chars, link_chars, boiler) in enumerate(blocks)
        if not boiler
        and chars > 0
        and link_chars <= MAX_LINK_DENSITY * chars
    ]
    if not cand:
        return ""
    good_idx = {i for i, _t, chars in cand if chars >= GOOD_MIN_CHARS}
    if not good_idx:
        # recall fallback: no long-form block anywhere — keep every
        # candidate (short pages are pages, not boilerplate)
        return "\n".join(t for _i, t, _c in cand)
    # adjacency rescue in BLOCK order: short candidates touching a
    # good block (headings, bylines, short ledes) ride along
    keep = [
        (i, t)
        for i, t, _c in cand
        if i in good_idx or (i - 1) in good_idx or (i + 1) in good_idx
    ]
    return "\n".join(t for _i, t in keep)


class _LinkParser(HTMLParser):
    """HTML -> [(href, anchor_text, nofollow)] — the edge list the
    block parser was throwing away (round 15, r14 verdict #2).
    Anchors inside skip subtrees (script/svg/...) are invisible; an
    <a> without an href contributes nothing; nested/unclosed anchors
    flush at the next <a> or </a> (anchors cannot legally nest).
    ``nofollow`` records rel="nofollow"/"ugc"/"sponsored" — the
    link-type annotations publishers use to disclaim endorsement;
    centrality consumers usually exclude them."""

    _NOFOLLOW_RELS = frozenset({"nofollow", "ugc", "sponsored"})

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str, bool]] = []
        self._skip = 0
        self._href: str | None = None
        self._nofollow = False
        self._parts: list[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            text = " ".join("".join(self._parts).split())
            self.links.append((self._href, text, self._nofollow))
        self._href = None
        self._nofollow = False
        self._parts = []

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "a":
            self._flush()
            href = next(
                (v for k, v in attrs if k == "href" and v), None
            )
            self._href = href.strip() if href else None
            rel = next((v for k, v in attrs if k == "rel" and v), "")
            self._nofollow = bool(
                self._NOFOLLOW_RELS & set(rel.lower().split())
            )

    def handle_endtag(self, tag):  # noqa: D102
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "a":
            self._flush()

    def handle_data(self, data):  # noqa: D102
        if self._skip or self._href is None or not data:
            return
        self._parts.append(data)

    def close(self) -> None:  # noqa: D102
        super().close()
        self._flush()


def extract_links(html: str) -> list[tuple[str, str, bool]]:
    """(href, anchor_text, nofollow) triples of an HTML page, document
    order — the crawl-graph edge list.  Malformed markup never
    raises; a catastrophic parser error yields no links (the
    audit-visible doc row still lands via the text path)."""
    p = _LinkParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return []
    return p.links


#: charset= attribute sniff (meta charset / http-equiv content / xml
#: declaration), ASCII-compatible prefix only.
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)")


def _try_decode(raw: bytes, enc: str) -> str | None:
    """Decode STRICTLY: a header/meta charset label is a claim, not a
    fact, and 'replace' would make every claim succeed — a page with a
    wrong label (e.g. a shift_jis header over UTF-8 bytes) must FAIL
    here and fall through to the UTF-8 probe instead of silently
    mojibaking.  'replace' is reserved for the final chosen rung
    (latin-1 never fails; BOM rungs are authoritative)."""
    try:
        codecs.lookup(enc)
    except LookupError:
        return None
    try:
        return raw.decode(enc)
    except Exception:
        return None


def _utf8_wins(raw: bytes) -> str | None:
    """Mislabel repair for ASCII-compatible single-byte labels (which
    decode ANY byte string, so strict decode can't catch the lie):
    when the payload contains non-ASCII bytes AND is strictly valid
    UTF-8, the multi-byte sequences are near-certain UTF-8 — a
    latin-1/iso-8859-* label over such bytes is the classic crawl
    mislabel.  Pure-ASCII payloads return None (label is harmless)."""
    try:
        text = raw.decode("utf-8")
    except UnicodeDecodeError:
        return None
    return text if any(b >= 0x80 for b in raw) else None


def decode_html_bytes(
    raw: bytes, header_charset: str | None = None
) -> tuple[str, str]:
    """(text, encoding_label): decode crawl payload bytes through the
    detection ladder — BOM > HTTP header charset > meta sniff in the
    first 2 KiB > strict UTF-8 > Latin-1 (total: every byte maps).
    The label records the rung that decoded, for the audit column."""
    if raw[:3] == b"\xef\xbb\xbf":
        return raw[3:].decode("utf-8", "replace"), "utf-8-sig"
    # 4-byte UTF-32 BOMs must be checked BEFORE the 2-byte UTF-16 ones
    # (the LE UTF-32 BOM ff fe 00 00 starts with the UTF-16-LE BOM);
    # all BOM rungs strip the BOM itself — U+FEFF is not whitespace
    # and would otherwise lead the extracted text (review fix)
    if raw[:4] == b"\xff\xfe\x00\x00":
        return raw[4:].decode("utf-32-le", "replace"), "utf-32-le"
    if raw[:4] == b"\x00\x00\xfe\xff":
        return raw[4:].decode("utf-32-be", "replace"), "utf-32-be"
    if raw[:2] == b"\xff\xfe":
        return raw[2:].decode("utf-16-le", "replace"), "utf-16-le"
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace"), "utf-16-be"
    if header_charset:
        enc = header_charset.strip().lower()
        if enc not in ("utf-8", "utf8"):
            repaired = _utf8_wins(raw)
            if repaired is not None:
                return repaired, "utf-8"
        text = _try_decode(raw, enc)
        if text is not None:
            return text, enc
    m = _CHARSET_RE.search(raw[:2048])
    if m:
        enc = m.group(1).decode("ascii", "replace").lower()
        if enc not in ("utf-8", "utf8"):
            repaired = _utf8_wins(raw)
            if repaired is not None:
                return repaired, "utf-8"
            text = _try_decode(raw, enc)
            if text is not None:
                return text, enc
    try:
        return raw.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return raw.decode("latin-1"), "latin-1"
