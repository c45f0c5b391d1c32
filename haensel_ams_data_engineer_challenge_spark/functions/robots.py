"""robots.txt (RFC 9309) rules at the crawl-frontier seam (round 15,
second half).

A production crawl pipeline must answer "may this URL be fetched /
kept?" per the site's published robots policy — retroactively too
(corpora get re-filtered when policies change).  This module is the
row-local rule engine plus its Spark lifts:

- :func:`parse_robots_txt` — one robots.txt body -> the ordered rule
  list for an agent, per RFC 9309 group selection: the group(s) whose
  ``User-agent`` line is the LONGEST prefix match of the product
  token win; ``*`` groups apply only when no specific group matched;
  multiple matching groups merge.  Rules keep their pattern octets —
  precedence is decided at MATCH time.
- :func:`robots_match` — RFC 9309 evaluation for one path: among
  rules whose pattern matches (``*`` wildcards, ``$`` end anchor,
  percent-decoding left to the caller's canonical form), the LONGEST
  pattern wins; on a length tie, ``Allow`` wins; no matching rule =
  allowed.
- :func:`robots_rules` — (host, robots_txt) rows -> the exploded
  (host, pattern, regex, pattern_len, allow) rule table, ONE Arrow
  stage; per-host rule count capped (longest patterns kept — they
  dominate every decision they participate in) so a pathological
  10 MB robots file cannot blow up the frontier join.
- :func:`filter_allowed` — documents ⋈ rules on host (skew-bounded
  by the cap), per-pair regex match JVM-side (``rlike`` with a
  column pattern), winner per doc via ``max_by`` over
  (pattern_len, allow) — one join + one aggregate, no Python in the
  per-document path.

Reference analogue: none — crawl-pipeline surface like
functions/url.py; the evaluation semantics follow RFC 9309 §2.2
(public specification), not any implementation.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

#: per-host rule cap for the distributed path: RFC 9309 recommends
#: parsers honor at least 500 KiB of robots.txt; real policy files
#: carry far fewer DISTINCT patterns than this, and keeping the
#: longest patterns preserves every decision they win.
MAX_RULES_PER_HOST = 512


def _group_tokens(line: str) -> tuple[str, str] | None:
    line = line.split("#", 1)[0].strip()
    if not line or ":" not in line:
        return None
    key, _, val = line.partition(":")
    return key.strip().lower(), val.strip()


def parse_robots_txt(
    text: str, agent: str = "*"
) -> list[tuple[str, bool]]:
    """robots.txt body -> ordered [(pattern, allow), ...] for
    ``agent`` (module docstring group selection).  Empty-pattern
    ``Disallow:`` lines (allow-all idiom) contribute nothing; rules
    outside any group are ignored per the RFC."""
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agents = False
    for raw in text.splitlines():
        kv = _group_tokens(raw)
        if kv is None:
            continue
        key, val = kv
        if key == "user-agent":
            if not in_agents and (cur_agents or cur_rules):
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_agents = True
        elif key in ("allow", "disallow"):
            in_agents = False
            if val:
                cur_rules.append((val, key == "allow"))
            # empty Disallow/Allow: no rule (RFC: empty pattern
            # matches nothing)
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    # group selection: longest user-agent token that prefixes the
    # product token; '*' only when nothing specific matched
    best_len = -1
    for agents, _rules in groups:
        for a in agents:
            if a != "*" and agent_l.startswith(a) and len(a) > best_len:
                best_len = len(a)
    rules: list[tuple[str, bool]] = []
    for agents, grules in groups:
        if best_len >= 0:
            take = any(
                a != "*" and len(a) == best_len
                and agent_l.startswith(a)
                for a in agents
            )
        else:
            take = "*" in agents
        if take:
            rules.extend(grules)
    return rules


def _pattern_regex(pattern: str) -> str:
    """Robots pattern -> anchored regex: ``*`` = any run, trailing
    ``$`` = end anchor, everything else literal."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(
        ".*" if ch == "*" else re.escape(ch) for ch in body
    )
    return "^" + rx + ("$" if anchored else "")


def robots_match(
    rules: list[tuple[str, bool]], path: str
) -> bool:
    """RFC 9309 §2.2.2: longest matching pattern wins; Allow wins a
    length tie; no match = allowed.  ``path`` is the URL path +
    optional ?query, as the crawler would request it."""
    best: tuple[int, bool] | None = None
    for pattern, allow in rules:
        if re.match(_pattern_regex(pattern), path):
            key = (len(pattern), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def robots_rules(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
    max_rules_per_host: int = MAX_RULES_PER_HOST,
) -> DataFrame:
    """(host, pattern, regex, pattern_len, allow): the exploded rule
    table for ``agent`` — one Arrow stage over the (host, body) rows;
    per-host cap keeps the frontier join skew-bounded (longest
    patterns kept: they dominate every decision they match in)."""
    import pandas as pd

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts: list[str] = []
            pats: list[str] = []
            rxs: list[str] = []
            lens: list[int] = []
            allows: list[bool] = []
            for h, body in zip(pdf[host_col], pdf[text_col]):
                rules = parse_robots_txt(body or "", agent)
                if len(rules) > max_rules_per_host:
                    rules = sorted(
                        rules, key=lambda r: len(r[0]), reverse=True
                    )[:max_rules_per_host]
                for pattern, allow in rules:
                    hosts.append(h)
                    pats.append(pattern)
                    rxs.append(_pattern_regex(pattern))
                    lens.append(len(pattern))
                    allows.append(allow)
            yield pd.DataFrame({
                "host": hosts, "pattern": pats, "regex": rxs,
                "pattern_len": lens, "allow": allows,
            })

    return robots.select(host_col, text_col).mapInPandas(
        _parse,
        "host string, pattern string, regex string, "
        "pattern_len int, allow boolean",
    )


def filter_allowed(
    docs: DataFrame,
    rules: DataFrame,
    uri_col: str = "uri",
    keep_unknown_hosts: bool = True,
) -> DataFrame:
    """Documents whose URI the robots policy ALLOWS (module docstring
    plan).  Path+query is matched as crawlers request it; documents
    with no usable URI, or on hosts with no rule table, pass when
    ``keep_unknown_hosts`` (the RFC default: no robots.txt = crawl
    allowed)."""
    from .url import canonical_url

    keyed = docs.withColumn(
        "__rb_host",
        F.try_parse_url(canonical_url(uri_col), F.lit("HOST")),
    ).withColumn(
        "__rb_path",
        F.concat(
            F.coalesce(
                F.nullif(
                    F.try_parse_url(F.col(uri_col), F.lit("PATH")),
                    F.lit(""),
                ),
                F.lit("/"),
            ),
            F.when(
                F.try_parse_url(F.col(uri_col), F.lit("QUERY")).isNotNull(),
                F.concat(
                    F.lit("?"),
                    F.try_parse_url(F.col(uri_col), F.lit("QUERY")),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    hosted = keyed.filter(F.col("__rb_host").isNotNull())
    unhosted = keyed.filter(F.col("__rb_host").isNull())

    r = rules.select(
        F.col("host").alias("__rb_host"), "regex", "pattern_len", "allow"
    )
    joined = hosted.join(r, "__rb_host", "left")
    # winner per doc: longest matching pattern, Allow on ties; docs
    # with rules but no MATCH, or hosts with no rules, default allow
    matched = joined.withColumn(
        "__hit",
        F.col("regex").isNotNull()
        & F.expr("__rb_path rlike regex"),
    )
    decided = (
        matched.groupBy(*[F.col(c) for c in keyed.columns])
        .agg(
            F.max_by(
                F.col("allow"),
                F.when(
                    F.col("__hit"),
                    F.col("pattern_len") * 2
                    + F.col("allow").cast("int"),
                ),
            ).alias("__verdict")
        )
        .filter(F.col("__verdict").isNull() | F.col("__verdict"))
    )
    out = decided.drop("__verdict", "__rb_host", "__rb_path")
    if keep_unknown_hosts:
        out = out.unionByName(
            unhosted.drop("__rb_host", "__rb_path")
        )
    return out


# ---------------------------------------------------------------------------
# sitemaps (sitemaps.org protocol) — the frontier's positive half
# ---------------------------------------------------------------------------

#: per-file entry cap, mirroring the protocol's own 50k-URL limit.
MAX_SITEMAP_ENTRIES = 50_000


def parse_sitemap(xml_text: str) -> tuple[str, list[tuple[str, str | None]]]:
    """One sitemap document -> (kind, entries): kind ``"urlset"``
    with [(loc, lastmod|None), ...] page entries, ``"sitemapindex"``
    with [(child_sitemap_loc, lastmod|None), ...], or ``("", [])``
    for anything unparseable/foreign — robots.txt's never-raise
    discipline.  Namespace-agnostic (localname matching: real
    sitemaps mix the 0.9 namespace, no namespace, and vendor
    extensions); entries capped at the protocol's own 50k limit."""
    import xml.etree.ElementTree as ET

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1].lower()

    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return "", []
    kind = local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return "", []
    child = "url" if kind == "urlset" else "sitemap"
    entries: list[tuple[str, str | None]] = []
    for el in root:
        if local(el.tag) != child:
            continue
        loc = None
        lastmod = None
        for sub in el:
            if local(sub.tag) == "loc" and sub.text:
                loc = sub.text.strip()
            elif local(sub.tag) == "lastmod" and sub.text:
                lastmod = sub.text.strip()
        if loc:
            entries.append((loc, lastmod))
        if len(entries) >= MAX_SITEMAP_ENTRIES:
            break
    return kind, entries


def sitemap_entries(
    sitemaps: DataFrame,
    host_col: str = "host",
    text_col: str = "sitemap_xml",
) -> DataFrame:
    """(host, kind, loc, lastmod): exploded sitemap entries over
    (host, xml body) rows — ONE Arrow stage; urlset rows are frontier
    candidates (join ``canonical_url(loc)`` against the admitted
    store's URL tier), sitemapindex rows are fetch targets for the
    crawler's next wave."""
    import pandas as pd

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts: list[str] = []
            kinds: list[str] = []
            locs: list[str] = []
            mods: list[str | None] = []
            for h, body in zip(pdf[host_col], pdf[text_col]):
                kind, entries = parse_sitemap(body or "")
                for loc, lastmod in entries:
                    hosts.append(h)
                    kinds.append(kind)
                    locs.append(loc)
                    mods.append(lastmod)
            yield pd.DataFrame({
                "host": hosts, "kind": kinds,
                "loc": locs, "lastmod": mods,
            })

    return sitemaps.select(host_col, text_col).mapInPandas(
        _parse, "host string, kind string, loc string, lastmod string"
    )
