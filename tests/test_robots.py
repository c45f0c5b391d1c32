"""robots.txt rules (functions/robots.py + sources/warc.
read_robots_warc — round 15 second half): RFC 9309 parsing/matching
goldens (group selection, wildcard/$ patterns, longest-match with
Allow tie-break), the distributed rule table + frontier filter, and
the WARC robots reader e2e."""

from __future__ import annotations

from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.functions.robots import (
    filter_allowed,
    parse_robots_txt,
    robots_match,
    robots_rules,
)

ROBOTS = """
# site policy
User-agent: *
Disallow: /private/
Allow: /private/press/
Disallow: /*.pdf$
Disallow: /tmp

User-agent: examplebot
User-agent: otherbot
Disallow: /only-for-example/

User-agent: examplebot-news
Allow: /

Sitemap: https://x.example/sitemap.xml
"""


def test_parse_group_selection():
    # generic agent: the * group
    star = parse_robots_txt(ROBOTS, "somebot")
    assert ("/private/", False) in star
    assert ("/only-for-example/", False) not in star
    # specific agent: ONLY its group (RFC: specific beats *)
    eb = parse_robots_txt(ROBOTS, "ExampleBot")
    assert eb == [("/only-for-example/", False)]
    # longest agent prefix wins: examplebot-news gets ITS group
    ebn = parse_robots_txt(ROBOTS, "examplebot-news/2.1")
    assert ebn == [("/", True)]
    # empty Disallow contributes nothing; rule-less file allows all
    assert parse_robots_txt("User-agent: *\nDisallow:\n", "x") == []
    assert parse_robots_txt("", "x") == []


def test_match_rfc_semantics():
    rules = parse_robots_txt(ROBOTS, "somebot")
    assert not robots_match(rules, "/private/data.html")
    # longer Allow overrides the shorter Disallow
    assert robots_match(rules, "/private/press/release.html")
    # wildcard + $ anchor
    assert not robots_match(rules, "/docs/file.pdf")
    assert robots_match(rules, "/docs/file.pdf.html")  # $ anchored
    # prefix semantics: /tmp also blocks /tmpfiles (RFC examples)
    assert not robots_match(rules, "/tmpfiles")
    assert robots_match(rules, "/public/x")  # no rule = allowed
    # length tie -> Allow wins
    tie = [("/dir/", False), ("/dir/", True)]
    assert robots_match(tie, "/dir/x")


def test_rules_table_and_cap(spark):
    df = spark.createDataFrame(
        [("a.example", ROBOTS),
         ("b.example", "User-agent: *\nDisallow: /\n"),
         ("c.example", None)],
        "host string, robots_txt string",
    )
    rules = robots_rules(df, agent="somebot")
    got = {
        (r["host"], r["pattern"]): (r["allow"], r["pattern_len"])
        for r in rules.collect()
    }
    assert got[("a.example", "/private/")] == (False, 9)
    assert got[("a.example", "/private/press/")] == (True, 15)
    assert got[("b.example", "/")] == (False, 1)
    assert not any(h == "c.example" for h, _p in got)
    # cap keeps the LONGEST patterns
    many = "User-agent: *\n" + "\n".join(
        f"Disallow: /p{i:04d}/" for i in range(600)
    )
    capped = robots_rules(
        spark.createDataFrame([("h.example", many)],
                              "host string, robots_txt string"),
        max_rules_per_host=10,
    ).collect()
    assert len(capped) == 10
    assert all(r["pattern_len"] == len("/p0000/") for r in capped)


def test_filter_allowed_frontier(spark):
    robots = spark.createDataFrame(
        [("site.example", ROBOTS),
         ("closed.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots, agent="somebot")
    docs = spark.createDataFrame(
        [
            (1, "http://site.example/public/a"),
            (2, "http://site.example/private/x"),
            (3, "http://site.example/private/press/y"),
            (4, "http://site.example/doc.pdf"),
            (5, "http://site.example/doc.pdf?utm_source=x"),
            (6, "http://closed.example/anything"),
            (7, "http://unknown.example/z"),   # no rules: allowed
            (8, None),                          # no URI: passes
            (9, "http://site.example/"),        # bare root path
        ],
        "doc_id long, uri string",
    )
    kept = {
        r["doc_id"] for r in filter_allowed(docs, rules).collect()
    }
    # 5: the PATH /doc.pdf still $-matches (query is appended after,
    # so '/doc.pdf?utm...' does NOT end at .pdf -> allowed; crawlers
    # differ here — ours matches path?query per the module contract)
    assert kept == {1, 3, 5, 7, 8, 9}
    strict = filter_allowed(docs, rules, keep_unknown_hosts=False)
    assert {r["doc_id"] for r in strict.collect()} == {1, 3, 5, 7, 9}


def test_read_robots_warc(spark, tmp_path):
    from haensel_ams_data_engineer_challenge_spark.sources.warc import (
        read_robots_warc,
    )

    def record(uri: str, body_text: bytes, status=b"200 OK"):
        body = (
            b"HTTP/1.1 " + status
            + b"\r\nContent-Type: text/plain\r\n\r\n" + body_text
        )
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + b"WARC-Target-URI: " + uri.encode() + b"\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n"
        )

    txt = b"User-agent: *\nDisallow: /secret/\n"
    shard = (
        record("http://a.example/robots.txt", txt)
        + record("http://a.example/robots.txt", txt[:10])  # truncated
        + record("http://a.example/page.html", b"<p>not robots</p>")
        + record("http://b.example/robots.txt", b"x", b"404 Not Found")
    )
    (tmp_path / "r.warc").write_bytes(shard)
    got = {
        r["host"]: r["robots_txt"]
        for r in read_robots_warc(spark, str(tmp_path)).collect()
    }
    # longest capture wins; non-robots paths and non-200s excluded
    assert got == {"a.example": txt.decode()}

    # e2e: the policy from the WARC gates a frontier
    rules = robots_rules(read_robots_warc(spark, str(tmp_path)))
    docs = spark.createDataFrame(
        [(1, "http://a.example/ok"), (2, "http://a.example/secret/x")],
        "doc_id long, uri string",
    )
    assert {
        r["doc_id"] for r in filter_allowed(docs, rules).collect()
    } == {1}


# ---------------------------------------------------------------------------
# sitemaps
# ---------------------------------------------------------------------------


def test_parse_sitemap_urlset_and_index():
    from haensel_ams_data_engineer_challenge_spark.functions.robots import (
        parse_sitemap,
    )

    urlset = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://x.example/a</loc><lastmod>2025-01-01</lastmod></url>
  <url><loc> http://x.example/b </loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""
    kind, entries = parse_sitemap(urlset)
    assert kind == "urlset"
    assert entries == [
        ("http://x.example/a", "2025-01-01"),
        ("http://x.example/b", None),
    ]
    index = """<sitemapindex>
  <sitemap><loc>http://x.example/sitemap1.xml</loc></sitemap>
  <sitemap><loc>http://x.example/sitemap2.xml</loc>
           <lastmod>2025-02-02</lastmod></sitemap>
</sitemapindex>"""
    kind, entries = parse_sitemap(index)
    assert kind == "sitemapindex"
    assert entries == [
        ("http://x.example/sitemap1.xml", None),
        ("http://x.example/sitemap2.xml", "2025-02-02"),
    ]
    # malformed / foreign XML: never raises
    assert parse_sitemap("<html><body>nope</body></html>") == ("", [])
    assert parse_sitemap("not xml at all <<<") == ("", [])
    assert parse_sitemap("") == ("", [])


def test_sitemap_entries_distributed_and_frontier_join(spark):
    from haensel_ams_data_engineer_challenge_spark.functions.robots import (
        sitemap_entries,
    )
    from haensel_ams_data_engineer_challenge_spark.functions.url import (
        canonical_url,
    )

    xml = (
        "<urlset>"
        "<url><loc>http://s.example/new?utm_source=x</loc></url>"
        "<url><loc>http://s.example/known/</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("s.example", xml), ("bad.example", "<<<")],
        "host string, sitemap_xml string",
    )
    entries = sitemap_entries(df)
    got = {(r["host"], r["loc"]) for r in entries.collect()}
    assert got == {
        ("s.example", "http://s.example/new?utm_source=x"),
        ("s.example", "http://s.example/known/"),
    }
    # frontier prime: canonical_url collapses the tracking variant and
    # the admitted store's URL tier rejects the known page
    admitted = spark.createDataFrame(
        [("http://s.example/known",)], "cu string"
    )
    fresh = (
        entries.withColumn("cu", canonical_url("loc"))
        .join(admitted, "cu", "left_anti")
    )
    assert [r["cu"] for r in fresh.collect()] == ["http://s.example/new"]
