"""Link graph + PageRank (sources/warc.read_links_warc,
operators/linkgraph.py — round 15, r14 verdict #2): anchor extraction
goldens, URL-keyed edges, host graph, PageRank vs a transparent python
power-iteration reference (convergence + dangling handling + mass
conservation), and WARC -> host-rank e2e through the CLI."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators.linkgraph import (
    host_graph,
    link_edges,
    pagerank,
)
from haensel_ams_data_engineer_challenge_spark.sources.htmltext import (
    extract_links,
)

# ---------------------------------------------------------------------------
# python power-iteration reference
# ---------------------------------------------------------------------------


def _py_pagerank(edges, d=0.85, iters=60):
    """Transparent reference: dense power iteration with uniform
    dangling redistribution over the distinct edge set."""
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    out = [0] * n
    for u, _v in edges:
        out[idx[u]] += 1
    r = [1.0 / n] * n
    for _ in range(iters):
        dangling = sum(r[i] for i in range(n) if out[i] == 0)
        nxt = [(1.0 - d) / n + d * dangling / n] * n
        for u, v in edges:
            nxt[idx[v]] += d * r[idx[u]] / out[idx[u]]
        r = nxt
    return dict(zip(nodes, r))


# ---------------------------------------------------------------------------
# anchor extraction
# ---------------------------------------------------------------------------


def test_extract_links_goldens():
    html = (
        '<p>See <a href="/a">first link</a> and'
        ' <a href="https://x.example/b#frag">second</a>.'
        "<a>no href</a>"
        '<a href="">empty href</a>'
        '<nav><a href="/nav">nav link</a></nav>'
        '<script>document.write(\'<a href="/js">x</a>\')</script>'
        '<a href="/open">unclosed <a href="/next">next</a>'
    )
    got = extract_links(html)
    # nav anchors ARE edges (chrome pruning is a TEXT decision, the
    # graph wants them); script content is CDATA, invisible; an
    # unclosed <a> flushes at the next <a>
    assert got == [
        ("/a", "first link", False),
        ("https://x.example/b#frag", "second", False),
        ("/nav", "nav link", False),
        ("/open", "unclosed", False),
        ("/next", "next", False),
    ]
    assert extract_links("") == []
    assert extract_links("<p>no anchors here</p>") == []


def test_link_edges_canonicalize_and_filter(spark):
    df = spark.createDataFrame(
        [
            ("HTTP://A.example:80/p/", "http://b.example/q?utm_source=x",
             "hi"),
            ("http://a.example/p", "mailto-less /relative", "bad dst"),
            (None, "http://b.example/q", "no src"),
        ],
        "src_uri string, dst_uri string, anchor_text string",
    )
    rows = link_edges(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["src"] == "http://a.example/p"
    assert r["dst"] == "http://b.example/q"
    assert (r["src_host"], r["dst_host"]) == ("a.example", "b.example")


def test_host_graph_weights_and_self_loops(spark):
    rows = [
        ("http://a.example/1", "http://b.example/x", ""),
        ("http://a.example/2", "http://b.example/y", ""),
        ("http://a.example/1", "http://a.example/2", ""),  # self loop
        ("http://b.example/x", "http://c.example/", ""),
    ]
    df = spark.createDataFrame(
        rows, "src_uri string, dst_uri string, anchor_text string"
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(df).collect()
    }
    assert got == {
        ("a.example", "b.example"): 2,
        ("b.example", "c.example"): 1,
    }


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(
        list(edges), "src_host string, dst_host string"
    )
    return {
        r["node"]: r["rank"] for r in pagerank(df, **kw).collect()
    }


def test_pagerank_matches_reference_with_dangling(spark):
    """A hub, a cycle and a SINK (dangling node d): ranks match the
    dense reference to float tolerance and sum to 1."""
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),  # cycle
        ("a", "d"), ("b", "d"), ("c", "d"),  # d is a sink (dangling)
        ("e", "a"),                          # e only points in
    ]
    got = _spark_ranks(spark, edges, max_iter=60, tol=0.0)
    want = _py_pagerank(edges, iters=60)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9, abs=1e-12), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the sink received from everyone: top rank; e (no in-links) floor
    top = max(got, key=got.get)
    assert top == "d" and min(got, key=got.get) == "e"


def test_pagerank_converges_before_max_iter(spark):
    """tol stops the loop early: a tight tolerance run equals a
    max_iter-exhausted run to float noise (geometric convergence)."""
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")]
    fast = _spark_ranks(spark, edges, max_iter=100, tol=1e-12)
    want = _py_pagerank(edges, iters=200)
    for v in want:
        assert fast[v] == pytest.approx(want[v], rel=1e-8), v


def test_pagerank_duplicate_edges_and_validation(spark):
    """Duplicate (src, dst) rows collapse (distinct-edge convention);
    bad parameters refuse."""
    once = _spark_ranks(spark, [("a", "b"), ("b", "a")], max_iter=20)
    dup = _spark_ranks(
        spark, [("a", "b"), ("a", "b"), ("b", "a")], max_iter=20
    )
    assert once == dup
    df = _dummy_edges(pytest.importorskip("pyspark").sql.SparkSession
                      .getActiveSession())
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="max_iter"):
        pagerank(df, max_iter=-1)


def _dummy_edges(spark):
    return spark.createDataFrame(
        [("a", "b")], "src_host string, dst_host string"
    )


def test_pagerank_uniform_at_zero_iters(spark):
    got = _spark_ranks(spark, [("a", "b"), ("c", "d")], max_iter=0)
    assert all(v == pytest.approx(0.25) for v in got.values())


# ---------------------------------------------------------------------------
# WARC e2e
# ---------------------------------------------------------------------------


def _record(uri: str, payload: bytes) -> bytes:
    hdr = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return hdr + payload + b"\r\n\r\n"


def _page(uri: str, hrefs: list[str]) -> bytes:
    body = "".join(
        f'<p>Read <a href="{h}">about {i}</a> now.</p>'
        for i, h in enumerate(hrefs)
    ).encode()
    html = b"<html><body>" + body + b"</body></html>"
    return _record(
        uri,
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html,
    )


def test_cli_linkgraph_warc_e2e(spark, tmp_path, capsys):
    """WARC shards -> linkgraph CLI -> host_graph + host_rank tables:
    relative hrefs resolve against the page URI, the hub host
    everyone links to outranks the spokes, ranks match the python
    reference on the same host edges."""
    from haensel_ams_data_engineer_challenge_spark.__main__ import main

    shard1 = (
        _page("http://hub.example/", ["/local", "http://s1.example/a"])
        + _page("http://s1.example/a",
                ["http://hub.example/x", "../y",
                 "mailto:x@example.com", "javascript:void(0)"])
    )
    shard2 = (
        _page("http://s2.example/b", ["http://hub.example/", "#frag"])
        + _page("http://s3.example/c",
                ["http://hub.example/z", "http://s1.example/a"])
    )
    (tmp_path / "w1.warc").write_bytes(shard1)
    (tmp_path / "w2.warc.gz").write_bytes(gzip.compress(shard2))

    work = str(tmp_path / "wd")
    assert main([
        "linkgraph", "--warc-dir", str(tmp_path), "--work-dir", work,
        "--max-iter", "200", "--tol", "1e-12",
    ]) == 0
    out = capsys.readouterr().out
    assert "hosts=" in out

    hg = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in spark.read.parquet(f"{work}/host_graph").collect()
    }
    # hub -> s1; s1 -> hub (the ../y edge is s1-internal: self loop
    # dropped; mailto/javascript/#frag are not edges)
    assert hg[("hub.example", "s1.example")] == 1
    assert hg[("s1.example", "hub.example")] == 1
    assert hg[("s2.example", "hub.example")] == 1
    assert hg[("s3.example", "hub.example")] == 1
    assert hg[("s3.example", "s1.example")] == 1
    assert ("s1.example", "s1.example") not in hg

    ranks = {
        r["host"]: r["rank"]
        for r in spark.read.parquet(f"{work}/host_rank").collect()
    }
    want = _py_pagerank(list(hg), iters=200)
    for v in want:
        assert ranks[v] == pytest.approx(want[v], rel=1e-6), v
    assert max(ranks, key=ranks.get) == "hub.example"


# ---------------------------------------------------------------------------
# weighted pagerank + the host-rank quality signal
# ---------------------------------------------------------------------------


def _py_pagerank_weighted(wedges, d=0.85, iters=60):
    """Dense reference with edge weights: rank splits by weight."""
    agg: dict = {}
    for u, v, w in wedges:
        agg[(u, v)] = agg.get((u, v), 0.0) + float(w)
    nodes = sorted({x for u, v in agg for x in (u, v)})
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    out_w = [0.0] * n
    for (u, _v), w in agg.items():
        out_w[idx[u]] += w
    r = [1.0 / n] * n
    for _ in range(iters):
        dangling = sum(r[i] for i in range(n) if out_w[i] == 0.0)
        nxt = [(1.0 - d) / n + d * dangling / n] * n
        for (u, v), w in agg.items():
            nxt[idx[v]] += d * r[idx[u]] * w / out_w[idx[u]]
        r = nxt
    return dict(zip(nodes, r))


def test_pagerank_weighted_matches_reference(spark):
    wedges = [
        ("a", "b", 9), ("a", "c", 1),  # a favors b 9:1
        ("b", "a", 1), ("c", "a", 1),
        ("c", "d", 3),                 # d is a weighted sink
    ]
    df = spark.createDataFrame(
        wedges, "src_host string, dst_host string, n_links long"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, weight="n_links", max_iter=60, tol=0.0
        ).collect()
    }
    want = _py_pagerank_weighted(wedges, iters=60)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), v
    # the 9:1 preference shows: b far outranks c
    assert got["b"] > 2 * got["c"]
    # duplicate weighted rows SUM (not distinct-collapse)
    dup = spark.createDataFrame(
        [("a", "b", 5), ("a", "b", 4), ("a", "c", 1),
         ("b", "a", 1), ("c", "a", 1), ("c", "d", 3)],
        "src_host string, dst_host string, n_links long",
    )
    got_dup = {
        r["node"]: r["rank"]
        for r in pagerank(
            dup, weight="n_links", max_iter=60, tol=0.0
        ).collect()
    }
    for v in want:
        assert got_dup[v] == pytest.approx(want[v], rel=1e-9), v
    # unweighted over the same rows ignores n_links entirely
    got_unw = {
        r["node"]: r["rank"]
        for r in pagerank(df, max_iter=60, tol=0.0).collect()
    }
    want_unw = _py_pagerank(
        [(u, v) for u, v, _w in wedges], iters=60
    )
    for v in want_unw:
        assert got_unw[v] == pytest.approx(want_unw[v], rel=1e-9), v


def test_host_rank_signal_join_and_percentile(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.linkgraph import (
        host_rank_signal,
    )

    ranks = spark.createDataFrame(
        [("low.example", 0.1), ("mid.example", 0.3),
         ("top.example", 0.6)],
        "node string, rank double",
    )
    docs = spark.createDataFrame(
        [
            (1, "HTTP://Top.Example:80/page/"),   # canonicalizes
            (2, "http://mid.example/x?utm_source=a"),
            (3, "http://low.example/y"),
            (4, "http://unranked.example/z"),     # not in the graph
            (5, None),                            # no URI
        ],
        "doc_id long, uri string",
    )
    got = {
        r["doc_id"]: (r["host_rank"], r["host_rank_pct"])
        for r in host_rank_signal(docs, ranks).collect()
    }
    assert got[1] == (0.6, pytest.approx(1.0))
    assert got[2] == (0.3, pytest.approx(2 / 3))
    assert got[3] == (0.1, pytest.approx(1 / 3))
    assert got[4] == (None, None)  # absent, not low
    assert got[5] == (None, None)
    # the threshold gate production pipelines run
    kept = host_rank_signal(docs, ranks).filter(
        F.coalesce(F.col("host_rank_pct"), F.lit(1.0)) >= 0.5
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 4, 5}


def test_anchor_texts_aggregation_and_retrieval_expansion(spark):
    """Inbound anchors aggregate per canonical destination (bounded,
    deterministic, self-host excluded) and expand retrieval: a BM25
    query term that appears ONLY in anchors still retrieves the
    target page."""
    from haensel_ams_data_engineer_challenge_spark.operators.linkgraph import (
        anchor_texts,
    )
    from haensel_ams_data_engineer_challenge_spark.operators.retrieval import (
        bm25_topk,
    )

    links = spark.createDataFrame(
        [
            ("http://a.example/", "http://t.example/paper?utm_source=x",
             "the quasar survey results"),
            ("http://b.example/", "HTTP://T.Example:80/paper",
             "quasar catalog"),
            # self-host navigation: excluded from the description
            ("http://t.example/nav", "http://t.example/paper", "home"),
            ("http://c.example/", "http://t.example/paper", "  "),
            ("http://c.example/", "http://other.example/x", "boats"),
        ],
        "src_uri string, dst_uri string, anchor_text string",
    )
    got = {r["dst"]: r for r in anchor_texts(links).collect()}
    paper = got["http://t.example/paper"]
    assert paper["anchor_text"] == "quasar catalog the quasar survey results"
    assert paper["n_anchors"] == 2
    assert "home" not in paper["anchor_text"]
    # cap bounds the group state
    many = spark.createDataFrame(
        [(f"http://s{i}.example/", "http://hot.example/", f"anchor {i}")
         for i in range(30)],
        "src_uri string, dst_uri string, anchor_text string",
    )
    capped = anchor_texts(many, max_anchors=5).collect()[0]
    assert capped["n_anchors"] == 30
    assert len(capped["anchor_text"].split(" ")) == 10  # 5 anchors x 2 words

    # retrieval expansion: the page body never says "quasar"
    docs = spark.createDataFrame(
        [(1, "a study of compact radio sources", "http://t.example/paper"),
         (2, "boats on the lake at dawn", "http://other.example/x")],
        "doc_id long, text string, uri string",
    )
    from haensel_ams_data_engineer_challenge_spark.functions.url import (
        canonical_url,
    )

    expanded = docs.join(
        anchor_texts(links).withColumnRenamed("anchor_text", "__anchor"),
        canonical_url("uri") == F.col("dst"),
        "left",
    ).select(
        "doc_id",
        F.concat_ws(
            " ", F.col("text"), F.coalesce(F.col("__anchor"), F.lit(""))
        ).alias("text"),
    )
    queries = spark.createDataFrame(
        [(100, "quasar survey")], "query_id long, text string"
    )
    plain_hits = bm25_topk(docs, queries, k=1).collect()
    exp_hits = bm25_topk(expanded, queries, k=1).collect()
    assert not plain_hits or plain_hits[0]["n_matched"] == 0
    assert exp_hits and exp_hits[0]["doc_id"] == 1
    assert exp_hits[0]["n_matched"] == 2


# ---------------------------------------------------------------------------
# nofollow + domain rollup (round 15 second half)
# ---------------------------------------------------------------------------


def test_extract_links_nofollow_flags():
    html = (
        '<a href="/a" rel="nofollow">spam</a>'
        '<a href="/b" rel="ugc sponsored">comment</a>'
        '<a href="/c" rel="noopener">fine</a>'
        '<a href="/d">plain</a>'
    )
    assert extract_links(html) == [
        ("/a", "spam", True),
        ("/b", "comment", True),
        ("/c", "fine", False),
        ("/d", "plain", False),
    ]


def test_host_graph_excludes_nofollow_by_default(spark):
    links = spark.createDataFrame(
        [
            ("http://a.example/", "http://b.example/", "ok", False),
            ("http://a.example/", "http://spam.example/", "buy", True),
            ("http://c.example/", "http://b.example/", "also", None),
        ],
        "src_uri string, dst_uri string, anchor_text string, "
        "nofollow boolean",
    )
    got = {
        (r["src_host"], r["dst_host"])
        for r in host_graph(links).collect()
    }
    assert got == {
        ("a.example", "b.example"),
        ("c.example", "b.example"),  # NULL nofollow = followed
    }
    all_edges = {
        (r["src_host"], r["dst_host"])
        for r in host_graph(links, follow_only=False).collect()
    }
    assert ("a.example", "spam.example") in all_edges


def test_warc_links_carry_nofollow(spark, tmp_path):
    from haensel_ams_data_engineer_challenge_spark.sources.warc import (
        read_links_warc,
    )

    html = (
        b'<p><a href="/f">follow me</a>'
        b'<a href="http://s.example/" rel="nofollow">not me</a></p>'
    )
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://h.example/p\r\n"
        + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body + b"\r\n\r\n"
    )
    (tmp_path / "n.warc").write_bytes(rec)
    got = {
        r["dst_uri"]: r["nofollow"]
        for r in read_links_warc(spark, str(tmp_path)).collect()
    }
    assert got == {
        "http://h.example/f": False,
        "http://s.example/": True,
    }


def test_registered_domain_rollup(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.linkgraph import (
        registered_domain,
    )

    cases = {
        "news.bbc.co.uk": "bbc.co.uk",
        "www.example.com": "example.com",
        "a.b.c.example.org": "example.org",
        "Example.COM": "example.com",
        "blogs.shop.com.au": "shop.com.au",
        "example.com": "example.com",
        "localhost": "localhost",
        "192.168.10.1": "192.168.10.1",
        "co.uk": "co.uk",  # the bare suffix has no registrant label
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = [
        r["d"]
        for r in df.select(registered_domain("h").alias("d")).collect()
    ]
    assert got == list(cases.values())
    # extra_multipart extends the registry set
    df2 = spark.createDataFrame([("x.y.custom.zz",)], "h string")
    assert df2.select(
        registered_domain("h", ("custom.zz",)).alias("d")
    ).collect()[0]["d"] == "y.custom.zz"
    assert df2.select(
        registered_domain("h").alias("d")
    ).collect()[0]["d"] == "custom.zz"


def test_domain_graph_collapses_subdomain_farms(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.linkgraph import (
        domain_graph,
        pagerank,
    )

    # a tenant-blog farm interlinking its own subdomains mints host-
    # graph edges but ZERO domain-graph edges
    links = spark.createDataFrame(
        [
            ("http://u1.farm.example/", "http://u2.farm.example/", "x",
             False),
            ("http://u2.farm.example/", "http://u3.farm.example/", "x",
             False),
            ("http://news.bbc.co.uk/a", "http://shop.example.com/b",
             "real", False),
            ("http://m.example.com/", "http://www.example.com/", "nav",
             False),
        ],
        "src_uri string, dst_uri string, anchor_text string, "
        "nofollow boolean",
    )
    hg = host_graph(links)
    assert hg.count() == 4  # every host pair distinct at host level
    dg = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in domain_graph(links).collect()
    }
    assert dg == {("bbc.co.uk", "example.com"): 1}
    # pagerank runs over the domain rollup directly
    ranks = pagerank(dg_df := domain_graph(links),
                     src="src_domain", dst="dst_domain", max_iter=10)
    assert {r["node"] for r in ranks.collect()} \
        == {"bbc.co.uk", "example.com"}


# ---------------------------------------------------------------------------
# harmonic centrality (HyperBall)
# ---------------------------------------------------------------------------


def _twin_hll(edges, node_hash, max_radius=32):
    """Python twin of the engine's HyperBall machinery — SAME register
    convention (index = low 6 hash bits, bitmask of trailing-zero
    rank + 1), SAME estimator (left-fold order, alpha_64, small-range
    correction), SAME monotone-clamped harmonic accumulation — fed
    the engine's own xxhash64 values so the runs are comparable
    bit-for-bit."""
    import math

    m = 64

    def init_regs(h):
        hu = h & (2**64 - 1)
        idx = hu & 63
        w = hu >> 6
        rank = 59 if w == 0 else ((w & -w).bit_length() - 1) + 1
        regs = [0] * m
        regs[idx] = 1 << rank
        return regs

    def est(regs):
        z = 0.0
        v = 0
        for r in regs:
            mj = 0 if r == 0 else r.bit_length() - 1
            z += 2.0 ** -mj
            v += 1 if r == 0 else 0
        raw = 0.709 * m * m / z
        if raw <= 2.5 * m and v > 0:
            return m * math.log(m / v)
        return raw

    nodes = sorted({x for e in edges for x in e})
    regs = {v: init_regs(node_hash[v]) for v in nodes}
    estp = {v: est(regs[v]) for v in nodes}
    harm = {v: 0.0 for v in nodes}
    trace = []
    for r in range(1, max_radius + 1):
        nxt = {v: list(regs[v]) for v in nodes}
        for u, v in edges:
            nxt[v] = [a | b for a, b in zip(nxt[v], regs[u])]
        changed = False
        for v in nodes:
            e2 = est(nxt[v])
            if e2 != estp[v]:
                changed = True
            harm[v] += max((e2 - estp[v]) / r, 0.0)
            estp[v] = e2
        regs = nxt
        trace.append(sum(estp.values()))
        if not changed:
            break
    return harm, estp, trace


def test_harmonic_bit_equal_to_python_twin(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.linkgraph import (
        harmonic_centrality,
    )

    rng = __import__("random").Random(42)
    nodes = [f"h{i}.example" for i in range(40)]
    edges = sorted({
        (nodes[rng.randrange(40)], nodes[rng.randrange(40)])
        for _ in range(120)
    })
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    node_hash = {
        r["node"]: r["h"]
        for r in df.selectExpr("src_host as node").union(
            df.selectExpr("dst_host as node")
        ).distinct().selectExpr("node", "xxhash64(node) as h").collect()
    }
    log: list[float] = []
    got = {
        r["node"]: (r["harmonic"], r["n_coreachable"])
        for r in harmonic_centrality(df, round_log=log).collect()
    }
    want_h, want_e, trace = _twin_hll(edges, node_hash)
    assert set(got) == set(want_h)
    for v in want_h:
        assert got[v][0] == pytest.approx(want_h[v], rel=1e-12, abs=1e-12), v
        assert got[v][1] == pytest.approx(want_e[v], rel=1e-12), v
    assert len(log) == len(trace)
    for a, b in zip(log, trace):
        assert a == pytest.approx(b, rel=1e-12)


def test_harmonic_accuracy_and_hub_on_exact_bfs(spark):
    """Against exact BFS harmonic centrality: per-node error within
    the small-range (linear-counting) regime's tolerance, the clear
    hub identified, and the convergence radius = diameter + 1."""
    from haensel_ams_data_engineer_challenge_spark.operators.linkgraph import (
        harmonic_centrality,
    )

    # a hub everyone links to (directly or via a chain)
    edges = [(f"s{i}.example", "hub.example") for i in range(8)]
    edges += [(f"c{i}.example", f"c{i+1}.example") for i in range(4)]
    edges += [("c4.example", "hub.example")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")

    # exact harmonic by BFS over the reversed graph
    from collections import deque

    nodes = sorted({x for e in edges for x in e})
    rev: dict[str, list[str]] = {v: [] for v in nodes}
    fwd: dict[str, list[str]] = {v: [] for v in nodes}
    for u, v in edges:
        fwd[u].append(v)
    exact = {}
    for v in nodes:
        # d(u, v) for all u: BFS over reversed edges from v
        dist = {v: 0}
        q = deque([v])
        while q:
            x = q.popleft()
            for u in nodes:
                if x in fwd[u] and u not in dist:
                    dist[u] = dist[x] + 1
                    q.append(u)
        exact[v] = sum(1.0 / d for u, d in dist.items() if d > 0)

    log: list[float] = []
    got = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(df, round_log=log).collect()
    }
    assert max(got, key=got.get) == "hub.example"
    for v in nodes:
        if exact[v] > 0:
            assert got[v] == pytest.approx(exact[v], rel=0.25), (
                v, exact[v], got[v]
            )
        else:
            assert got[v] == 0.0, v
    # diameter = 6 (c0 -> ... -> c4 -> hub is 6 hops); +1 confirm round
    assert len(log) <= 8


def test_cli_linkgraph_domain_harmonic(spark, tmp_path, capsys):
    """CLI --level domain --metric harmonic: the rollup + HyperBall
    path end-to-end, with the hub domain top-ranked."""
    from haensel_ams_data_engineer_challenge_spark.__main__ import main

    shard = (
        _page("http://a.s1.example/", ["http://www.hub.example/x"])
        + _page("http://b.s2.example/", ["http://hub.example/y"])
        + _page("http://news.bbc.co.uk/", ["http://hub.example/"])
    )
    (tmp_path / "w.warc").write_bytes(shard)
    work = str(tmp_path / "wd")
    assert main([
        "linkgraph", "--warc-dir", str(tmp_path), "--work-dir", work,
        "--level", "domain", "--metric", "harmonic",
    ]) == 0
    out = capsys.readouterr().out
    assert "metric=harmonic" in out and "domains=" in out
    ranks = {
        r["domain"]: r["rank"]
        for r in spark.read.parquet(f"{work}/domain_rank").collect()
    }
    # www.hub.example and hub.example collapse into ONE domain node
    assert "hub.example" in ranks
    assert "www.hub.example" not in ranks
    assert "bbc.co.uk" in ranks  # multi-part suffix rolled correctly
    assert max(ranks, key=ranks.get) == "hub.example"
    g = {
        (r["src_domain"], r["dst_domain"])
        for r in spark.read.parquet(f"{work}/domain_graph").collect()
    }
    assert ("s1.example", "hub.example") in g
    assert ("bbc.co.uk", "hub.example") in g
