"""Boilerplate-share measurement for the WARC HTML->text seam
(round 14, r13 verdict task 2's "done" gate).

Synthesizes a crawl of article pages wrapped in site chrome (nav +
sidebar link lists + cookie banner + footer), runs BOTH extractors on
every page, and reports per-extractor:

- boilerplate_share: chrome chars / extracted chars (how much of what
  we admit is noise);
- article_recall: fraction of true article chars recovered;
- wall seconds for the extraction loop (pure Python, single thread —
  the per-record unit cost the mapInPandas tasks pay).

Deterministic synthesis (id-seeded), no Spark needed: the seam is
per-payload CPU.  Run: python tools/warc_extract_bench.py [n_pages]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from haensel_ams_data_engineer_challenge_spark.sources.htmltext import (  # noqa: E402
    extract_main_text,
)
from haensel_ams_data_engineer_challenge_spark.sources.warc import (  # noqa: E402
    _extract_text,
)

NOUNS = ["fox", "dog", "river", "stone", "cloud", "tree", "boat", "road",
         "lamp", "field", "wire", "glass"]
CHROME_LINKS = ["Home", "About us", "Contact", "Careers", "Press room",
                "Advertise here", "Subscribe now", "Sign in"]


def article_paragraphs(i: int, n_paras: int = 4) -> list[str]:
    paras = []
    for p in range(n_paras):
        words = [
            f"the {NOUNS[(i + p + j) % len(NOUNS)]}{i} went past the "
            f"{NOUNS[(i + 2 * j + p) % len(NOUNS)]} and kept moving on"
            for j in range(6 + (i + p) % 5)
        ]
        paras.append(" ".join(words) + ".")
    return paras


def chrome_parts(i: int) -> dict[str, str]:
    nav = "".join(
        f'<li><a href="/{k}">{w}</a></li>'
        for k, w in enumerate(CHROME_LINKS)
    )
    side = "".join(
        f'<li><a href="/p{i}{k}">Trending story number {k} you must '
        f"read</a></li>"
        for k in range(6)
    )
    return {
        "nav": f"<header><div>SiteBrand</div><nav><ul>{nav}</ul></nav></header>",
        "side": f'<div class="sidebar"><h3>Trending</h3><ul>{side}</ul></div>',
        "banner": "<div><p>We use cookies to improve your experience. "
                  '<a href="/privacy">Learn more</a> or '
                  '<a href="/accept">accept all</a>.</p></div>',
        "footer": "<footer><p>Copyright 2099 SiteBrand Media Group. All "
                  "rights reserved. Privacy policy. Terms of service. "
                  "Do not sell my data.</p></footer>",
    }


def page(i: int) -> tuple[str, list[str], list[str]]:
    """(html, article_paras, chrome_texts)."""
    paras = article_paragraphs(i)
    ch = chrome_parts(i)
    body = (
        ch["nav"] + ch["banner"] + ch["side"]
        + "<article><h2>Headline %d</h2>" % i
        + "".join(f"<p>{p}</p>" for p in paras)
        + "</article>" + ch["footer"]
    )
    chrome_texts = ["SiteBrand", *CHROME_LINKS, "Trending",
                    "We use cookies", "Copyright 2099"]
    return f"<html><head><title>t</title></head><body>{body}</body></html>", \
        paras, chrome_texts


def measure(extract, pages) -> dict:
    t0 = time.perf_counter()
    outs = [extract(html) for html, _p, _c in pages]
    wall = time.perf_counter() - t0
    total_chars = sum(len(o) for o in outs)
    chrome_chars = 0
    recalled = possible = 0
    for out, (_html, paras, chrome_texts) in zip(outs, pages):
        for c in chrome_texts:
            if c in out:
                chrome_chars += len(c)
        for p in paras:
            possible += len(p)
            # whitespace-normalized containment (the crude strip
            # collapses to single spaces; the extractor keeps blocks)
            if " ".join(p.split()) in " ".join(out.split()):
                recalled += len(p)
    return {
        "wall_s": round(wall, 3),
        "chars_out_total": total_chars,
        "boilerplate_share": round(chrome_chars / max(1, total_chars), 4),
        "article_recall": round(recalled / max(1, possible), 4),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    pages = [page(i) for i in range(n)]
    out = {
        "n_pages": n,
        "crude": measure(_extract_text, pages),
        "main": measure(extract_main_text, pages),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
