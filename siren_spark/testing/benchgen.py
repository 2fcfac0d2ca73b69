"""Distributed deterministic bench-scale synthetic web.

The sandbox stand-in for the 10^10-URL frontier (BASELINE.md): same code
path as the pytest fixtures, generated distributively with Spark so the
pages table scales to 10^5-10^7 rows without a driver-side loop. All
content is a pure function of the row id (no RNG state), so any two runs
— at any parallelism — generate byte-identical tables.

Shape (mirror dialect, ids 0..n_index-1 are search pages):
- index i lives on domain D(i), zipf-ish skewed: domain 0 carries ~30%
  of pages (the hot-host case the salted politeness window exists for);
- index i links articles [i*L, (i+1)*L) — parent unique, so article
  aid's domain D(aid // L) always matches the index that links it — plus
  its first ``dup_links`` articles twice (in-frontier dedup work);
- every 97th article page is withheld from the table (fetch-miss /
  deferred counter work).

The crawl therefore runs exactly 2 generations: round 0 fetches all
indexes, round 1 fetches all discovered articles.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from siren_spark.urls import canonicalize_url

_WORDS = (
    "city report council water power metro school hospital court police "
    "village farmer market festival rain flood road bridge train station "
    "minister election budget protest strike health crisis rescue relief"
).split()
_N_WORDS = len(_WORDS)

MISS_EVERY = 97  # article pages withheld from the table


def _dom(i: int, n_domains: int) -> str:
    d = 0 if (i * 2654435761) % 10 < 3 else 1 + (i * 40503) % (n_domains - 1)
    return f"site{d}.example"


def _words(seed: int, n: int, keyword: str | None = None) -> str:
    ws = [_WORDS[(seed * 31 + j * 97 + (seed >> 7)) % _N_WORDS] for j in range(n)]
    if keyword and seed % 3 == 0:
        ws[seed % n] = keyword
    return " ".join(ws)


def article_page(aid: int, links_per_index: int, n_domains: int):
    """(url, html, expected_text) for article aid."""
    domain = _dom(aid // links_per_index, n_domains)
    url = f"https://{domain}/news/story-{aid}"
    headline = _words(aid, 6, "crisis")
    desc = _words(aid + 7, 40)
    day = 1 + aid % 28
    month = 10 + (aid // 28) % 3
    ld = {
        "url": url,
        "datePublished": f"2022-{month:02d}-{day:02d}T10:00:00",
        "dateModified": f"2022-{month:02d}-{day:02d}T12:00:00",
        "headline": headline,
        "description": desc,
        "author": {"name": f"reporter-{aid % 97}"},
        "thumbnailUrl": f"https://{domain}/img/{aid}.jpg",
    }
    # realistic page weight: nav cruft + ~35 paragraphs ≈ 20 KB — parse
    # cost ~2 ms/page, so extraction (the real work) dominates the bench
    nav = "".join(
        f'<li class="nav-item"><a href="/section/{j}">s{j}</a></li>'
        for j in range(40)
    )
    paras = "".join(
        f'<p class="para">{_words(aid + 13 + j, 60)}</p>' for j in range(35)
    )
    html = (
        "<html><head><script type=\"application/ld+json\">"
        + json.dumps(ld)
        + f"</script></head><body><ul class='nav'>{nav}</ul>"
        + f"<div class='m'>{paras}</div></body></html>"
    )
    return url, html, f"{headline}\n{desc}"


def index_page(i: int, links_per_index: int, n_domains: int,
               dup_links: int = 3):
    domain = _dom(i, n_domains)
    url = f"https://{domain}/getsearchdata.cms?pagenumber={i}&query=crisis"
    aids = list(range(i * links_per_index, (i + 1) * links_per_index))
    # cross-page duplicate discoveries (the within-page ones are removed
    # by the kernels' reference done-set semantics): when the next index
    # shares this page's domain, also link its first few articles
    if _dom(i + 1, n_domains) == domain:
        aids += list(range((i + 1) * links_per_index,
                           (i + 1) * links_per_index + dup_links))
    anchors = "".join(f'<a href="/story-{a}">x</a>' for a in aids)
    html = (
        '<html><body><div class="searchcontent">' + anchors
        + '<div class="Pagination clearfix"><a href="/p2">2</a></div>'
        + "</div></body></html>"
    )
    return url, html


def gen_bench_pages(
    spark: SparkSession,
    *,
    n_index: int = 2000,
    links_per_index: int = 50,
    n_domains: int = 20,
    partitions: int = 64,
) -> tuple[DataFrame, DataFrame, int]:
    """Build (pages, seeds, n_articles) for the crawl bench."""
    n_articles = n_index * links_per_index

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, htmls, texts = [], [], []
            for raw in pdf["id"]:
                i = int(raw)
                if i < n_index:
                    url, html = index_page(i, links_per_index, n_domains)
                    text = ""
                else:
                    aid = i - n_index
                    if aid % MISS_EVERY == 13:
                        continue  # withheld -> fetch miss
                    url, html, text = article_page(aid, links_per_index,
                                                   n_domains)
                urls.append(url)
                htmls.append(html.encode())
                texts.append(text)
            yield pd.DataFrame({
                "url": urls,
                "url_canon": [canonicalize_url(u) for u in urls],
                "html": htmls, "text": texts,
            })

    total = n_index + n_articles
    pages = (
        spark.range(0, total, 1, partitions)
        .mapInPandas(gen, "url string, url_canon string, html binary, text string")
        .selectExpr("url", "url_canon",
                    "timestamp'2022-11-01 00:00:00' as warc_ts",
                    "html", "text", "'en' as lang")
    )

    def gen_seeds(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = [index_page(int(i), links_per_index, n_domains)[0]
                    for i in pdf["id"]]
            yield pd.DataFrame({"url": urls})

    seeds = (
        spark.range(0, n_index, 1, 8)
        .mapInPandas(gen_seeds, "url string")
        .selectExpr("url", "'crisis' as keyword", "'mirror' as source",
                    "map('keyword', 'crisis') as meta")
    )
    return pages, seeds, n_articles
