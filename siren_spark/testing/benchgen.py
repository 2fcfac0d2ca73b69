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

``waves`` chains the crawl depth: indexes split into ``waves``
contiguous blocks, only wave 0 is seeded, and index i carries one
absolute-URL anchor to index i + wave_size (absolute hrefs pass the
mirror kernel's /news/ join untouched, urls.py join_url). Round r then
fetches wave-r indexes plus wave-(r-1) articles: waves+1 generations
total, with ``waves`` steady full-volume rounds — the multi-round
steady window the N->4N scaling evidence measures (a 10^10-URL crawl is
thousands of such rounds). waves=1 reproduces the old 2-round shape.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def article_url(aid: int, links_per_index: int, n_domains: int) -> str:
    domain = _dom(aid // links_per_index, n_domains)
    return f"https://{domain}/news/story-{aid}"


def index_url(i: int, n_domains: int) -> str:
    domain = _dom(i, n_domains)
    return f"https://{domain}/getsearchdata.cms?pagenumber={i}&query=crisis"


# ---------------------------------------------------------------------------
# toi strand: a second dialect at bench volume. The mirror pages cover
# the HTML kernels; these cover the JSON search-API kernel (dispatch by
# registered domain, F1 page arithmetic incl. the reference's +2
# over-fetch, and meta carry-forward through Link(dict(meta))). One
# chain per wave: page 1 is seeded (wave 0) or anchored from the first
# index page of the previous wave, so its ~wave_size-page fan-out lands
# in every steady round alongside that wave's articles.
# ---------------------------------------------------------------------------

TOI_LIMIT = 50  # must match kernels.sites.TOI_LIMIT


def toi_url(wave: int, page: int) -> str:
    return (f"https://toi-epaper.example/api/search?"
            f"edition=e{wave}&page={page}")


def toi_page(wave: int, page: int, toi_pages: int) -> str:
    """JSON payload for toi chain ``wave``, page ``page`` (1-based).

    totalDocs = TOI_LIMIT * toi_pages, so the kernel's fan-out
    (pages 2 .. totalDocs//50 + 2, toi.py:190-196) covers every real
    page plus the reference's two deliberate over-fetch pages — which
    this generator does NOT emit, so they land as 'missing' counters
    exactly like the reference's empty trailing pages."""
    arts = []
    for s in range(TOI_LIMIT):
        aid = (wave * toi_pages + (page - 1)) * TOI_LIMIT + s
        day = 1 + aid % 28
        arts.append({
            "title": _words(aid, 6, "crisis"),
            "author": f"desk-{aid % 53}",
            "location": "delhi",
            "body": _words(aid + 11, 60),
            "page": 1 + aid % 24,
            "page_name": f"p{1 + aid % 24}_{aid}",
            "updatedAt": f"2022-11-{day:02d}T08:30:00",
            "edition_details": {
                "date": f"2022-11-{day:02d}",
                "publication_code": "bench",
                "edition_code": f"ed{wave}",
                "edition_name": f"Bench Edition {wave}",
            },
        })
    return json.dumps({"data": arts, "totalDocs": TOI_LIMIT * toi_pages})


def index_page(i: int, links_per_index: int, n_domains: int,
               dup_links: int = 3, *, n_index: int | None = None,
               wave_size: int | None = None):
    domain = _dom(i, n_domains)
    url = index_url(i, n_domains)
    aids = list(range(i * links_per_index, (i + 1) * links_per_index))
    # cross-page duplicate discoveries (the within-page ones are removed
    # by the kernels' reference done-set semantics): when the next index
    # shares this page's domain, also link its first few articles
    if _dom(i + 1, n_domains) == domain:
        aids += list(range((i + 1) * links_per_index,
                           (i + 1) * links_per_index + dup_links))
    anchors = "".join(f'<a href="/story-{a}">x</a>' for a in aids)
    # wave chaining: one absolute anchor to the same slot in the next
    # wave (absolute hrefs survive the kernel's /news/ join verbatim)
    if (wave_size and n_index is not None
            and i + wave_size < n_index):
        anchors += (f'<a href="{index_url(i + wave_size, n_domains)}">'
                    "next</a>")
    # the first index of wave w anchors the NEXT wave's toi chain head,
    # so toi page 1 is fetched in round w+1 and its fan-out lands in
    # round w+2 — the same round as wave-(w+1)'s articles
    if (wave_size and n_index is not None and i % wave_size == 0
            and i + wave_size < n_index):
        anchors += (f'<a href="{toi_url(i // wave_size + 1, 1)}">toi</a>')
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
    waves: int = 1,
    phantom_wave: bool = False,
) -> tuple[DataFrame, DataFrame, int]:
    """Build (pages, seeds, n_records) for the crawl bench — n_records
    counts mirror articles plus toi JSON-API records.

    ``phantom_wave`` adds one extra wave of article pages referenced
    ONLY by the seed list, so round 0 fetches full article volume like
    every other round instead of just the wave-0 index chain heads. A
    5-round bench where round 0 does ~0.3% of a steady round's work is
    a cold-start artifact: at the 10^10-frontier scale the rule targets
    (thousands of rounds) no round is volume-starved, and the
    whole-run throughput estimator should not be dominated by one
    unrepresentative round. Phantom article ids live above the normal
    article id space, so urls, domains, and the withheld-page pattern
    (fetch misses) match the discovered articles exactly."""
    assert n_index % waves == 0, "waves must split n_index evenly"
    n_articles = n_index * links_per_index
    wave_size = n_index // waves if waves > 1 else None
    n_phantom = (wave_size or n_index) * links_per_index if phantom_wave \
        else 0

    # toi strand sizing: one chain per wave, quarter-wave-sized
    # (~TOI_LIMIT * toi_pages records/round, ~4% of the mirror record
    # volume at the default shape). Full-wave sizing was measured to
    # drag the 2->8 ratio ~0.05: the JSON kernel's per-record
    # dict/timestamp output is Arrow-crossing-heavy, which presses the
    # microVM kernel ceiling at 8 cores — the dialect coverage (JSON
    # dispatch, F1 over-fetch arithmetic, meta carry-forward) needs
    # hundreds of pages per round, not thousands
    toi_pages = max((wave_size if wave_size else n_index) // 4, 1)
    n_toi = waves * toi_pages

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, htmls, texts = [], [], []
            for raw in pdf["id"]:
                i = int(raw)
                if i < n_index:
                    url, html = index_page(i, links_per_index, n_domains,
                                           n_index=n_index,
                                           wave_size=wave_size)
                    text = ""
                elif i < n_index + n_articles:
                    aid = i - n_index
                    if aid % MISS_EVERY == 13:
                        continue  # withheld -> fetch miss
                    url, html, text = article_page(aid, links_per_index,
                                                   n_domains)
                elif i < n_index + n_articles + n_toi:
                    tid = i - n_index - n_articles
                    wave, page = tid // toi_pages, tid % toi_pages + 1
                    url = toi_url(wave, page)
                    html = toi_page(wave, page, toi_pages)
                    text = ""
                else:
                    # phantom-wave article (seed-only): id space above
                    # the normal articles, same withheld pattern
                    aid = n_articles + (i - n_index - n_articles - n_toi)
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

    total = n_index + n_articles + n_toi + n_phantom
    # interleave page kinds across output files: a contiguous range
    # would put every index page (whose extraction carries the whole
    # 300-link fan-out + canonicalization) into ONE file, so a handful
    # of scan tasks would own all the link work while other cores idle
    # — measured 17 s of straggler tail per 8-core round. Real page
    # stores (WARC segments, crawl-ordered Iceberg) interleave page
    # kinds naturally; hash-spreading ids reproduces that shape.
    # sortWithinPartitions keeps the file contents deterministic.
    ids = (spark.range(0, total, 1, partitions)
           .repartition(partitions, F.xxhash64("id"))
           .sortWithinPartitions("id"))
    pages = (
        ids
        .mapInPandas(gen, "url string, url_canon string, html binary, text string")
        .selectExpr("url", "url_canon",
                    "timestamp'2022-11-01 00:00:00' as warc_ts",
                    "html", "text", "'en' as lang")
    )

    def gen_seeds(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = [index_url(int(i), n_domains) for i in pdf["id"]]
            yield pd.DataFrame({"url": urls})

    seeds = (
        spark.range(0, wave_size if wave_size else n_index, 1, 8)
        .mapInPandas(gen_seeds, "url string")
        .selectExpr("url", "'crisis' as keyword", "'mirror' as source",
                    "map('keyword', 'crisis') as meta")
    )
    # wave 0's toi chain head is seeded; later chains are anchored from
    # the previous wave's first index page
    toi_seed = spark.createDataFrame([(toi_url(0, 1),)], "url string") \
        .selectExpr("url", "'crisis' as keyword", "'toi' as source",
                    "map('keyword', 'crisis') as meta")
    seeds = seeds.unionByName(toi_seed)
    if n_phantom:
        def gen_pseeds(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                urls = [article_url(n_articles + int(p), links_per_index,
                                    n_domains) for p in pdf["id"]]
                yield pd.DataFrame({"url": urls})

        pseeds = (
            spark.range(0, n_phantom, 1, 8)
            .mapInPandas(gen_pseeds, "url string")
            .selectExpr("url", "'crisis' as keyword", "'mirror' as source",
                        "map('keyword', 'crisis') as meta")
        )
        seeds = seeds.unionByName(pseeds)
    n_records = n_articles + n_phantom + waves * toi_pages * TOI_LIMIT
    return pages, seeds, n_records
