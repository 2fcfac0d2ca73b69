"""Deterministic synthetic web for tests + benches (FIXTURES.md §1-§4).

``build_site(spec)`` renders a closed site graph across all eight site
dialects into Common-Crawl-style page rows::

    url:string, warc_ts:datetime, html:bytes, text:string, lang:string

plus seeds, robots fixtures, and the **oracle**: expected article records
composed directly from the generated field values (never by parsing the
rendered HTML back), so the byte-identity tests exercise the real kernel
path against an independent expectation.

Everything is seeded (random.Random(spec.seed)); no wall-clock anywhere.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from siren_spark.urls import with_query

WINDOW_START = datetime(2022, 10, 1)  # mirrors reference config.toml:6-7
WINDOW_END = datetime(2022, 12, 31)

_WORDS = (
    "city report council water power metro school hospital court police "
    "village farmer market festival rain flood road bridge train station "
    "minister election budget protest strike health crisis rescue relief "
    "family student teacher doctor river lake forest wildlife heritage"
).split()

KEYWORDS_DEFAULT = ["crisis", "rescue"]


@dataclass
class SiteSpec:
    seed: int = 42
    keywords: list[str] = field(default_factory=lambda: list(KEYWORDS_DEFAULT))
    articles_per_site: int = 12
    search_pages_present: int = 3   # mirror pages actually present (of 10..49)
    editions: int = 2               # ht/readwhere edition fan-out
    days: int = 2                   # tg-epaper date-step fan-out
    duplicate_links: int = 2        # cross-page duplicate article urls (A1)
    lang_hi_every: int = 7          # every Nth article gets lang='hi'
    # mirror seed fan-out; the reference uses range(10, 50) unconditionally
    # (mirror.py:101-105). Tests may narrow it to keep round counts small.
    mirror_seed_range: tuple[int, int] = (10, 50)


@dataclass
class Site:
    pages: list[dict]              # url, warc_ts, html(bytes), text, lang
    seeds: list[dict]              # url, keyword, source, meta(dict)
    expected: list[dict]           # oracle records (kernels.RECORD_FIELDS)
    robots: list[dict]             # domain, rules


def _sentence(rng: random.Random, n: int, keyword: str | None = None) -> str:
    ws = [rng.choice(_WORDS) for _ in range(n)]
    if keyword:
        ws[rng.randrange(n)] = keyword
    return " ".join(ws)


def _ts(rng: random.Random) -> datetime:
    span = int((WINDOW_END - WINDOW_START).total_seconds())
    return WINDOW_START + timedelta(seconds=rng.randrange(span))


def _lang(i: int, spec: SiteSpec) -> str:
    return "hi" if spec.lang_hi_every and i % spec.lang_hi_every == 3 else "en"


def _page(url: str, html: str, text: str, lang: str, ts: datetime) -> dict:
    return {"url": url, "warc_ts": ts, "html": html.encode(), "text": text,
            "lang": lang}


# --------------------------------------------------------------------------
# per-dialect builders — each returns (pages, seeds, expected)
# --------------------------------------------------------------------------

def _build_mirror(spec: SiteSpec, rng: random.Random):
    base = "https://mirror-city.example"
    pages, seeds, expected = [], [], []
    slugs = [f"story-{i}" for i in range(spec.articles_per_site)]
    # articles
    for i, slug in enumerate(slugs):
        url = f"{base}/news/{slug}"
        published = _ts(rng)
        headline = _sentence(rng, 4, spec.keywords[i % len(spec.keywords)]
                             if i % 3 == 0 else None)
        description = _sentence(rng, 12)
        author = rng.choice(["A. Rao", "S. Iyer", "-"])
        missing_headline = i % 5 == 4
        ld: dict = {
            "url": url,
            "datePublished": published.isoformat(),
            "dateModified": (published + timedelta(hours=2)).isoformat(),
            "description": description,
        }
        if not missing_headline:
            ld["headline"] = headline
        if i % 4 != 3:
            ld["thumbnailUrl"] = f"{base}/img/{slug}.jpg"
        if author != "-":
            ld["author"] = {"name": author}
        html = (
            "<html><head><script type=\"application/ld+json\">"
            + json.dumps(ld)
            + "</script></head><body><p>boilerplate</p></body></html>"
        )
        eff_headline = "-" if missing_headline else headline
        text = f"{eff_headline}\n{description}"
        pages.append(_page(url, html, text, _lang(i, spec), published))
        expected.append({
            "source": "mirror", "url": url, "title": eff_headline,
            "author": author, "location": None, "published": published,
            "text": text,
        })
    # search pages 10..(10+present-1); each lists a slice + duplicates
    per = max(1, len(slugs) // spec.search_pages_present)
    for k, kw in enumerate(spec.keywords):
        for p in range(spec.search_pages_present):
            pageno = 10 + p
            url = with_query(f"{base}/getsearchdata.cms",
                             {"query": kw, "pagenumber": pageno})
            chunk = slugs[p * per:(p + 1) * per]
            if p > 0 and spec.duplicate_links:
                chunk = chunk + slugs[:spec.duplicate_links]  # cross-page dups
            anchors = "".join(f'<a href="/{s}">link</a>' for s in chunk)
            html = (
                f'<html><body><div class="searchcontent">{anchors}'
                f'<div class="Pagination clearfix"><a href="/ignored-page-2">2</a>'
                f"</div></div></body></html>"
            )
            pages.append(_page(url, html, "", "en", _ts(rng)))
    # seeds replicate mirror.py:101-105 (fixed 10..49 range); pages beyond
    # search_pages_present are absent from the table -> deferred
    for kw in spec.keywords:
        for pageno in range(*spec.mirror_seed_range):
            seeds.append({
                "url": with_query(f"{base}/getsearchdata.cms",
                                  {"query": kw, "pagenumber": pageno}),
                "keyword": kw, "source": "mirror", "meta": {"keyword": kw},
            })
    return pages, seeds, expected


def _build_indiatoday(spec: SiteSpec, rng: random.Random):
    base = "https://indiatoday.example"
    pages, seeds, expected = [], [], []
    fmt = "%Y-%m-%d"
    for kw in spec.keywords:
        search_url = with_query(f"{base}/api/ajax/groupsearchlist", {
            "q": kw, "site": "it",
            "ctype": "all,story,video,photo_gallery,audio,visualstory",
            "datestart": WINDOW_START.strftime(fmt),
            "dateend": WINDOW_END.strftime(fmt),
        })
        content = []
        for i in range(spec.articles_per_site):
            slug = f"story/{kw}-{i}"
            published = _ts(rng)
            title = _sentence(rng, 5, kw)
            desc = _sentence(rng, 10)
            author = rng.choice(["R. Menon", "K. Das", ""])
            content.append({
                "canonical_url": f"/{slug}",
                "title_short": title,
                "description_short": desc,
                "datetime_published": published.isoformat(),
                "author": [{"title": author}] if author else [],
            })
            paras = [_sentence(rng, 10) for _ in range(3)]
            art_html = (
                '<html><body><div class="Story_description__fq_4S">'
                + "".join(f"<p>{p}</p>" for p in paras)
                + '</div><div class="sidebar"><p>ignore</p></div></body></html>'
            )
            body = "\n".join(paras)
            art_url = f"{base}/{slug}"
            pages.append(_page(art_url, art_html, body, _lang(i, spec), published))
            expected.append({
                "source": "indiatoday", "url": art_url, "title": title,
                "author": author or None, "location": None,
                "published": published, "text": body,
            })
        payload = json.dumps({
            "status_code": 200, "status_message": "ok",
            "data": {"title": kw, "content": content},
        })
        pages.append(_page(search_url, payload, "", "en", _ts(rng)))
        seeds.append({"url": search_url, "keyword": kw, "source": "indiatoday",
                      "meta": {"keyword": kw}})
    return pages, seeds, expected


def _build_newsminute(spec: SiteSpec, rng: random.Random):
    base = "https://newsminute.example"
    pages, seeds, expected = [], [], []
    PAGE = 100
    for kw in spec.keywords:
        items_all = []
        for i in range(spec.articles_per_site):
            published = _ts(rng)
            cards = [
                {"story-elements": [
                    {"text": _sentence(rng, 8, kw if j == 0 else None)}
                    for j in range(2)
                ]}
                for _ in range(2)
            ]
            items_all.append({
                "url": f"{base}/article/{kw}-{i}",
                "author-name": rng.choice(["N. Pillai", "T. George"]),
                "headline": _sentence(rng, 5),
                "subheadline": None if i % 3 else _sentence(rng, 6),
                "published-at": published.isoformat(),
                "cards": cards,
            })
        total = 260  # -> pages=(260//100)-1=1 -> range(1, 0) = no follow-ups
        fields = "url,author-name,headline,subheadline,published-at,cards"
        url0 = with_query(base + "/api/v1/advanced-search",
                          {"q": f'"{kw}"', "limit": PAGE, "offset": 0,
                           "fields": fields})
        payload = json.dumps({"total": total, "items": items_all})
        pages.append(_page(url0, payload, "", "en", _ts(rng)))
        seeds.append({"url": url0, "keyword": kw, "source": "newsminute",
                      "meta": {"keyword": kw}})
        for it in items_all:
            txt = "\n".join(s["text"] for c in it["cards"]
                            for s in c["story-elements"])
            expected.append({
                "source": "newsminute", "url": it["url"],
                "title": it["headline"], "author": it["author-name"],
                "location": None,
                "published": datetime.fromisoformat(it["published-at"]),
                "text": txt,
            })
    return pages, seeds, expected


def _build_tg_online(spec: SiteSpec, rng: random.Random):
    base = "https://tg-online.example"
    pages, seeds, expected = [], [], []
    PAGE = 20
    for kw in spec.keywords:
        n = spec.articles_per_site
        total = PAGE * 2 + 5  # -> pages = total//20 = 2 follow-up pages
        slugs = [f"news/{kw}-{i}" for i in range(n)]
        for i, slug in enumerate(slugs):
            published = _ts(rng)
            title = _sentence(rng, 5, kw)
            header = _sentence(rng, 7)
            author = rng.choice(["Our Correspondent", "Staff Reporter"])
            location = rng.choice(["Calcutta", "Siliguri"])
            paras = [_sentence(rng, 9) for _ in range(3)]
            datestr = published.strftime("%d.%m.%y")
            art_html = (
                f'<html><body><div class="articletsection"><h1>{title}</h1>'
                f"<h2>{header}</h2>"
                f'<div class="publishdate"><strong>{author}</strong>'
                f"<span>{location}</span> Published {datestr}, "
                f'{published.strftime("%H:%M")} am</div></div>'
                f'<div id="contentbox"><div>'
                + "".join(f"<p>{p}</p>" for p in paras)
                + "</div></div></body></html>"
            )
            body = "\n".join(paras)
            url = f"{base}/{slug}"
            pages.append(_page(url, art_html, body, _lang(i, spec), published))
            expected.append({
                "source": "tg_online", "url": url, "title": title,
                "author": author, "location": location,
                "published": datetime.strptime(datestr, "%d.%m.%y"),
                "text": body,
            })
        # search pages 0..2 (page 0 fans out 1..2)
        per = max(1, n // 3)
        for p in range(3):
            url = with_query(f"{base}/search", {"search-term": kw, "page": p})
            chunk = slugs[p * per:(p + 1) * per]
            lis = "".join(f'<li><a href="/{s}">t</a></li>' for s in chunk)
            html = (
                f'<html><body><div class="searchresult">Showing results '
                f'{total}</div><ul class="storylisting">{lis}</ul></body></html>'
            )
            pages.append(_page(url, html, "", "en", _ts(rng)))
        seeds.append({
            "url": with_query(f"{base}/search", {"search-term": kw, "page": 0}),
            "keyword": kw, "source": "tg_online", "meta": {"keyword": kw}})
    return pages, seeds, expected


def _build_toi(spec: SiteSpec, rng: random.Random):
    base = "https://toi-epaper.example"
    pages, seeds, expected = [], [], []
    LIMIT = 50
    for kw in spec.keywords:
        n = spec.articles_per_site
        total = n  # totalDocs -> pages = n//50 + 2 (over-fetch, toi.py:190)
        arts = []
        for i in range(n):
            ed_date = _ts(rng).replace(hour=0, minute=0, second=0)
            updated = ed_date + timedelta(hours=6)
            body = _sentence(rng, 20, kw)
            arts.append({
                "title": _sentence(rng, 5), "body": body,
                "page": str(rng.randrange(1, 20)),
                "page_name": f"PG{i}", "page_title": f"Page {i}",
                "author": rng.choice(["TNN", "PTI"]),
                "location": rng.choice(["Mumbai", "Delhi"]),
                "updatedAt": updated.isoformat(),
                "edition_details": {
                    "date": ed_date.strftime("%Y-%m-%d"),
                    "edition_code": "TOIM", "publication_code": "TOI",
                    "edition_name": "Mumbai",
                },
            })
        # page 1 carries all docs; pages 2..(n//50+2) exist but empty
        fmt = "%Y-%m-%d"
        def _url(p: int) -> str:
            return with_query(f"{base}/api/v1/epaper/search", {
                "anyOfThese": kw, "excludeThese": "bomb",
                "fromDate": WINDOW_START.strftime(fmt),
                "toDate": WINDOW_END.strftime(fmt), "page": p,
            })
        pages.append(_page(_url(1), json.dumps(
            {"totalDocs": total, "data": arts, "page": 1}), "", "en", _ts(rng)))
        for p in range(2, total // LIMIT + 2 + 1):
            pages.append(_page(_url(p), json.dumps(
                {"totalDocs": total, "data": [], "page": p}), "", "en", _ts(rng)))
        seeds.append({"url": _url(1), "keyword": kw, "source": "toi",
                      "meta": {"keyword": kw}})
        for a in arts:
            ed = a["edition_details"]
            ed_dt = datetime.strptime(ed["date"], "%Y-%m-%d")
            expected.append({
                "source": "toi",
                "url": f"https://epaper.timesgroup.com/article-share?article={a['page_name']}_{ed['publication_code']}",
                "title": a["title"], "author": a["author"],
                "location": a["location"],
                "published": datetime.fromisoformat(a["updatedAt"]),
                "text": a["body"],
            })
    return pages, seeds, expected


def _build_ht(spec: SiteSpec, rng: random.Random):
    base = "https://ht-epaper.example"
    pages, seeds, expected = [], [], []
    fmt = "%d/%m/%Y"
    # partial (search-row) edition_date is fixed per article id so the
    # Eddate-null coalesce (ht.py:139-140) is deterministic even when the
    # same id is reachable from several editions.
    partial_date: dict[str, datetime] = {}
    detail_built: set[str] = set()
    headline_by_aid: dict[str, str] = {}
    for ed_id in range(spec.editions):
        for kw in spec.keywords:
            rows = []
            ids = [f"HT{ed_id}{kw[:2].upper()}{i}" for i in range(4)]
            duplicated = set()
            if ed_id > 0:
                ids[0] = f"HT0{kw[:2].upper()}0"  # cross-edition duplicate (A2)
                duplicated.add(ids[0])
            for i, aid in enumerate(ids):
                pdate = partial_date.setdefault(
                    aid, _ts(rng).replace(hour=0, minute=0, second=0))
                rows.append(
                    "<tr><td><label onclick=\"showArticle('page','"
                    + aid + "' );\">t</label></td>"
                    + f'<td data-name="PageNo">{i + 1}</td>'
                    + '<td data-name="EditionName">Delhi</td>'
                    + f'<td data-name="editionDate">{pdate.strftime("%Y/%m/%d")}</td></tr>'
                )
            rows.append("<tr><td></td><td data-name='PageNo'>9</td></tr>")  # blank
            search_url = with_query(f"{base}/Home/Search", {
                "SearchText": kw, "EditionID": ed_id,
                "FromDate": WINDOW_START.strftime(fmt),
                "ToDate": WINDOW_END.strftime(fmt),
            })
            html = (
                '<html><body><table class="table"><thead><tr><th>h</th></tr>'
                "</thead><tbody>" + "".join(rows) + "</tbody></table></body></html>"
            )
            pages.append(_page(search_url, html, "", "en", _ts(rng)))
            seeds.append({"url": search_url, "keyword": kw, "source": "ht",
                          "meta": {"keyword": kw}})
            for aid in ids:
                if aid in detail_built:
                    continue
                detail_built.add(aid)
                ed_date = _ts(rng)
                body = _sentence(rng, 15, kw)
                headline = _sentence(rng, 5)
                no_headline = rng.random() < 0.2
                # A3 fixture: a DIFFERENT article id in a later edition
                # reuses edition-0's headline, so the post-fetch headline
                # dedup (ht.py:261-268) has a real duplicate to drop —
                # the seen-set (url identity) cannot catch this one
                hl_src = f"HT0{kw[:2].upper()}1"
                if ed_id > 0 and aid == f"HT{ed_id}{kw[:2].upper()}1":
                    # reuse the EFFECTIVE title (which may itself be the
                    # ' - no data -' default) so the collision is real
                    headline = headline_by_aid[hl_src]
                    no_headline = False
                headline_by_aid[aid] = (" - no data -" if no_headline
                                        else headline)
                # duplicated ids keep Eddate non-null so the record does not
                # depend on which edition's partial wins the dedup race
                null_eddate = aid not in duplicated and rng.random() < 0.3
                detail = {
                    "StoryContent": [{
                        "Body": body,
                        "Headlines": [] if no_headline else [headline],
                    }],
                    "LinkPicture": [{"url": f"{base}/thumb/{aid}.jpg",
                                     "caption": "c"}],
                    "PageNumber": "" if rng.random() < 0.3 else str(rng.randrange(1, 20)),
                    "Edname": None if rng.random() < 0.3 else "Delhi",
                    "Eddate": None if null_eddate else ed_date.strftime(fmt),
                }
                detail_url = f"{base}/User/ShowArticleView?OrgId={aid}"
                pages.append(_page(detail_url, json.dumps(detail), body,
                                   "en", ed_date))
                expected.append({
                    "source": "ht",
                    "url": f"https://epaper.hindustantimes.com/Home/ShareArticle?OrgId={aid}&textview=0",
                    "title": " - no data -" if no_headline else headline,
                    "author": None, "location": None,
                    "published": (datetime.strptime(detail["Eddate"], fmt)
                                  if detail["Eddate"] else partial_date[aid]),
                    "text": body,
                })
    return pages, seeds, expected


def _build_readwhere(spec: SiteSpec, rng: random.Random):
    base = "https://readwhere.example"
    pages, seeds, expected = [], [], []
    start_e = int(WINDOW_START.timestamp())
    end_e = int(WINDOW_END.timestamp())
    kwsep = "\x1f".join(spec.keywords)
    for ed in range(spec.editions):
        ed_name = f"edition-{ed}"
        issues = []
        for i in range(2):
            pub = _ts(rng)
            iid = ed * 100 + i
            issues.append({"id": iid, "published": pub.isoformat()})
            for kw in spec.keywords:
                found = rng.random() < 0.8
                data = []
                if found:
                    for j in range(2):
                        data.append({
                            "excerpt": _sentence(rng, 12, kw),
                            "pageNum": j + 1, "issue_id": iid,
                            "title_id": 7000 + ed,
                        })
                payload = {"status": found, "numFound": len(data), "start": 0,
                           "to": len(data), "data": data}
                s_url = f"{base}/search/issue/{iid}/{kw}"
                pages.append(_page(s_url, json.dumps(payload), "", "en", pub))
                for d in data:
                    expected.append({
                        "source": "readwhere",
                        "url": f"{base}/{d['issue_id']}",
                        "title": str(d["title_id"]), "author": None,
                        "location": None, "published": pub,
                        "text": d["excerpt"],
                    })
        pd_url = f"{base}/viewer/publishdates/{ed}/{start_e}/{end_e}/json"
        pages.append(_page(pd_url, json.dumps(issues), "", "en", _ts(rng)))
        seeds.append({
            "url": pd_url, "keyword": "", "source": "readwhere",
            "meta": {"keywords": kwsep, "edition_id": str(ed),
                     "edition_name": ed_name},
        })
    return pages, seeds, expected


def _build_tg_epaper(spec: SiteSpec, rng: random.Random):
    base = "https://tg-epaper.example"
    pages, seeds, expected = [], [], []
    n_pages = 3
    for d in range(spec.days):
        day = WINDOW_START + timedelta(days=d)
        datestr = day.strftime("%Y-%m-%d")
        for p in range(1, n_pages + 1):
            page_url = f"{base}/calcutta/{datestr}/71/Page-{p}.html"
            pops = []
            for a in range(2):
                paper_id, art_id = 1000 + d, p * 10 + a
                pops.append(f"<a onclick=\"show_pop('{paper_id}','{art_id}','{p}')\">x</a>")
                tv_url = f"{base}/textview/{paper_id}/{art_id}/71.html"
                title = _sentence(rng, 4, spec.keywords[0] if a == 0 else None)
                paras = [_sentence(rng, 8) for _ in range(2)]
                tv_html = (
                    f'<html><body><div class="haedlinesstory"><b>{title}</b>'
                    f'</div><div class="storyview-div">'
                    + "".join(f"<p>{q}</p>" for q in paras)
                    + "</div></body></html>"
                )
                body = "\n".join(paras)
                pages.append(_page(tv_url, tv_html, body, "en", day))
                expected.append({
                    "source": "tg_epaper", "url": tv_url, "title": title,
                    "author": None, "location": None, "published": day,
                    "text": body,
                })
            html = (
                f'<html><body><input id="totalpages" value="{n_pages}"/>'
                + "".join(pops) + "</body></html>"
            )
            pages.append(_page(page_url, html, "", "en", day))
        seeds.append({
            "url": f"{base}/calcutta/{datestr}/71/Page-1.html",
            "keyword": "", "source": "tg_epaper",
            "meta": {"date": datestr, "keywords": "\x1f".join(spec.keywords)},
        })
    return pages, seeds, expected


_BUILDERS = (
    _build_mirror, _build_indiatoday, _build_newsminute, _build_tg_online,
    _build_toi, _build_ht, _build_readwhere, _build_tg_epaper,
)


def build_site(spec: SiteSpec | None = None) -> Site:
    spec = spec or SiteSpec()
    rng = random.Random(spec.seed)
    pages: list[dict] = []
    seeds: list[dict] = []
    expected: list[dict] = []
    for b in _BUILDERS:
        p, s, e = b(spec, rng)
        pages.extend(p)
        seeds.extend(s)
        expected.extend(e)
    robots = [
        {"domain": "mirror-city.example", "rules": "User-agent: *\nAllow: /\n"},
        {"domain": "tg-online.example", "rules": "User-agent: *\nDisallow:\n"},
        {"domain": "blocked.example", "rules": "User-agent: *\nDisallow: /\n"},
        {"domain": "ht-epaper.example",
         "rules": "User-agent: *\nDisallow: /private/\n"},
        # other domains: no robots row -> allow (RFC 9309 §2.3.1.2)
    ]
    return Site(pages=pages, seeds=seeds, expected=expected, robots=robots)


__all__ = ["SiteSpec", "Site", "build_site", "WINDOW_START", "WINDOW_END"]
