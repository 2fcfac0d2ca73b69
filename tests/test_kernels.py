"""Byte-identity tests: kernels vs the independent sitegen oracle.

The sitegen oracle composes expected text directly from generated field
values; the kernels re-derive it by parsing the rendered HTML/JSON —
two independent code paths (SURVEY.md §5.1).
"""

from datetime import datetime

import pytest

from siren_spark.htmlmini import parse_html
from siren_spark.kernels import parse_page
from siren_spark.testing.sitegen import SiteSpec, build_site


@pytest.fixture(scope="module")
def site():
    return build_site(SiteSpec())


def _crawl_all(site):
    """Single-process reference-style crawl: BFS every page reachable from
    seeds through kernel link extraction, collecting records."""
    page_by_url = {p["url"]: p for p in site.pages}
    frontier = [(s["url"], s["meta"]) for s in site.seeds]
    seen = set()
    records = []
    while frontier:
        nxt = []
        for url, meta in frontier:
            if url in seen:
                continue
            seen.add(url)
            page = page_by_url.get(url)
            if page is None:
                continue  # deferred / missing page
            res = parse_page(url, page["html"].decode(), meta)
            records.extend(res.records)
            nxt.extend((l.url, l.meta) for l in res.links)
        frontier = nxt
    return records


def test_byte_identity_all_dialects(site):
    got = _crawl_all(site)
    exp = site.expected

    def key(r):
        return (r["source"], r["url"], r["text"])

    got_map = {}
    for r in got:
        got_map.setdefault((r["source"], r["url"]), []).append(r)

    missing = []
    for e in exp:
        cands = got_map.get((e["source"], e["url"]), [])
        if not any(c["text"] == e["text"] for c in cands):
            missing.append((e["source"], e["url"]))
    assert not missing, f"records missing or text mismatch: {missing[:10]}"

    # per-dialect coverage: every dialect produced records
    sources = {r["source"] for r in got}
    assert sources == {
        "mirror", "indiatoday", "newsminute", "tg_online", "toi", "ht",
        "readwhere", "tg_epaper",
    }


def test_field_identity(site):
    got = _crawl_all(site)
    gm = {}
    for r in got:
        gm.setdefault((r["source"], r["url"], r["text"]), r)
    for e in site.expected:
        g = gm.get((e["source"], e["url"], e["text"]))
        assert g is not None, (e["source"], e["url"])
        for f in ("title", "author", "location", "published"):
            assert g[f] == e[f], (e["source"], e["url"], f, g[f], e[f])


def test_mirror_defaults():
    html = (
        '<html><head><script type="application/ld+json">'
        '{"url": "https://mirror-city.example/news/x", '
        '"datePublished": "2022-10-05T10:00:00", '
        '"dateModified": "2022-10-05T12:00:00", "description": "d"}'
        "</script></head></html>"
    )
    res = parse_page("https://mirror-city.example/news/x", html, {})
    (rec,) = res.records
    assert rec["title"] == "-"          # headline setdefault (mirror.py:95)
    assert rec["author"] == "-"         # author default (mirror.py:93)
    assert rec["text"] == "-\nd"


def test_mirror_invalid_dropped():
    html = '<html><script type="application/ld+json">{"url": "u"}</script></html>'
    assert parse_page("https://mirror-city.example/news/x", html, {}).records == []


def test_ht_blank_row_skipped_and_onclick_parse():
    html = (
        '<table class="table"><thead><tr><th>h</th></tr></thead><tbody>'
        "<tr><td><label onclick=\"show('p','AB12' );\">t</label></td>"
        '<td data-name="PageNo">3</td><td data-name="EditionName">D</td>'
        '<td data-name="editionDate">2022/10/05</td></tr>'
        "<tr><td></td></tr></tbody></table>"
    )
    res = parse_page("https://ht-epaper.example/Home/Search?SearchText=x", html, {})
    assert len(res.links) == 1
    assert "OrgId=AB12" in res.links[0].url
    assert res.links[0].meta["page_no"] == "3"
    assert res.links[0].meta["edition_date"] == "2022/10/05"


def test_ht_headline_fallback():
    payload = '{"StoryContent": [{"Body": "b", "Headlines": []}]}'
    res = parse_page(
        "https://ht-epaper.example/User/ShowArticleView?OrgId=X", payload,
        {"article_id": "X", "page_no": "4", "edition_name": "D",
         "edition_date": "2022/10/05"},
    )
    (rec,) = res.records
    assert rec["title"] == " - no data -"       # ht.py:154
    assert rec["extra"]["page_number"] == "4"   # coalesce ht.py:132
    assert rec["published"] == datetime(2022, 10, 5)


def test_tg_online_pagination_arithmetic():
    # total=45, PAGE_SIZE=20 -> pages = 2 -> follow-ups page=1..2 (telegraph.py:112-115)
    html = (
        '<div class="searchresult">found 45</div>'
        '<ul class="storylisting"><li><a href="/a/b">x</a></li></ul>'
    )
    res = parse_page("https://tg-online.example/search?search-term=k&page=0", html, {})
    urls = [l.url for l in res.links]
    assert "https://tg-online.example/a/b" in urls
    assert sum("page=1" in u for u in urls) == 1
    assert sum("page=2" in u for u in urls) == 1
    assert not any("page=3" in u for u in urls)
    # page!=0 does not fan out (only page 0 computes totals)
    res2 = parse_page("https://tg-online.example/search?search-term=k&page=1", html, {})
    assert all("/search" not in l.url for l in res2.links)


def test_nm_pagination_off_by_one():
    # total=505 -> pages=(505//100)-1=4 -> offsets for i in range(1, 3): 100,200
    payload = '{"total": 505, "items": []}'
    url = "https://newsminute.example/api/v1/advanced-search?q=%22k%22&limit=100&offset=0&fields=f"
    res = parse_page(url, payload, {})
    offsets = sorted(l.url.split("offset=")[1].split("&")[0] for l in res.links)
    assert offsets == ["100", "200"]  # newsminute.py:84-86 skips the tail


def test_toi_over_fetch():
    # totalDocs=10, limit=50 -> pages = 10//50+2 = 2 -> range(2, 3) = page 2
    # only — one whole page over-fetched beyond the real single page.
    payload = '{"totalDocs": 10, "data": [], "page": 1}'
    url = "https://toi-epaper.example/api/v1/epaper/search?anyOfThese=k&page=1"
    res = parse_page(url, payload, {})
    got = sorted(l.url.split("page=")[1] for l in res.links)
    assert got == ["2"]  # toi.py:190-196 deliberately over-fetches
    # totalDocs=120 -> pages = 120//50+2 = 4 -> fetch 2,3,4 (3 real pages)
    payload2 = '{"totalDocs": 120, "data": [], "page": 1}'
    res2 = parse_page(url, payload2, {})
    assert sorted(l.url.split("page=")[1] for l in res2.links) == ["2", "3", "4"]


def test_unknown_domain_empty():
    assert parse_page("https://nowhere.example/x", "<p>x</p>", {}).records == []


def test_htmlmini_text_and_selectors():
    root = parse_html(
        "<div id='a' class='x y'><p>one</p><span>two</span>"
        "<ul><li><a href='/u'>three</a></li></ul></div>"
    )
    assert root.find("div", class_="x y").text == "onetwothree"
    assert root.select_one("#a > p").text == "one"
    assert [n.text for n in root.select("li > a")] == ["three"]
    assert root.select_one("div:nth-child(1)") is not None


def test_entity_decoding_matches_reference_semantics():
    """html.parser decodes charrefs into text (bs4 html.parser backend
    does the same) — extracted text must carry the decoded characters."""
    html = (
        '<html><body><div class="articletsection"><h1>T &lt;x&gt; &amp; Y</h1>'
        "<h2>H</h2></div>"
        '<div id="contentbox"><div><p>A &amp; B &quot;q&quot; caf&#233;</p>'
        "<p>second &gt; first</p></div></div></body></html>"
    )
    res = parse_page("https://tg-online.example/news/e1", html, {})
    (rec,) = res.records
    assert rec["title"] == "T <x> & Y"
    assert rec["text"] == 'A & B "q" café\nsecond > first'


def test_nested_tags_inside_paragraphs():
    """bs4 .text concatenates descendant strings — nested inline tags
    contribute their text in document order with no separators."""
    html = (
        '<div id="contentbox"><div>'
        "<p>a <b>bold</b> and <i>ital<u>ic</u></i> end</p></div></div>"
    )
    res = parse_page("https://tg-online.example/news/e2", html, {})
    assert res.records[0]["text"] == "a bold and italic end"


def test_sitegen_byte_identity_other_seeds():
    """the oracle independence holds for arbitrary seeds, not just 42."""
    for seed in (7, 1234):
        site = build_site(SiteSpec(seed=seed, articles_per_site=6,
                                   mirror_seed_range=(10, 13)))
        got = _crawl_all(site)
        gm = {(r["source"], r["url"], r["text"]) for r in got}
        for e in site.expected:
            assert (e["source"], e["url"], e["text"]) in gm, (seed, e["url"])


def test_fast_parser_differential():
    """The regex fast-path tokenizer must build byte-identical trees to
    the stdlib-HTMLParser reference builder — over every sitegen page
    (all dialects) and a set of adversarial snippets (CDATA content,
    quoted '>', entities, void/self-closing, implied closes, trailing
    junk). Any page the fast path cannot tokenize falls back to the
    reference builder inside parse_html itself."""
    from siren_spark.htmlmini import Node, _fast_parse, parse_html_reference
    from siren_spark.testing.sitegen import SiteSpec, build_site

    def ser(n):
        if not isinstance(n, Node):
            return ("D", n)
        return ("N", n.tag, tuple(sorted(n.attrs.items())),
                tuple(ser(c) for c in n.children))

    snippets = [
        "<div class='a b'><p id=x>t&amp;x</p><br><img src=u.png></div>",
        "<a href=foo/>bar</a>",                 # NOT self-closing (stdlib)
        "<a href='q>r'>x</a>",
        "<script>if (a<b && c>d) {}</script><p>after</p>",
        "<style>p>a{color:red}</style>ok",
        "<!-- a > b --><p>c</p>",
        "<!DOCTYPE html><html><body>x</body></html>",
        "<ul><li>one<li>two</ul>",
        "<p>unclosed <b>bold",
        "<input type=checkbox checked><p>z</p>",
        "<A HREF='X'>case</A>",
        "<p>&lt;not a tag&gt; &copy; 2020</p>",
        "<br/><hr /><span/>text",
        "<p>a < b</p>",
        "<p>5 < 6 but 7 > 3</p>",
        "plain text only & amp",
        "",
    ]
    for s in snippets:
        assert ser(_fast_parse(s)) == ser(parse_html_reference(s)), s
    # malformed markup where the fast tokenizer must *fall back* (raise
    # ValueError) rather than silently diverge from the stdlib builder
    # (ADVICE r03): whitespace end tags, '</>', bogus end tags inside
    # CDATA, unterminated comments containing '>'
    from siren_spark.htmlmini import parse_html
    malformed = [
        "<div></ div>x</div>",                  # stdlib endtagfind closes
        "<p></>x</p>",                          # stdlib drops '</>'
        "<script>a</scripty>b</script><p>c</p>",  # stays in CDATA
        "<script>a</script foo>b</script><p>c</p>",
        "<style>a</styled>b</style>ok",
        "<!-- foo > bar",                       # unterminated comment
        "<p>a</p><!-- x > y",                   # ... after real content
        "<!-->x",                               # comment-open, no close
        "<!--->x",
        "<p><!-- a -- >x",                      # '-- >' IS a stdlib close
        "<div></di/v>x</div>",                  # bogus name: closes 'di'
        "<div></div class='x'>y",               # end tag with attrs
        "<p></p ></p>",
    ]
    for s in malformed:
        assert ser(parse_html(s)) == ser(parse_html_reference(s)), s
    site = build_site(SiteSpec())
    for p in site.pages:
        body = p["html"].decode("utf-8", errors="replace")
        assert ser(_fast_parse(body)) == ser(parse_html_reference(body)), \
            p["url"]


def test_ldjson_fast_path_differential():
    """_first_ldjson must agree with the tree walk (find first script
    with type=application/ld+json, take its raw text) or return None on
    every input where a raw scan could diverge."""
    from siren_spark.htmlmini import parse_html
    from siren_spark.kernels.sites import _first_ldjson
    from siren_spark.testing.sitegen import SiteSpec, build_site

    def tree_answer(payload):
        t = parse_html(payload).find("script", type="application/ld+json")
        return t.text if t else None

    cases = [
        '<html><script type="application/ld+json">{"a": 1}</script></html>',
        "<script type='application/ld+json'>{\"b\":2}</script>",
        '<script type="application/ld+json"></script>',
        '<script src="x.js"></script><script type="application/ld+json">{}</script>',
        "<p>no script at all</p>",
        # divergence-risk shapes: fast path must return None, not guess
        '<!-- <script type="application/ld+json">{"x":1}</script> -->'
        '<script type="application/ld+json">{"y":2}</script>',
        '<script>var s = \'<script type="application/ld+json">{"z":1}<\' + "/script>";</script>'
        '<script type="application/ld+json">{"w":2}</script>',
        '<script async type="application/ld+json">{"k":1}</script>'
        '<script type="application/ld+json">{"l":2}</script>',
        '<SCRIPT TYPE="application/ld+json">{"m":1}</SCRIPT>',
        '<script type = "application/ld+json">{"n":1}</script>',
        '<script type="application/ld+json">{"open": true}',
    ]
    for c in cases:
        fast = _first_ldjson(c)
        assert fast is None or fast == tree_answer(c), c
    # corpus: the fast path must FIRE and agree on every mirror article
    site = build_site(SiteSpec())
    fired = 0
    for p in site.pages:
        body = p["html"].decode("utf-8", errors="replace")
        fast = _first_ldjson(body)
        if fast is not None:
            assert fast == tree_answer(body), p["url"]
            fired += 1
    assert fired > 0
