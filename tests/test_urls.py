"""Canonicalization + registrable-domain unit/property tests (SURVEY §5.4)."""

from hypothesis import given, strategies as st

from siren_spark.urls import (
    canonicalize_url,
    join_url,
    registrable_domain,
    with_query,
)


def test_scheme_host_lowercased_port_stripped():
    assert canonicalize_url("HTTP://ExAmple.COM:80/a") == "http://example.com/a"
    assert canonicalize_url("https://example.com:443/") == "https://example.com/"
    assert canonicalize_url("https://example.com:8443/x") == "https://example.com:8443/x"


def test_fragment_removed_and_empty_path():
    assert canonicalize_url("http://example.com#frag") == "http://example.com/"
    assert canonicalize_url("http://example.com/a#frag") == "http://example.com/a"


def test_dot_segments():
    assert canonicalize_url("http://e.com/a/b/../c/./d") == "http://e.com/a/c/d"
    assert canonicalize_url("http://e.com/../../x") == "http://e.com/x"


def test_query_sorted_and_kept():
    assert (
        canonicalize_url("http://e.com/p?b=2&a=1&a=0")
        == "http://e.com/p?a=0&a=1&b=2"
    )


def test_percent_normalization():
    assert canonicalize_url("http://e.com/%7Euser/%2fx") == "http://e.com/~user/%2Fx"


def test_registrable_domain():
    assert registrable_domain("www.telegraphindia.com") == "telegraphindia.com"
    assert registrable_domain("epaper.hindustantimes.com") == "hindustantimes.com"
    assert registrable_domain("a.b.example.co.in") == "example.co.in"
    assert registrable_domain("https://sub.mirror-city.example/x") == "mirror-city.example"
    assert registrable_domain("localhost") == "localhost"
    assert registrable_domain("10.0.0.1") == "10.0.0.1"


def test_join_url_reference_quirks():
    # mirror.py:80 — BASE / "news" / suburl.lstrip("/")
    assert (
        join_url(join_url("https://m.example", "news"), "/abc".lstrip("/"))
        == "https://m.example/news/abc"
    )
    # indiatoday.py:107 — BASE / canonical_url[1:]
    assert join_url("https://it.example", "/story/x"[1:]) == "https://it.example/story/x"


def test_with_query_deterministic():
    u = with_query("https://e.com/s", {"q": "kill self", "page": 1})
    assert u == "https://e.com/s?q=kill+self&page=1"


_url_chars = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC012/.-_~%?&=", min_size=0, max_size=30
)


@given(host=st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True),
       path=_url_chars)
def test_canonicalize_idempotent(host, path):
    u = f"http://{host}/{path}"
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once
