"""URL canonicalization and registrable-domain extraction.

RFC 3986 normalization plus the per-site URL-building quirks observed in
the reference scrapers (each cited at the rule). Pure Python functions —
the Spark layer wraps them in Arrow-batched pandas UDFs
(siren_spark.functions.udfs); they are deliberately dependency-free so
the same code runs inside executors via --py-files.

Reference behaviors reproduced:
- path-join + query building of yarl URLs (mirror.py:47-51, toi.py:70-92)
- ``suburl.lstrip('/')`` before joining (mirror.py:80)
- ``href[1:]`` leading-slash strip (indiatoday.py:107, online/telegraph.py:144)
"""

from __future__ import annotations

import re
from urllib.parse import quote, urlsplit

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}

# RFC 3986 unreserved characters — safe to percent-decode.
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)

# Minimal embedded public-suffix subset (no tldextract in the runtime).
# Two-label suffixes cover the reference's target sites (.co.in etc.) and
# the common cases a crawl of Indian news media hits. Fallback: one label.
_TWO_LABEL_SUFFIXES = frozenset(
    {
        "co.in", "com.in", "net.in", "org.in", "gov.in", "ac.in", "edu.in",
        "res.in", "ernet.in", "nic.in",
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
        "com.br", "net.br", "org.br", "gov.br",
        "co.nz", "net.nz", "org.nz",
        "co.za", "org.za", "web.za",
        "com.sg", "com.my", "com.pk", "com.bd", "com.np", "com.lk",
        "com.cn", "net.cn", "org.cn", "gov.cn",
        "com.hk", "com.tw", "com.mx", "com.ar", "com.tr", "com.ua",
        "co.kr", "or.kr", "go.kr",
    }
)

_PCT_RE = re.compile(r"%[0-9a-fA-F]{2}")


def _normalize_pct(segment: str) -> str:
    """Uppercase %XX escapes; decode escapes of unreserved characters."""

    def repl(m: re.Match[str]) -> str:
        ch = chr(int(m.group(0)[1:], 16))
        if ch in _UNRESERVED:
            return ch
        return m.group(0).upper()

    return _PCT_RE.sub(repl, segment)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    output: list[str] = []
    # Work on '/'-split segments; a leading '' keeps the absolute prefix.
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if output and output[-1] != "":
                output.pop()
            continue
        output.append(seg)
    result = "/".join(output)
    if path.startswith("/") and not result.startswith("/"):
        result = "/" + result
    return result or "/"


def canonicalize_url(url: str) -> str:
    """Return the RFC 3986 canonical form of ``url``.

    - scheme + host lowercased, default port stripped
    - fragment removed
    - dot-segments resolved; empty path → '/'
    - percent-escapes uppercased, unreserved octets decoded
    - query parameters sorted by (key, value); blank values kept

    Idempotent: canonicalize_url(canonicalize_url(u)) == canonicalize_url(u).
    Invalid/relative inputs are returned stripped but otherwise untouched.
    """
    if url is None:
        return None  # type: ignore[return-value]
    url = url.strip()
    if not url:
        return url
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    if not parts.scheme or not parts.netloc:
        return url
    scheme = parts.scheme.lower()

    host = (parts.hostname or "").lower().rstrip(".")
    port = None
    try:
        port = parts.port
    except ValueError:
        pass
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"

    path = _remove_dot_segments(parts.path) if parts.path else "/"
    path = _normalize_pct(path)

    query = ""
    if parts.query:
        pairs = []
        for piece in parts.query.split("&"):
            if not piece:
                continue
            if "=" in piece:
                k, v = piece.split("=", 1)
            else:
                k, v = piece, ""
            pairs.append((_normalize_pct(k), _normalize_pct(v)))
        pairs.sort()
        query = "&".join(f"{k}={v}" for k, v in pairs)

    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def host_of(url: str) -> str:
    """Lowercased hostname of ``url`` ('' when unparseable)."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def registrable_domain(host_or_url: str) -> str:
    """Registrable domain (eTLD+1) of a host or URL.

    Uses the embedded public-suffix subset; unknown suffixes fall back to
    the last two labels. IPs and single-label hosts are returned as-is.
    """
    if not host_or_url:
        return ""
    host = host_or_url
    if "//" in host_or_url or host_or_url.startswith(("http:", "https:")):
        host = host_of(host_or_url)
    host = host.lower().strip(".")
    if not host:
        return ""
    labels = host.split(".")
    if len(labels) <= 1:
        return host
    # IPv4 literal → whole address is the "domain"
    if all(l.isdigit() for l in labels):
        return host
    two = ".".join(labels[-2:])
    if two in _TWO_LABEL_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return two


def join_url(base: str, sub: str) -> str:
    """yarl-style ``base / sub`` path join as used across the reference.

    yarl's ``URL / str`` appends a path segment to the base path with
    exactly one slash between them (mirror.py:80, readwhere/core.py:96).
    """
    if sub.startswith(("http://", "https://")):
        return sub
    return base.rstrip("/") + "/" + sub.lstrip("/")


def with_query(url: str, params: dict[str, object]) -> str:
    """yarl-style ``URL % params`` query construction (mirror.py:47-51).

    Encoding matches yarl's default (spaces → '+' in values, minimal
    escaping) closely enough for the synthetic-web fixtures.
    """
    q = "&".join(
        f"{quote(str(k), safe='')}={quote(str(v), safe='').replace('%20', '+')}"
        for k, v in params.items()
    )
    sep = "&" if "?" in url else "?"
    return f"{url}{sep}{q}" if q else url


__all__ = [
    "canonicalize_url",
    "host_of",
    "registrable_domain",
    "join_url",
    "with_query",
]
