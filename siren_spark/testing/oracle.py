"""Single-process crawl simulator — the frontier-equivalence oracle.

A deliberately naive dict-and-loop implementation of the engine's crawl
semantics (reference scheduling semantics per SURVEY.md §5.2): same seed
list, same politeness budget, same dedup identity and tie-breaks — but
no Spark, no Bloom, no windows. tests/test_crawl.py asserts the Spark
engine produces the identical URL-seen set, identical per-round ordered
schedule, identical results, and matching counters.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from siren_spark.kernels import parse_page
from siren_spark.operators.robots import RobotsMatcher
from siren_spark.urls import canonicalize_url, registrable_domain


@dataclass
class SimResult:
    schedule: list[list[str]] = field(default_factory=list)  # per round, ordered url_canon
    seen: set[str] = field(default_factory=set)
    results: list[dict] = field(default_factory=list)
    counters: list[dict] = field(default_factory=list)       # gen, metric, n


def simulate_crawl(
    pages: list[dict],
    seeds: list[dict],
    *,
    budget_per_host: int,
    max_rounds: int = 30,
    robots_rows: list[dict] | None = None,
    window_start=None,
    window_end=None,
    keywords: list[str] | None = None,
) -> SimResult:
    page_by_canon = {canonicalize_url(p["url"]): p for p in pages}
    matcher = RobotsMatcher(
        [(r["domain"], r["rules"]) for r in (robots_rows or [])]
    )
    res = SimResult()

    # frontier entry: (url, url_canon, domain, priority, depth, via, meta)
    frontier = []
    for s in seeds:
        canon = canonicalize_url(s["url"])
        frontier.append({
            "url": s["url"], "url_canon": canon,
            "domain": registrable_domain(canon), "priority": 1.0,
            "depth": 0, "via": None, "meta": dict(s.get("meta") or {}),
        })

    date_filtered = {"mirror", "tg_online", "newsminute"}
    kw_filtered = {"tg_epaper"}
    headline_dedup = {"ht"}   # A3: ht.py:261-268 (key incl. ' - no data -')
    # the reference done-set spans the whole scrape(), i.e. every round
    # of the run — a headline emitted once is never emitted again
    done_headlines: set[tuple] = set()

    for gen in range(max_rounds):
        if not frontier:
            break
        cnt = {"fetched": 0, "missing": 0, "robots_blocked": 0,
               "deferred": 0, "errors": 0, "deduped": 0}

        allowed = []
        for e in frontier:
            if matcher.allowed(e["domain"], e["url_canon"]):
                allowed.append(e)
            else:
                cnt["robots_blocked"] += 1

        # dedup: in-frontier (deterministic representative) + seen set
        by_canon: dict[str, dict] = {}
        for e in allowed:
            k = e["url_canon"]
            if k not in by_canon:
                by_canon[k] = e
            else:
                cur = by_canon[k]
                key_new = (-e["priority"], e["depth"], e["via"] is not None,
                           e["via"] or "", e["url"])
                key_cur = (-cur["priority"], cur["depth"],
                           cur["via"] is not None, cur["via"] or "", cur["url"])
                if key_new < key_cur:
                    by_canon[k] = e
        cnt["deduped"] += len(allowed) - len(by_canon)
        new = []
        for k, e in by_canon.items():
            if k in res.seen:
                cnt["deduped"] += 1
            else:
                new.append(e)

        # politeness: top-budget per domain by (priority desc, url_canon asc)
        per_host: dict[str, list[dict]] = {}
        for e in new:
            per_host.setdefault(e["domain"], []).append(e)
        scheduled, deferred = [], []
        for domain in per_host:
            entries = sorted(per_host[domain],
                             key=lambda e: (-e["priority"], e["url_canon"]))
            scheduled.extend(entries[:budget_per_host])
            deferred.extend(entries[budget_per_host:])
        scheduled.sort(key=lambda e: (e["domain"], -e["priority"], e["url_canon"]))
        res.schedule.append([e["url_canon"] for e in scheduled])
        cnt["fetched"] = len(scheduled)
        cnt["deferred"] = len(deferred)

        # fetch + extract
        new_links = []
        round_records: list[dict] = []
        for e in scheduled:
            res.seen.add(e["url_canon"])
            page = page_by_canon.get(e["url_canon"])
            if page is None:
                cnt["missing"] += 1
                continue
            parsed = parse_page(e["url"], page["html"].decode(), e["meta"])
            if parsed.error is not None:
                cnt["errors"] += 1
            for link in parsed.links:
                canon = canonicalize_url(link.url)
                new_links.append({
                    "url": link.url, "url_canon": canon,
                    "domain": registrable_domain(canon),
                    "priority": round(1.0 / (gen + 2), 6),
                    "depth": gen + 1, "via": e["url"], "meta": dict(link.meta),
                })
            for rec in parsed.records:
                src = rec["source"]
                if (src in date_filtered and window_start is not None
                        and window_end is not None):
                    if rec["published"] is None or not (
                            window_start < rec["published"] < window_end):
                        continue
                if src in kw_filtered and keywords:
                    title = (rec["title"] or "").lower()
                    body = (rec["text"] or "").lower()
                    if not any((k.lower() in title and title != "")
                               or k.lower() in body for k in keywords):
                        continue
                r = dict(rec)
                r["gen"] = gen
                round_records.append(r)

        # A3: headline dedup for sources that key on headline — winner =
        # min url within the round (engine: window over (source, title)),
        # and a title emitted by ANY earlier round never re-emits
        # (engine: anti-join against the carried done-set).
        best_by_headline: dict[tuple, dict] = {}
        for r in round_records:
            if r["source"] in headline_dedup:
                k = (r["source"], r["title"])
                if k in done_headlines:
                    continue
                cur = best_by_headline.get(k)
                if cur is None or r["url"] < cur["url"]:
                    best_by_headline[k] = r
            else:
                res.results.append(r)
        res.results.extend(best_by_headline.values())
        done_headlines.update(best_by_headline)

        frontier = deferred + new_links
        for m, n in cnt.items():
            res.counters.append({"gen": gen, "metric": m, "n": n})

    return res


__all__ = ["SimResult", "simulate_crawl"]
