"""robots.txt gating (RFC 9309 subset).

The reference has no robots handling at all — its semaphore is its only
courtesy — so semantics here come from RFC 9309 (SURVEY.md §4.4, flagged
as new surface): longest-match rule wins between Allow and Disallow
groups for ``User-agent: *``; empty Disallow value allows everything; a
domain with no robots row is fully allowed (§2.3.1.2: unavailable →
unrestricted). '*' wildcards and '$' anchors are supported.

The rules table is tiny (one row per domain) → parsed once, broadcast,
matched inside a vectorized pandas UDF.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(body: str) -> list[tuple[bool, str]]:
    """Extract (allow, path_pattern) rules for ``User-agent: *`` groups.

    A group is one or more consecutive User-agent lines followed by rule
    lines; the first rule line closes the agent list (RFC 9309 §2.2.1).
    """
    rules: list[tuple[bool, str]] = []
    group_agents: list[str] = []
    in_agent_list = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field_, value = line.split(":", 1)
        field_ = field_.strip().lower()
        value = value.strip()
        if field_ == "user-agent":
            if not in_agent_list:
                group_agents = []
                in_agent_list = True
            group_agents.append(value.lower())
        elif field_ in ("allow", "disallow"):
            in_agent_list = False
            if "*" in group_agents:
                if field_ == "disallow" and value == "":
                    continue  # empty Disallow = no restriction
                rules.append((field_ == "allow", value))
        else:
            in_agent_list = False
    return rules


def _compile(pattern: str) -> re.Pattern[str]:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "$":
            out.append("$")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out))


class RobotsMatcher:
    """Per-domain compiled rule set; picklable for broadcast."""

    def __init__(self, rows: list[tuple[str, str]]):
        # rows: (domain, robots_body)
        self.rules: dict[str, list[tuple[bool, str]]] = {
            domain: parse_robots(body) for domain, body in rows
        }
        self._compiled: dict[str, list[tuple[bool, int, re.Pattern[str]]]] = {}

    def _get(self, domain: str):
        if domain not in self._compiled:
            self._compiled[domain] = [
                (allow, len(pat), _compile(pat))
                for allow, pat in self.rules.get(domain, [])
            ]
        return self._compiled[domain]

    def allowed(self, domain: str, url: str) -> bool:
        compiled = self._get(domain)
        if not compiled:
            return True
        return _match_one(compiled, url)

    def allowed_batch(self, domains: pd.Series, urls: pd.Series) -> list[bool]:
        """Vectorized gate: group the batch by domain so rule lookup and
        compilation happen once per unique domain — per-row work is
        regex matching only."""
        out = [True] * len(domains)
        dvals = domains.to_numpy()
        uvals = urls.to_numpy()
        idx_by_dom: dict[str, list[int]] = {}
        for i, d in enumerate(dvals):
            idx_by_dom.setdefault(d, []).append(i)
        for d, idxs in idx_by_dom.items():
            compiled = self._get(d)
            if not compiled:
                continue
            for i in idxs:
                out[i] = _match_one(compiled, uvals[i])
        return out


def _match_one(compiled: list[tuple[bool, int, re.Pattern[str]]],
               url: str) -> bool:
    """Longest-match winner between Allow/Disallow (RFC 9309 §2.2.2)."""
    parts = urlsplit(url)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    best_len = -1
    best_allow = True
    for allow, plen, rx in compiled:
        if rx.match(path) and plen > best_len:
            best_len = plen
            best_allow = allow
    return best_allow


def robots_annotate_cogroup(
    frontier: DataFrame,
    robots: DataFrame,
    *,
    url_col: str = "url_canon",
    domain_col: str = "domain",
    out_col: str = "__allowed",
) -> DataFrame:
    """Scale-path robots gate: cogroup the frontier with the rules table
    on domain — NO driver collect, NO whole-table broadcast.

    At a million-domain robots table the broadcast matcher is a driver
    OOM; cogrouping ships each task exactly the rule rows of the
    domains it holds, the task compiles them once, and matching is
    vectorized over that domain's urls. Costs one shuffle of the
    (narrow) frontier by domain — which the politeness window needs
    anyway. Adds boolean ``out_col``.
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    out_schema = StructType(
        frontier.schema.fields + [StructField(out_col, BooleanType())])
    in_cols = [f.name for f in frontier.schema.fields]

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(columns=[*in_cols, out_col])
        # one rules row per domain (dupes would make the gate ambiguous)
        assert len(right) <= 1, f"{len(right)} robots rows for one domain"
        if len(right) == 0:
            left[out_col] = True
            return left
        compiled = [(allow, len(p), _compile(p))
                    for allow, p in parse_robots(right["rules"].iloc[0])]
        if not compiled:
            left[out_col] = True
            return left
        left[out_col] = [_match_one(compiled, u) for u in left[url_col]]
        return left

    return (frontier.groupBy(domain_col)
            .cogroup(robots.groupBy("domain"))
            .applyInPandas(probe, out_schema))


def robots_gate(
    frontier: DataFrame,
    robots: DataFrame | None,
    *,
    url_col: str = "url_canon",
    domain_col: str = "domain",
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (allowed, blocked) by robots rules.

    ``robots`` schema: (domain string, rules string). None → all allowed.
    """
    if robots is None:
        return frontier, frontier.limit(0)
    rows = [(r["domain"], r["rules"]) for r in robots.collect()]
    matcher = RobotsMatcher(rows)
    bc = frontier.sparkSession.sparkContext.broadcast(matcher)

    @F.pandas_udf("boolean")
    def allowed_udf(domains: pd.Series, urls: pd.Series) -> pd.Series:
        m = bc.value
        return pd.Series(m.allowed_batch(domains, urls), dtype=bool)

    gated = frontier.withColumn(
        "__allowed", allowed_udf(F.col(domain_col), F.col(url_col))
    )
    allowed = gated.filter(F.col("__allowed")).drop("__allowed")
    blocked = gated.filter(~F.col("__allowed")).drop("__allowed")
    return allowed, blocked


__all__ = ["parse_robots", "RobotsMatcher", "robots_gate",
           "robots_annotate_cogroup"]
