"""Per-host politeness-aware priority scheduling (salted two-phase top-k).

The distributed generalization of the reference's single global
semaphore (core/http.py:58-89, max_concurrency=50, config.toml:10): a
*semantic* per-host budget per round, enforced with a deterministic
total order so runs are reproducible at any parallelism (the N-vs-4N
scaling runs must schedule identical URLs).

Skew: one hot domain can be ~30% of a web frontier. A plain
``Window.partitionBy(domain)`` funnels that domain through one task. The
two-phase top-k bounds it: phase 1 ranks within (domain, salt) — salt =
xxhash64(url) % S — and keeps at most ``budget`` rows per salted group,
so phase 2's per-domain window sees at most S×budget rows per domain
regardless of frontier skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def politeness_schedule(
    frontier: DataFrame,
    *,
    budget_per_host: int,
    salt_buckets: int = 16,
    domain_col: str = "domain",
    order_col: str = "url_canon",
    priority_col: str = "priority",
) -> tuple[DataFrame, DataFrame]:
    """Split ``frontier`` into (scheduled, deferred) for this round.

    Scheduled = top ``budget_per_host`` rows per domain, ordered by
    (priority desc, url_canon asc) — a total order independent of
    physical partitioning (SURVEY.md §4.2).
    """
    order = [F.desc(priority_col), F.asc(order_col)]

    salted = frontier.withColumn(
        "__salt", F.pmod(F.xxhash64(order_col), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(domain_col, "__salt").orderBy(*order)
    pre = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= budget_per_host)
        .drop("__rn")
    )
    w2 = Window.partitionBy(domain_col).orderBy(*order)
    ranked = pre.withColumn("__rn", F.row_number().over(w2))
    scheduled = ranked.filter(F.col("__rn") <= budget_per_host).drop("__rn", "__salt")
    deferred = frontier.join(
        scheduled.select(order_col), order_col, "left_anti"
    )
    return scheduled, deferred


__all__ = ["politeness_schedule"]
