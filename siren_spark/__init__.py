"""siren_spark — a PySpark-native distributed crawl + web-text analytics engine.

A from-scratch re-expression of the capabilities of CMHLP/siren
(/root/reference, an asyncio news-scraper suite) as an idiomatic Spark
engine: URL frontier + fetch scheduler over a Common-Crawl-style pages
table, RFC-3986 + per-site URL canonicalization, partitioned Bloom
URL-seen set, per-host politeness-aware priority scheduling, robots.txt
gating, per-round checkpoint/resume with lineage counters, and per-site
HTML-to-text extraction kernels compiled into vectorized pandas UDFs.

Nothing here is a port: the reference's asyncio task fan-outs become
DataFrame partitions, its `set()` dedup becomes Bloom + anti-join, its
semaphore becomes a per-host window top-k, and its per-site parsers
become Arrow-batched UDFs dispatched by registrable domain.
"""

__version__ = "0.1.0"

from siren_spark.urls import canonicalize_url, registrable_domain  # noqa: F401
