"""Per-site extraction kernels (pure Python, Arrow-UDF-wrapped upstream).

Each kernel re-implements one reference scraper's parse logic
byte-identically (citations inline in siren_spark/kernels/sites.py) under
a unified contract:

    parse(payload: str, url: str, meta: dict) -> ParseResult(links, records)

- ``links``: URLs discovered on this page (article links AND follow-up
  search/pagination pages, reproducing each site's page-count arithmetic
  including its off-by-ones), each with carried-forward metadata (the
  reference's parent-fields-copied-onto-children join, readwhere
  core.py:102-107).
- ``records``: extracted article records with the dialect's extracted
  ``text`` (the byte-identity target).

The registry maps registrable domain -> kernel so the Spark layer can
dispatch inside one vectorized UDF batch.
"""

from siren_spark.kernels.sites import (  # noqa: F401
    KERNELS,
    Link,
    ParseResult,
    RECORD_FIELDS,
    parse_page,
)
