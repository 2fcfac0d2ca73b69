"""Reference-exact CSV sink (S5/S6 + P10 in SURVEY.md §2).

Reproduces ``BaseScraper.to_csv`` byte-for-byte (core/scraper.py:86-139):
Python ``csv.writer`` quoting (NOT Spark's CSV writer — quoting rules
differ, SURVEY.md §7 hard-parts), the ``transform`` serializer
(datetime/date -> '%Y-%m-%d', everything else -> str(): None -> 'None',
core/scraper.py:15-25), missing field -> '- no data -'
(core/scraper.py:133), header aliasing (core/scraper.py:126), and the
``{Name}_{date|start_end}.csv`` file naming (core/scraper.py:144-155).

The DataFrame is collected per export — result sets are scraper-sized
(the reference materializes the full list in memory too). For corpus-
scale exports use the parquet results table; this sink exists for
reference-output parity.
"""

from __future__ import annotations

import csv
from datetime import date, datetime, timedelta
from io import StringIO

from pyspark.sql import DataFrame

NO_DATA = "- no data -"


def transform(item: object) -> str:
    """core/scraper.py:15-25 — byte-identity-critical serializer."""
    if isinstance(item, (datetime, date)):
        return item.strftime("%Y-%m-%d")
    return str(item)


def reference_csv_bytes(
    df: DataFrame,
    fields: list[str],
    *,
    aliases: dict[str, str] | None = None,
) -> bytes:
    """Render ``df`` to CSV bytes exactly as the reference would."""
    aliases = aliases or {}
    rows = df.collect()
    buf = StringIO()
    if not rows:
        return b""
    writer = csv.writer(buf)
    writer.writerow([aliases.get(f, f) for f in fields])
    for r in rows:
        d = r.asDict()
        out = []
        for f in fields:
            value = d.get(f, NO_DATA) if f in d else NO_DATA
            out.append(transform(value))
        writer.writerow(out)
    return buf.getvalue().encode()


def result_filename(name: str, start: datetime, end: datetime) -> str:
    """core/scraper.py:144-155 — `{Name}_{date|start_end}.csv`."""
    fmt = "%Y-%m-%d"
    if (end - start) <= timedelta(days=1):
        daterange = end.strftime(fmt)
    else:
        daterange = f"{start.strftime(fmt)}_{end.strftime(fmt)}"
    return f"{name}_{daterange}.csv"


__all__ = ["reference_csv_bytes", "result_filename", "transform", "NO_DATA"]
