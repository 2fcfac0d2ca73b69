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


def compute_fields(
    model_fields: list[str],
    *,
    include: set[str] | None = None,
    exclude: set[str] | None = None,
    class_fields: list[str] | None = None,
) -> list[str]:
    """core/scraper.py:117-128 field-set computation.

    ``fields = set(model_fields) | include - exclude`` unless the model
    declares ``FIELDS`` (``class_fields``), which wins wholesale. The
    no-FIELDS path iterates a python *set*, so column order is set
    iteration order — hash-randomized across interpreter runs. That
    quirk is the reference's actual behavior and is reproduced
    faithfully here (models that care declare FIELDS; ours do too).
    """
    if class_fields:
        return list(class_fields)
    fields = set(model_fields)
    fields |= set(include or ())
    fields -= set(exclude or ())
    return list(fields)


def reference_csv_bytes(
    df: DataFrame,
    fields: list[str],
    *,
    aliases: dict[str, str] | None = None,
    clean: "object | None" = None,
) -> bytes:
    """Render ``df`` to CSV bytes exactly as the reference would.

    ``clean`` is the P11 hook (core/scraper.py:141-142): a
    DataFrame -> DataFrame callable applied between the engine results
    and serialization — the Spark analog of ``Scraper.clean(data)``
    (default: identity, exactly like the reference's base class).
    """
    aliases = aliases or {}
    if clean is not None:
        df = clean(df)
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


__all__ = ["compute_fields", "reference_csv_bytes", "result_filename",
           "transform", "NO_DATA"]
