"""Stateful streaming politeness: per-host budget across micro-batches.

The batch crawl loop enforces its politeness budget per round with the
salted two-phase top-k window (operators/politeness.py). A continuous
deployment (pages/links arriving as a stream) needs the same semantic —
"at most N scheduled fetches per registrable domain per budget epoch" —
but across micro-batches, which requires keyed state:
``applyInPandasWithState`` keeps one counter per domain that survives
triggers, so a host cannot exceed its budget by spreading arrivals over
many small batches (the reference's asyncio semaphore held for the whole
run, core/http.py; this is its streaming-time analog).

Within a batch, rows are admitted in deterministic (priority desc,
url_canon asc) order — the same total order the batch engine uses — so
replays admit the same rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

THROTTLE_OUTPUT = StructType([
    StructField("domain", StringType()),
    StructField("url_canon", StringType()),
    StructField("priority", DoubleType()),
    StructField("admitted", IntegerType()),   # 1 = fetch, 0 = deferred
])

_STATE = StructType([StructField("used", IntegerType())])


def politeness_throttle_stream(
    links: DataFrame,
    *,
    budget_per_host: int,
) -> DataFrame:
    """Admit at most ``budget_per_host`` rows per domain over the whole
    stream; excess rows are emitted with admitted=0 (deferred) so the
    caller can route them to a retry table instead of dropping them.

    Input must carry (domain, url_canon, priority). State per domain is
    ONE integer — at a million domains that is a few MB of state store,
    trivially checkpointable.
    """
    budget = int(budget_per_host)

    def throttle(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (used,) = state.get if state.exists else (0,)
        # one group's batch rows may arrive chunked: concat before the
        # sort so admission order is the batch-global deterministic
        # order, not chunk-local
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(
            ["priority", "url_canon"], ascending=[False, True])
        n = len(pdf)
        admit = max(0, min(budget - used, n))
        used += admit
        state.update((used,))
        yield pd.DataFrame({
            "domain": pdf["domain"].to_numpy(),
            "url_canon": pdf["url_canon"].to_numpy(),
            "priority": pdf["priority"].to_numpy(),
            "admitted": [1] * admit + [0] * (n - admit),
        })

    return (links.groupBy("domain")
            .applyInPandasWithState(
                throttle, THROTTLE_OUTPUT, _STATE, "append",
                GroupStateTimeout.NoTimeout))


def run_throttle_query(
    links: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    budget_per_host: int,
    available_now: bool = True,
) -> Any:
    """Wire the throttle into a parquet-sink streaming query."""
    throttled = politeness_throttle_stream(
        links, budget_per_host=budget_per_host)
    writer = (throttled.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = ["politeness_throttle_stream", "run_throttle_query",
           "THROTTLE_OUTPUT"]
