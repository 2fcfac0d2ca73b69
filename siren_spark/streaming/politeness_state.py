"""Stateful streaming politeness: per-host budget per epoch, across
micro-batches.

The batch crawl loop enforces its politeness budget per round with the
salted two-phase top-k window (operators/politeness.py). A continuous
deployment (pages/links arriving as a stream) needs the same semantic —
"at most N scheduled fetches per registrable domain per budget epoch" —
but across micro-batches, which requires keyed state:
``applyInPandasWithState`` keeps one (epoch, used) counter per domain
that survives triggers, so a host cannot exceed its budget by spreading
arrivals over many small batches (the reference's asyncio semaphore held
for the whole run, core/http.py; this is its streaming-time analog with
the batch engine's per-round reset).

``epoch_col`` names a non-negative BIGINT column — e.g.
``floor(unix_timestamp(ts) / epoch_secs)`` or the crawl round number —
and the budget resets whenever a domain enters a new (larger) epoch.
Rows from an epoch EARLIER than the domain's current epoch (late
arrivals after rollover) are deferred: that epoch's accounting is
closed, and admitting them could exceed its budget. Without
``epoch_col`` the budget covers the whole stream (one everlasting
epoch).

Within a batch, rows are admitted in deterministic (epoch asc, priority
desc, url_canon asc) order — the same total order the batch engine uses
— so replays admit the same rows.

Upgrading note: the state schema is (epoch, used); checkpoints written
by the pre-epoch format (used only) are incompatible — start a new
checkpoint dir.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

_NO_EPOCH = -1   # state sentinel: no epoch seen yet (epochs must be >= 0)

_STATE = StructType([StructField("epoch", LongType()),
                     StructField("used", IntegerType())])


def _output_schema(epoch_col: str | None) -> StructType:
    fields = [
        StructField("domain", StringType()),
        StructField("url_canon", StringType()),
        StructField("priority", DoubleType()),
    ]
    if epoch_col is not None:
        fields.append(StructField(epoch_col, LongType()))
    fields.append(StructField("admitted", IntegerType()))  # 1=fetch 0=defer
    return StructType(fields)


# kept for import compatibility: the no-epoch output shape
THROTTLE_OUTPUT = _output_schema(None)


def politeness_throttle_stream(
    links: DataFrame,
    *,
    budget_per_host: int,
    epoch_col: str | None = None,
) -> DataFrame:
    """Admit at most ``budget_per_host`` rows per domain per epoch (see
    module docstring); excess and late rows are emitted with admitted=0
    (deferred) so the caller can route them to a retry table instead of
    dropping them.

    Input must carry (domain, url_canon, priority[, epoch_col]). State
    per domain is ONE (long, int) pair — at a million domains that is a
    few MB of state store, trivially checkpointable.
    """
    budget = int(budget_per_host)
    ecol = epoch_col
    out_schema = _output_schema(ecol)

    def throttle(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (cur_epoch, used) = state.get if state.exists else (_NO_EPOCH, 0)
        # one group's batch rows may arrive chunked: concat before the
        # sort so admission order is the batch-global deterministic
        # order, not chunk-local
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if ecol is not None:
            raw = pdf[ecol]
            if raw.isna().any():
                # a NULL epoch would make astype('int64') throw inside
                # the stateful UDF and fail the whole streaming query —
                # reject the row set loudly with an actionable message
                raise ValueError(
                    f"politeness_throttle_stream: NULL in epoch column "
                    f"{ecol!r} for domain {key[0]!r}; fill or filter "
                    f"epochs upstream")
            eser = raw.astype("int64")
            if (eser < 0).any():
                # negative epochs collide with the _NO_EPOCH sentinel
                # (-1): such rows would be silently deferred forever
                raise ValueError(
                    f"politeness_throttle_stream: epoch column {ecol!r} "
                    f"must be >= 0 (sentinel {_NO_EPOCH} is reserved); "
                    f"got min {int(eser.min())} for domain {key[0]!r}")
        else:
            eser = pd.Series(np.zeros(len(pdf), dtype="int64"))
        pdf = (pdf.assign(__epoch=eser.to_numpy())
               .sort_values(["__epoch", "priority", "url_canon"],
                            ascending=[True, False, True])
               .reset_index(drop=True))
        admitted = np.zeros(len(pdf), dtype="int32")
        pos = 0
        for epoch, grp in pdf.groupby("__epoch", sort=True):
            n = len(grp)
            if epoch > cur_epoch:           # rollover: budget resets
                cur_epoch, used = int(epoch), 0
            if epoch == cur_epoch:
                admit = max(0, min(budget - used, n))
                used += admit
                admitted[pos:pos + admit] = 1
            # epoch < cur_epoch: late rows of a closed epoch -> deferred
            pos += n
        state.update((int(cur_epoch), int(used)))
        out = {
            "domain": pdf["domain"].to_numpy(),
            "url_canon": pdf["url_canon"].to_numpy(),
            "priority": pdf["priority"].to_numpy(),
        }
        if ecol is not None:
            out[ecol] = pdf["__epoch"].to_numpy()
        out["admitted"] = admitted
        yield pd.DataFrame(out)

    return (links.groupBy("domain")
            .applyInPandasWithState(
                throttle, out_schema, _STATE, "append",
                GroupStateTimeout.NoTimeout))


def run_throttle_query(
    links: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    budget_per_host: int,
    epoch_col: str | None = None,
    available_now: bool = True,
) -> Any:
    """Wire the throttle into a parquet-sink streaming query."""
    throttled = politeness_throttle_stream(
        links, budget_per_host=budget_per_host, epoch_col=epoch_col)
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
