"""Stateful streaming sessionization — the continuous counterpart of
operators/sessionize.py, built on the same ``applyInPandasWithState``
pattern as politeness_state.py.

State per key is ONE open session (last_us, seq, start_us, n,
value_c) — five longs, so a billion keys is ~40 GB of state store
spread across executors and trivially checkpointable. A session is
emitted when a later event closes it (gap exceeded); the still-open
session rides in state across micro-batches, exactly like the batch
operator's running scan but split at trigger boundaries.

Ordering contract: rows are sorted (ts, id) *within* each batch, so
any in-batch disorder is absorbed. A row arriving in a LATER batch
with ``ts`` behind the open session's last event (cross-batch
out-of-order) is merged into the open session — counted, value
summed — but never moves the session's clock backwards and never
reopens an emitted session (its accounting is closed, the same
late-row stance as the politeness throttle's closed epochs). Use an
upstream watermark + sorted sink if stronger ordering is needed.

Timestamps are emitted as epoch microseconds (``start_us`` /
``end_us``): the state tuple and output stay timezone-free longs,
matching the batch operator's interval math (no session-tz
dependence anywhere).

``flush_idle_ms`` arms a processing-time timeout per key: a key quiet
for that long has its open session force-emitted and its state
dropped — the streaming replacement for the batch operator's
end-of-input flush (without it, availableNow drains leave each key's
final session open in state, by design).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

_STATE = StructType([
    StructField("last_us", LongType()),
    StructField("seq", LongType()),
    StructField("start_us", LongType()),
    StructField("n", LongType()),
    StructField("value_c", LongType()),
])


def sessionize_stream(
    events: DataFrame,
    *,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str | None = None,
    flush_idle_ms: int | None = None,
) -> DataFrame:
    """Emit one row per CLOSED session: (key, session_seq, n_events,
    start_us, end_us, duration_s[, value_sum_c])."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    gap_us = int(gap_seconds) * 1_000_000
    key_type = events.schema[key_col].dataType
    fields = [StructField(key_col, key_type),
              StructField("session_seq", LongType()),
              StructField("n_events", LongType()),
              StructField("start_us", LongType()),
              StructField("end_us", LongType()),
              StructField("duration_s", LongType())]
    if value_col is not None:
        fields.append(StructField("value_sum_c", LongType()))
    out_schema = StructType(fields)
    out_cols = [f.name for f in fields]
    has_value = value_col is not None

    def run(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
        def emit_row(last, seq, start, n, vc):
            row = [key[0], seq, n, start, last, (last - start) // 10 ** 6]
            if has_value:
                row.append(vc)
            return row

        if state.hasTimedOut:
            # idle flush: close the open session and drop the key
            (last, seq, start, n, vc) = state.get
            state.remove()
            yield pd.DataFrame([emit_row(last, seq, start, n, vc)],
                               columns=out_cols)
            return

        (last, seq, start, n, vc) = (state.get if state.exists
                                     else (None, 0, 0, 0, 0))
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values([ts_col, id_col]).reset_index(drop=True)
        ts_us = (pdf[ts_col].to_numpy().astype("datetime64[us]")
                 .astype("int64"))
        cents = (pd.Series(pdf[value_col] * 100).round().astype("int64")
                 .to_numpy() if has_value else None)
        closed: list[list] = []
        for i in range(len(pdf)):
            t = int(ts_us[i])
            c = int(cents[i]) if has_value else 0
            if last is None:                       # first ever event
                last, seq, start, n, vc = t, 1, t, 1, c
            elif t - last > gap_us:                # gap: close + reopen
                closed.append(emit_row(last, seq, start, n, vc))
                last, seq, start, n, vc = t, seq + 1, t, 1, c
            elif t < last:                         # cross-batch late row
                n, vc = n + 1, vc + c
            else:                                  # extends open session
                last, n, vc = t, n + 1, vc + c
        state.update((int(last), int(seq), int(start), int(n), int(vc)))
        if flush_idle_ms is not None:
            state.setTimeoutDuration(int(flush_idle_ms))
        if closed:
            yield pd.DataFrame(closed, columns=out_cols)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if flush_idle_ms is not None
               else GroupStateTimeout.NoTimeout)
    return (events.groupBy(key_col)
            .applyInPandasWithState(run, out_schema, _STATE, "append",
                                    timeout))


def run_session_query(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    gap_seconds: int,
    value_col: str | None = None,
    available_now: bool = True,
    **kwargs: Any,
):
    """Wire the streaming sessionizer into a parquet-sink query."""
    sessions = sessionize_stream(events, gap_seconds=gap_seconds,
                                 value_col=value_col, **kwargs)
    writer = (sessions.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = ["sessionize_stream", "run_session_query"]
