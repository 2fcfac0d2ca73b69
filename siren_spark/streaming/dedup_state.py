"""Stateful streaming exact dedup — the continuous counterpart of
functions/text.py:dedup_exact, on the same ``applyInPandasWithState``
pattern as politeness_state.py / session_state.py.

A continuously-ingesting corpus (a live crawl drain) needs the same
"have I seen this content before?" gate the batch pipeline runs as a
one-shot groupBy: group the stream by content fingerprint (md5 of the
text — computed JVM-side before the stateful exchange, so document
bytes are hashed once and the state key is 32 hex chars), keep ONE
long of state per distinct fingerprint, and emit a row only for the
first arrival. Every later duplicate updates the count silently —
``n_seen`` rides in state for the lineage/metrics sink, not the
output.

Semantics contract: the winner is the FIRST ARRIVAL — within a
micro-batch ties are broken by ``id_col`` (sorted, so in-batch order
is deterministic), across micro-batches the earlier batch wins by
construction. Over an availableNow drain whose duplicates all land in
ONE micro-batch this equals the batch dedup's min-id winner; when a
drain splits into several micro-batches (e.g. maxFilesPerTrigger), a
fingerprint first seen in an earlier batch wins regardless of id —
i.e. cross-batch semantics are arrival order, min-id only within a
batch. Over a live stream that arrival order is exactly what a crawl
wants (the first fetch wins, later mirrors are the duplicates).

Scale: state is one long per DISTINCT document — the streaming analog
of the batch URL-seen Bloom (operators/seen.py), exact instead of
probabilistic because the fingerprint IS the group key; a billion
distinct docs is ~8 GB of state spread across executors, checkpointed
incrementally by the state store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

_STATE = StructType([StructField("n_seen", LongType())])


def dedup_stream(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Emit (fp, <id_col>) for the first arrival of each distinct
    ``text_col`` value; drop every later duplicate."""
    id_type = docs.schema[id_col].dataType
    out_schema = StructType([StructField("fp", StringType()),
                             StructField(id_col, id_type)])
    out_cols = [f.name for f in out_schema.fields]

    def run(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        n = len(pdf)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n,))
            return
        state.update((n,))
        winner = pdf.sort_values(id_col).iloc[0]
        yield pd.DataFrame([[key[0], winner[id_col]]], columns=out_cols)

    keyed = docs.select(F.md5(F.col(text_col)).alias("fp"),
                        F.col(id_col))
    return (keyed.groupBy("fp")
            .applyInPandasWithState(run, out_schema, _STATE, "append",
                                    GroupStateTimeout.NoTimeout))


def run_dedup_query(
    docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    **kwargs: Any,
):
    """Drive dedup_stream to a parquet sink (availableNow drain by
    default), mirroring run_session_query / run_throttle_query."""
    deduped = dedup_stream(docs, **kwargs)
    writer = (deduped.writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
