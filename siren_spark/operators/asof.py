"""As-of join — the point-in-time lookup Spark has no built-in for.

For every left row, attach the most recent right row of the same key
with ``right.on <= left.on`` (backward, inclusive — the semantic of
DuckDB/QuestDB ASOF JOIN and pandas merge_asof): "which snapshot /
price / robots version / politeness budget was in force when this
event happened". A naive translation is a range join (quadratic
blow-up per key); the scalable DataFrame composition is the
union-sort-carry pattern:

1. union the two sides (right rows marked), aligned by (key, on);
2. one window per key ordered (on asc, right-first on ties) carries
   each right value forward with ``last(..., ignorenulls=True)`` over
   an unbounded-preceding frame — bounded state, no self-join;
3. keep only left rows; a ``tolerance`` nulls matches older than the
   given interval (interval arithmetic: µs-exact, tz/NTZ-safe, like
   operators/sessionize.py).

Cost: ONE shuffle of left+right on the key and a per-key sort —
exactly what any correct as-of needs; no row ever joins more than one
partner, so there is no range-join explosion at any skew. A
pathologically hot key serializes through one task's sort (same bound
as sessionize); pre-split by coarse time range if a single key's
history exceeds a task.

Right rows must be unique per (key, on) — with duplicates "the most
recent right row" is ill-defined; dedup upstream (e.g.
``.groupBy(by, on).agg(last(...))`` under an explicit total order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str = "user_id",
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
    tolerance_seconds: int | None = None,
    keep_matched_on: bool = True,
) -> DataFrame:
    """Backward inclusive as-of join (see module docstring).

    Returns every left row plus ``prefix + c`` for each of
    ``value_cols`` (null when no right row is in scope) and — with
    ``keep_matched_on`` — ``prefix + on``, the matched right row's
    timestamp.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    if not value_cols:
        raise ValueError("value_cols must name at least one right column")
    missing = [c for c in value_cols if c not in right.columns]
    if missing:
        raise ValueError(f"right side lacks columns: {missing}")
    clash = [f"{prefix}{c}" for c in value_cols + [on]
             if f"{prefix}{c}" in left.columns]
    if clash:
        raise ValueError(f"output columns already exist on left: {clash}")

    carried = [f"__r_{c}" for c in value_cols]
    r2 = right.select(
        F.col(by), F.col(on),
        *[F.col(c).alias(a) for c, a in zip(value_cols, carried)],
        F.col(on).alias("__r_on"),
        F.lit(1).alias("__is_r"))
    l2 = left.withColumn("__is_r", F.lit(0))
    u = l2.unionByName(r2, allowMissingColumns=True)

    w = (Window.partitionBy(by)
         .orderBy(F.asc(on), F.desc("__is_r"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.select(
        *left.columns, "__is_r",
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
        F.last("__r_on", ignorenulls=True).over(w).alias("__r_on"))

    in_scope = F.col("__r_on").isNotNull()
    if tolerance_seconds is not None:
        if tolerance_seconds <= 0:
            raise ValueError(
                f"tolerance_seconds must be positive, got {tolerance_seconds}")
        tol = F.expr(f"INTERVAL {int(tolerance_seconds)} SECOND")
        in_scope = in_scope & ((F.col(on) - F.col("__r_on")) <= tol)

    out_cols = [F.when(in_scope, F.col(a)).otherwise(F.lit(None))
                .alias(f"{prefix}{c}")
                for c, a in zip(value_cols, carried)]
    if keep_matched_on:
        out_cols.append(F.when(in_scope, F.col("__r_on"))
                        .otherwise(F.lit(None)).alias(f"{prefix}{on}"))
    return (u.filter(F.col("__is_r") == 0)
            .select(*left.columns, *out_cols))


__all__ = ["asof_join"]
