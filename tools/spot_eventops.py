"""2->8 scaling spot for the event-stream operators at volume.

The as-of join, gap sessionization, and tumbling rollup each claim
"one key shuffle, no skew surface beyond the key histogram" in their
docstrings; this measures that claim the same way the crawl's north
rule is measured: the identical job on the identical input at
local[2] and local[8], throughput at both plus efficiency
(thr_8 / (4 * thr_2)).

Input: a deterministic synthetic event log (default 10M rows, 200k
users — ids hashed, so keys are uniform; pass SIREN_EVOPS_ROWS /
SIREN_EVOPS_USERS to reshape), generated once at local[32] into
SIREN_EVOPS_DATA (/tmp/siren_eventops_data) behind a params marker.
Timing excludes generation and session startup; each (op, cores)
takes the best of SIREN_EVOPS_REPS (default 2) consecutive runs,
attempt pairs interleaved 2,8 so a steal episode cannot bias one
level.

Usage: python tools/spot_eventops.py          # ~5-10 min
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get("SIREN_EVOPS_DATA", "/tmp/siren_eventops_data")
ROWS = int(os.environ.get("SIREN_EVOPS_ROWS", str(10_000_000)))
USERS = int(os.environ.get("SIREN_EVOPS_USERS", str(200_000)))
REPS = int(os.environ.get("SIREN_EVOPS_REPS", "2"))
TRIES = int(os.environ.get("SIREN_EVOPS_TRIES", "1"))


def _ensure_data() -> str:
    marker = os.path.join(DATA, "marker.json")
    want = {"rows": ROWS, "users": USERS, "v": 1}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return os.path.join(DATA, "events")
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from siren_spark.session import get_spark
    spark = get_spark("local[32]", app_name="evops_gen",
                      shuffle_partitions=64)
    h = F.xxhash64("id")
    (spark.range(ROWS)
     .select(F.col("id").alias("event_id"),
             F.pmod(h, F.lit(USERS)).alias("user_id"),
             F.timestamp_seconds(
                 F.lit(1700000000)
                 + F.pmod(F.xxhash64("id", F.lit(1)),
                          F.lit(30 * 86400))).cast("timestamp_ntz")
             .alias("ts"),
             F.element_at(
                 F.array(F.lit("view"), F.lit("click"), F.lit("error"),
                         F.lit("purchase")),
                 (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(4)) + 1)
                 .cast("int")).alias("event_type"),
             (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10000))
              .cast("double") / 100).alias("value"))
     .repartition(64)
     .write.mode("overwrite").parquet(os.path.join(DATA, "events")))
    spark.stop()
    with open(marker, "w") as f:
        json.dump(want, f)
    return os.path.join(DATA, "events")


def _phase(cores: str) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from siren_spark.operators.asof import asof_join
    from siren_spark.operators.sessionize import sessionize, tumbling_rollup
    from siren_spark.session import get_spark

    spark = get_spark(f"local[{cores}]", app_name=f"evops_{cores}",
                      shuffle_partitions=int(cores) * 4)
    ev = spark.read.parquet(os.path.join(DATA, "events"))
    ev.limit(1000).write.format("noop").mode("overwrite").save()  # warm

    def asof_df():
        lhs = ev.filter(F.col("event_type") != "purchase") \
            .select("event_id", "user_id", "ts")
        rhs = (ev.filter(F.col("event_type") == "purchase")
               .groupBy("user_id", "ts")
               .agg(F.max("value").alias("px")))
        return asof_join(lhs, rhs, value_cols=["px"])

    ops = {
        "asof_join": asof_df,
        "sessionize": lambda: sessionize(ev, gap_seconds=1800,
                                         value_col="value"),
        "tumbling_rollup": lambda: tumbling_rollup(
            ev, width_seconds=3600, key_col="event_type",
            value_col="value"),
    }
    out = {}
    for name, fn in ops.items():
        best = None
        for _ in range(REPS):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = {"sec": round(best, 2),
                     "rows_per_s": round(ROWS / best)}
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--phase":
        _phase(sys.argv[2])
        return
    _ensure_data()
    attempts: dict[int, list[dict]] = {2: [], 8: []}
    for _ in range(TRIES):
        for n in (2, 8):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--phase", str(n)],
                capture_output=True, text=True, timeout=3600,
                env={**os.environ})
            if r.returncode != 0:
                raise RuntimeError(r.stderr[-2000:])
            attempts[n].append(
                json.loads(r.stdout.strip().splitlines()[-1]))
    result = {"rows": ROWS, "users": USERS, "attempts": attempts,
              "efficiency_2_to_8": {}}
    for op in attempts[2][0]:
        t2 = max(a[op]["rows_per_s"] for a in attempts[2])
        t8 = max(a[op]["rows_per_s"] for a in attempts[8])
        result["efficiency_2_to_8"][op] = round(t8 / (4 * t2), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
