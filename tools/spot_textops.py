"""2->8 scaling spot for the round-5 text/retrieval operators at volume.

edit_distance_verify claims "two id hash-joins + a codegen flat map",
inverted_index "one term groupBy with partial counts", and
length_quantiles "one combiner-friendly groupBy"; this measures those
claims the same way the crawl's north rule is measured: the identical
job on the identical input at local[2] and local[8], throughput at
both plus efficiency (thr_8 / (4 * thr_2)).

Input: a deterministic synthetic corpus (default 2M docs, 10-49 tokens
each from a 50k vocab, 10 language groups — pass SIREN_TXOPS_ROWS /
SIREN_TXOPS_VOCAB to reshape), generated once at local[32] into
SIREN_TXOPS_DATA (/tmp/siren_textops_data) behind a params marker.
Pairs for the verify op are adjacent ids (2M pairs, 48-char prefixes).
Timing excludes generation and session startup; each (op, cores) takes
the best of SIREN_TXOPS_REPS (default 2) consecutive runs, attempt
pairs interleaved 2,8 so a steal episode cannot bias one level.

Usage: python tools/spot_textops.py          # ~5-10 min
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get("SIREN_TXOPS_DATA", "/tmp/siren_textops_data")
ROWS = int(os.environ.get("SIREN_TXOPS_ROWS", str(2_000_000)))
VOCAB = int(os.environ.get("SIREN_TXOPS_VOCAB", str(50_000)))
REPS = int(os.environ.get("SIREN_TXOPS_REPS", "2"))
TRIES = int(os.environ.get("SIREN_TXOPS_TRIES", "1"))
PREFIX = int(os.environ.get("SIREN_TXOPS_PREFIX", "48"))
# comma-separated op subset, e.g. "edit_distance_verify,length_quantiles"
OPS = [o for o in os.environ.get("SIREN_TXOPS_OPS", "").split(",") if o]


def _ensure_data() -> str:
    marker = os.path.join(DATA, "marker.json")
    want = {"rows": ROWS, "vocab": VOCAB, "v": 1}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return os.path.join(DATA, "docs")
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from siren_spark.session import get_spark
    spark = get_spark("local[32]", app_name="txops_gen",
                      shuffle_partitions=64)
    n_tok = (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(40)) + 10).cast("int")
    toks = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), j), F.lit(VOCAB))
            .cast("string")))
    (spark.range(ROWS)
     .select(F.col("id").alias("doc_id"),
             F.concat(F.lit("l"),
                      F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10))
                      .cast("string")).alias("lang"),
             F.array_join(toks, " ").alias("text"))
     .repartition(64)
     .write.mode("overwrite").parquet(os.path.join(DATA, "docs")))
    spark.stop()
    with open(marker, "w") as f:
        json.dump(want, f)
    return os.path.join(DATA, "docs")


def _phase(cores: str) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from siren_spark.functions.curation import (inverted_index,
                                                length_quantiles)
    from siren_spark.functions.similarity import edit_distance_verify
    from siren_spark.session import get_spark

    spark = get_spark(f"local[{cores}]", app_name=f"txops_{cores}",
                      shuffle_partitions=int(cores) * 4)
    docs = spark.read.parquet(os.path.join(DATA, "docs"))
    docs.limit(1000).write.format("noop").mode("overwrite").save()  # warm

    def edit_df():
        pairs = docs.select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 1).alias("doc_b")).where(
                F.col("doc_b") < ROWS)
        return edit_distance_verify(docs, pairs, prefix_chars=PREFIX)

    ops = {
        "edit_distance_verify": edit_df,
        "inverted_index": lambda: inverted_index(docs, min_df=2),
        "length_quantiles": lambda: length_quantiles(docs),
    }
    if OPS:
        ops = {k: v for k, v in ops.items() if k in OPS}
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
    result = {"rows": ROWS, "vocab": VOCAB, "prefix": PREFIX,
              "attempts": attempts, "efficiency_2_to_8": {}}
    for op in attempts[2][0]:
        t2 = max(a[op]["rows_per_s"] for a in attempts[2])
        t8 = max(a[op]["rows_per_s"] for a in attempts[8])
        result["efficiency_2_to_8"][op] = round(t8 / (4 * t2), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
