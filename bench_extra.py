"""Per-query isolation harness for optimization work (guide §1.4).

NOT the graded bench (bench.py is frozen): this times individual
declared queries with the noop sink, optionally several repetitions,
and can dump ``.explain("formatted")`` per query for the plan record
under plans/r06/.

Usage:
  python bench_extra.py time q1 q2 ...      # best-of-N noop timings
  python bench_extra.py explain OUTDIR SUFFIX q1 q2 ...
  python bench_extra.py time --all          # every headline query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32), REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("REPS", "3"))

HEADLINE = [
    "q1_pricing_summary", "j1_enrichment_join", "politeness_topk_per_host",
    "a3_latest_per_key", "dedup_minhash_lsh", "dedup_simhash",
    "ann_cosine_topk", "text_quality_score", "asof_join_backward",
    "sessionize_gap", "kmeans_lloyd", "tfidf_topk_terms",
]


def _spark():
    from siren_spark.session import get_spark
    return get_spark(f"local[{CPUS}]", app_name="bench_extra",
                     shuffle_partitions=int(CPUS))


def main() -> None:
    mode = sys.argv[1]
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    spark = _spark()
    if mode == "time":
        names = sys.argv[2:]
        if names == ["--all"]:
            names = HEADLINE
        out: dict[str, list[float]] = {}
        for name in names:
            times = []
            for _ in range(REPS):
                df = qs[name](spark, SF_DIR)
                spark.sparkContext.setJobDescription(f"time:{name}")
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            out[name] = times
            print(name, times, "best", min(times), flush=True)
        print(json.dumps({k: min(v) for k, v in out.items()}))
    elif mode == "explain":
        outdir, suffix = sys.argv[2], sys.argv[3]
        names = sys.argv[4:]
        if names == ["--all"]:
            names = HEADLINE
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
            print("wrote", name, flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
