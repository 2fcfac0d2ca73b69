"""Benchmark harness. Prints ONE JSON line:

{"metric": "...", "value": <headline suite seconds>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <sf>,
 "crawl": {"urls": N, "local8_sec": .., "local32_sec": ..,
           "local8_urls_per_sec": .., "local32_urls_per_sec": ..,
           "scaling_efficiency": ..}}

Phases run in subprocesses so each gets its own JVM/master:
- queries: headline __spark_entry__ queries at $SPARK_GRAFT_SF_DIR
  (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].
- crawl@local[32] and crawl@local[8]: the full crawl engine over an
  identical pre-generated bench web (deterministic), evidencing the
  north-rule N-vs-4N scaling criterion in this sandbox
  (BASELINE.md "Our target"). Timing starts after the session is up and
  the input is on disk — it measures the crawl, not JVM startup.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_DATA = os.environ.get("SIREN_BENCH_DATA", "/tmp/siren_bench_web")
N_INDEX = int(os.environ.get("SIREN_BENCH_INDEX", "3000"))
LINKS = int(os.environ.get("SIREN_BENCH_LINKS", "50"))

HEADLINE = [
    "q1_pricing_summary",
    "j1_enrichment_join",
    "politeness_topk_per_host",
    "a3_latest_per_key",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality_score",
]


def _phase_queries() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from siren_spark.session import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name="bench_queries",
                      shuffle_partitions=int(CPUS))
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    print(json.dumps(out))


def _phase_gen() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from siren_spark.session import get_spark
    from siren_spark.testing.benchgen import gen_bench_pages

    spark = get_spark(f"local[{CPUS}]", app_name="bench_gen",
                      shuffle_partitions=64)
    pages, seeds, n_articles = gen_bench_pages(
        spark, n_index=N_INDEX, links_per_index=LINKS)
    pages.write.mode("overwrite").parquet(f"{BENCH_DATA}/pages")
    seeds.write.mode("overwrite").parquet(f"{BENCH_DATA}/seeds")
    print(json.dumps({"n_articles": n_articles, "n_index": N_INDEX}))


def _phase_crawl(master_cores: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from siren_spark.crawl import CrawlConfig, run_crawl
    from siren_spark.session import get_spark

    spark = get_spark(
        f"local[{master_cores}]", app_name="bench_crawl",
        shuffle_partitions=max(int(master_cores) * 2, 16),
        extra_conf={
            # pages are ~20KB rows; smaller splits keep every core busy
            # during the scan-side (never-shuffled) fetch+extract stage
            "spark.sql.files.maxPartitionBytes": str(24 * 1024 * 1024),
        },
    )
    pages = spark.read.parquet(f"{BENCH_DATA}/pages")
    seeds = spark.read.parquet(f"{BENCH_DATA}/seeds")
    cfg = CrawlConfig(
        budget_per_host=1_000_000_000,  # throughput mode: politeness unthrottled
        salt_buckets=max(int(master_cores), 8),
        use_bloom=True, bloom_bits=1 << 22, bloom_buckets=16,
        pages_partitions=max(int(master_cores) * 2, 16),
    )
    ckpt = tempfile.mkdtemp(prefix="siren_bench_ckpt_")
    try:
        t0 = time.time()
        res = run_crawl(spark, pages, seeds, cfg, ckpt)
        fetched = (res.counters.filter(F.col("metric") == "fetched")
                   .agg(F.sum("n")).collect()[0][0]) or 0
        extracted = res.results.count() if res.results is not None else 0
        dt = time.time() - t0
        print(json.dumps({
            "cores": int(master_cores), "sec": round(dt, 2),
            "fetched": int(fetched), "extracted": int(extracted),
            "urls": int(fetched) + int(extracted),
            "urls_per_sec": round((int(fetched) + int(extracted)) / dt, 1),
            "rounds": res.rounds,
        }))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def _sub(args: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"phase {args} failed:\n{proc.stderr[-3000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--phase":
        phase = sys.argv[2]
        if phase == "queries":
            _phase_queries()
        elif phase == "gen":
            _phase_gen()
        elif phase == "crawl":
            _phase_crawl(sys.argv[3])
        return

    queries = _sub(["--phase", "queries"])
    gen = _sub(["--phase", "gen"])
    c32 = _sub(["--phase", "crawl", "32"])
    c8 = _sub(["--phase", "crawl", "8"])
    eff = round((c8["sec"] / c32["sec"]) / 4.0, 3)
    out = {
        "metric": "headline suite seconds (8 queries at sf) + crawl scaling",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "crawl": {
            "n_index": gen["n_index"], "n_articles": gen["n_articles"],
            "urls": c32["urls"], "rounds": c32["rounds"],
            "local8_sec": c8["sec"], "local32_sec": c32["sec"],
            "local8_urls_per_sec": c8["urls_per_sec"],
            "local32_urls_per_sec": c32["urls_per_sec"],
            "scaling_efficiency_8_to_32": eff,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
