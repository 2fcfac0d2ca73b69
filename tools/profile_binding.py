"""Per-phase decomposition of a BINDING-budget crawl round at one core
level. Same web/config as tools/spot_politeness.py but verbose=True and
a bounded round count — names the term behind the binding-mode scaling
gap (annotate vs fetch+extract vs writes-window vs commit).

Usage: python tools/profile_binding.py <cores> [max_rounds] [mode]
  mode: both (default) | no_robots | no_budget
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from siren_spark.crawl import CrawlConfig, run_crawl  # noqa: E402
from siren_spark.session import get_spark  # noqa: E402
from tools.spot_politeness import BENCH_DATA, BUDGET, _robots_rows  # noqa: E402


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "8"
    max_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mode = sys.argv[3] if len(sys.argv) > 3 else "both"
    spark = get_spark(
        f"local[{cores}]", app_name="profile_binding",
        shuffle_partitions=max(int(cores) * 2, 16),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(3 * 1024 * 1024),
        },
    )
    pages = spark.read.parquet(f"{BENCH_DATA}/pages")
    seeds = spark.read.parquet(f"{BENCH_DATA}/seeds")
    robots = (None if mode == "no_robots" else
              spark.createDataFrame(_robots_rows(),
                                    "domain string, rules string"))
    cfg = CrawlConfig(
        budget_per_host=(1_000_000_000 if mode == "no_budget" else BUDGET),
        salt_buckets=max(int(cores), 8),
        use_bloom=True, bloom_bits=1 << 22, bloom_buckets=16,
        pages_partitions=None, max_rounds=max_rounds, verbose=True,
    )
    import shutil
    ckpt = tempfile.mkdtemp(prefix="siren_profb_ckpt_")
    try:
        pages.select(F.length("html")).write.format("noop") \
            .mode("overwrite").save()
        t0 = time.time()
        res = run_crawl(spark, pages, seeds, cfg, ckpt, robots=robots)
        print(f"TOTAL {time.time()-t0:.1f}s rounds={res.rounds} "
              f"round_secs={[round(s, 1) for s in res.round_secs]}")
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    main()
