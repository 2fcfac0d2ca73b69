"""Profile one bench crawl run with per-phase timing.

Usage: python tools/profile_crawl.py [cores]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from siren_spark.crawl import CrawlConfig, run_crawl
from siren_spark.session import get_spark

BENCH_DATA = os.environ.get("SIREN_BENCH_DATA", "/tmp/siren_bench_web")


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "8"
    spark = get_spark(
        f"local[{cores}]", app_name="profile_crawl",
        shuffle_partitions=max(int(cores) * 2, 16),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(3 * 1024 * 1024),
        },
    )
    pages = spark.read.parquet(f"{BENCH_DATA}/pages")
    seeds = spark.read.parquet(f"{BENCH_DATA}/seeds")
    cfg = CrawlConfig(
        budget_per_host=1_000_000_000,
        salt_buckets=max(int(cores), 8),
        use_bloom=True, bloom_bits=1 << 22, bloom_buckets=16,
        pages_partitions=None,
        verbose=True,
    )
    ckpt = tempfile.mkdtemp(prefix="siren_profile_ckpt_")
    try:
        from siren_spark.functions.udfs import canonicalize_udf
        spark.range(0, int(cores) * 4, 1, int(cores) * 4) \
            .select(canonicalize_udf(F.concat(F.lit("https://w.example/"),
                                              F.col("id").cast("string")))) \
            .write.format("noop").mode("overwrite").save()
        t0 = time.time()
        res = run_crawl(spark, pages, seeds, cfg, ckpt)
        print(f"TOTAL {time.time()-t0:.1f}s rounds={res.rounds} "
              f"round_secs={[round(s,1) for s in res.round_secs]}")
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    main()
