"""Replicate the crawl's gen-1 fetch-join + extract + staged write.

Usage: python tools/profile_fetchjoin.py [cores]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from siren_spark.crawl import CrawlConfig, prepare_pages
from siren_spark.functions.udfs import extract_pages
from siren_spark.session import get_spark

BENCH_DATA = os.environ.get("SIREN_BENCH_DATA", "/tmp/siren_bench_web")


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "8"
    spark = get_spark(
        f"local[{cores}]", app_name="profile_fetchjoin",
        shuffle_partitions=max(int(cores) * 2, 16),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(3 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    pages = spark.read.parquet(f"{BENCH_DATA}/pages")
    pages_p = prepare_pages(pages, CrawlConfig())

    tmp = tempfile.mkdtemp(prefix="profile_fj_")
    try:
        # fake the gen-1 scheduled set: all article pages (non-index)
        sched = pages.filter(~F.col("url").contains("/index")) \
            .select("url", "url_canon",
                    F.create_map(F.lit("k"), F.lit("v")).alias("meta"))
        sched.write.mode("overwrite").parquet(f"{tmp}/sched")
        sched_r = spark.read.parquet(f"{tmp}/sched")
        n = sched_r.count()

        # warm python workers
        spark.range(0, int(cores) * 4, 1, int(cores) * 4) \
            .select(F.sha1(F.col("id").cast("string").cast("binary"))) \
            .write.format("noop").mode("overwrite").save()

        t0 = time.time()
        fetched = pages_p.join(F.broadcast(sched_r.select(
            "url", "url_canon", "meta")), "url_canon", "inner")
        extract_pages(fetched.select("url", "html", "meta")) \
            .write.mode("overwrite").parquet(f"{tmp}/ex")
        t_join = time.time() - t0

        # control: same rows, no join (pages filtered directly)
        t0 = time.time()
        direct = pages_p.join(
            F.broadcast(sched_r.select("url_canon")), "url_canon",
            "left_semi").select(
            F.col("page_url").alias("url"), "html",
            F.create_map(F.lit("k"), F.lit("v")).alias("meta"))
        extract_pages(direct).write.mode("overwrite").parquet(f"{tmp}/ex2")
        t_semi = time.time() - t0

        print(f"RESULT cores={cores} n_sched={n} "
              f"bcast_join+extract+write={t_join:.1f}s "
              f"semi_join+extract+write={t_semi:.1f}s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
