"""Which part of the fetch join costs: meta map | broadcast build | probe.

Usage: python tools/profile_join_variants.py [cores]
"""
from __future__ import annotations

import os
import sys
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
        f"local[{cores}]", app_name="profile_jv",
        shuffle_partitions=max(int(cores) * 2, 16),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(3 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    pages = spark.read.parquet(f"{BENCH_DATA}/pages")
    pages_p = prepare_pages(pages, CrawlConfig())

    sched = pages.select(
        "url", "url_canon",
        F.create_map(F.lit("k"), F.lit("v")).alias("meta"))
    sched.write.mode("overwrite").parquet("/tmp/profile_jv_sched")
    sched_r = spark.read.parquet("/tmp/profile_jv_sched")

    spark.range(0, int(cores) * 4, 1, int(cores) * 4) \
        .select(F.sha1(F.col("id").cast("string").cast("binary"))) \
        .write.format("noop").mode("overwrite").save()

    def run(label, df):
        t0 = time.time()
        extract_pages(df).write.format("noop").mode("overwrite").save()
        print(f"  {label}: {time.time()-t0:.1f}s", flush=True)

    base = pages_p.select(F.col("page_url").alias("url"), "html") \
        .withColumn("meta", F.create_map().cast("map<string,string>"))
    join_nometa = pages_p.join(
        F.broadcast(sched_r.select("url_canon")), "url_canon", "inner") \
        .select(F.col("page_url").alias("url"), "html") \
        .withColumn("meta", F.create_map().cast("map<string,string>"))
    join_meta = pages_p.join(
        F.broadcast(sched_r), "url_canon", "inner") \
        .select("url", "html", "meta")

    for rep in range(2):
        print(f"pass {rep}:", flush=True)
        run("base          ", base)
        run("join_nometa   ", join_nometa)
        run("join_meta     ", join_meta)


if __name__ == "__main__":
    main()
