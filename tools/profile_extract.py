"""Decompose fetch+extract throughput: scan | scan+extract | +write.

Usage: python tools/profile_extract.py [cores]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from siren_spark.functions.udfs import extract_pages
from siren_spark.session import get_spark

BENCH_DATA = os.environ.get("SIREN_BENCH_DATA", "/tmp/siren_bench_web")


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "8"
    spark = get_spark(
        f"local[{cores}]", app_name="profile_extract",
        shuffle_partitions=max(int(cores) * 2, 16),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(3 * 1024 * 1024),
        },
    )
    pages = spark.read.parquet(f"{BENCH_DATA}/pages")
    n = pages.count()

    # warm python workers
    spark.range(0, int(cores) * 4, 1, int(cores) * 4) \
        .select(F.sha1(F.col("id").cast("string").cast("binary"))) \
        .write.format("noop").mode("overwrite").save()

    sel = pages.select("url", "html").withColumn(
        "meta", F.create_map().cast("map<string,string>"))

    t0 = time.time()
    sel.write.format("noop").mode("overwrite").save()
    t_scan = time.time() - t0

    t0 = time.time()
    extract_pages(sel).write.format("noop").mode("overwrite").save()
    t_ext = time.time() - t0

    out = tempfile.mkdtemp(prefix="profile_extract_")
    try:
        t0 = time.time()
        extract_pages(sel).write.mode("overwrite").parquet(f"{out}/x")
        t_extw = time.time() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)

    print(f"RESULT cores={cores} n={n} scan={t_scan:.1f}s "
          f"scan+extract={t_ext:.1f}s scan+extract+write={t_extw:.1f}s "
          f"pages/s(extract)={n/t_ext:.0f}")


if __name__ == "__main__":
    main()
