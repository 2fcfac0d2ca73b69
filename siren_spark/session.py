"""SparkSession builder with the engine's recommended configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    *,
    app_name: str = "siren_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for the crawl engine.

    AQE on (runtime coalescing + skew-join splitting), Arrow on (every
    Python crossing is Arrow-batched), shuffle partitions sized to cores
    locally — on a cluster leave it to AQE + explicit repartitioning.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 8000-row Arrow batches: the doc-text Python passes (minhash/
        # simhash/tf) lose ~15% of their wall to per-batch crossings at
        # 2000 rows (measured best-of-4: minhash 1.22->1.04 s, tfidf
        # 1.39->1.07 s at the 50k-doc corpus); wide rows (crawl html,
        # ~20 KB each) are bounded by maxBytesPerBatch instead, so the
        # extract task's in-flight batch stays ~32 MB regardless
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8000")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "32m")
        # zstd for every parquet the engine writes (checkpoint round
        # tables, results, compactions): on repetitive web text it is
        # ~11x smaller than snappy (248 MB vs 2.7 GB for the 2.4M-page
        # bench web), and — measured on this host — turns the html scan
        # from memory-bandwidth/kernel-bound (2->8 efficiency 0.64)
        # into CPU-bound (≥1.0) at 2x the 8-core speed. At 100 TB the
        # footprint alone decides this.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # compression LEVEL 1 (parquet default 3): round tables are
        # write-once-read-once checkpoint state, and at level 1 the
        # staged-extraction + derived writes run ~2 s/round faster at
        # local[8] (bench web, measured round minima 18.6 -> 13-17 s)
        # for a ~10-20% size give-back on ephemeral files. Override
        # with SIREN_PARQUET_ZSTD_LEVEL (e.g. 3+ on storage-bound
        # clusters where long-lived corpus footprint dominates).
        .config("spark.hadoop.parquet.compression.codec.zstd.level",
                os.environ.get("SIREN_PARQUET_ZSTD_LEVEL", "1"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


__all__ = ["get_spark"]
