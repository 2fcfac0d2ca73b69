"""Executable Iceberg integration path (SURVEY.md §7.6).

This sandbox ships no iceberg-spark-runtime jar, so the test is
skip-marked; on a cluster (or any env with the jar on the classpath /
ICEBERG_JAR set) it runs the IcebergPageStore end-to-end: bucketed table
DDL -> write -> read -> one full crawl round against the Iceberg-backed
pages store. The point is that the cluster path has executable evidence,
not just config comments in sources/pages.py.
"""

import glob
import os

import pytest


def _iceberg_jar() -> str | None:
    if os.environ.get("ICEBERG_JAR"):
        return os.environ["ICEBERG_JAR"]
    try:
        from pyspark import find_spark_home
        spark_home = find_spark_home._find_spark_home()
    except Exception:
        return None
    jars = glob.glob(os.path.join(spark_home, "jars",
                                  "iceberg-spark-runtime*.jar"))
    return jars[0] if jars else None


requires_iceberg = pytest.mark.skipif(
    _iceberg_jar() is None,
    reason="iceberg-spark-runtime jar absent (sandbox has no Iceberg; "
           "set ICEBERG_JAR or install into $SPARK_HOME/jars to run)")


@requires_iceberg
def test_iceberg_page_store_end_to_end(tmp_path):
    """Write the sitegen pages through IcebergPageStore (bucketed on
    url_canon, the co-located fetch-join layout), read them back, and
    run a two-round crawl against the Iceberg-backed store."""
    from pyspark.sql import SparkSession

    from siren_spark.crawl import CrawlConfig, run_crawl
    from siren_spark.sources.pages import IcebergPageStore
    from siren_spark.testing.frames import pages_df, seeds_df
    from siren_spark.testing.sitegen import (
        SiteSpec, WINDOW_END, WINDOW_START, build_site,
    )

    # dedicated session: the catalog must be configured before start
    spark = (SparkSession.builder.master("local[2]")
             .appName("siren_spark_iceberg_e2e")
             .config("spark.sql.catalog.crawl",
                     "org.apache.iceberg.spark.SparkCatalog")
             .config("spark.sql.catalog.crawl.type", "hadoop")
             .config("spark.sql.catalog.crawl.warehouse",
                     str(tmp_path / "warehouse"))
             .config("spark.sql.shuffle.partitions", "4")
             .getOrCreate())
    try:
        site = build_site(SiteSpec(mirror_seed_range=(10, 12)))
        spark.sql("""
            CREATE TABLE crawl.db.pages (
                url string, url_canon string, warc_ts timestamp,
                html binary, text string, lang string)
            USING iceberg PARTITIONED BY (bucket(8, url_canon))
        """)
        store = IcebergPageStore("crawl.db.pages")
        from pyspark.sql import functions as F

        from siren_spark.functions.udfs import canonicalize_udf
        src = pages_df(spark, site.pages).withColumn(
            "url_canon", canonicalize_udf(F.col("url")))
        src.select("url", "url_canon", "warc_ts", "html", "text", "lang") \
            .writeTo("crawl.db.pages").append()

        pages = store.read(spark)
        assert pages.count() == len(site.pages)

        cfg = CrawlConfig(budget_per_host=10, window_start=WINDOW_START,
                          window_end=WINDOW_END, keywords=site.spec.keywords
                          if hasattr(site, "spec") else ["crisis", "rescue"],
                          use_bloom=False, max_rounds=2)
        res = run_crawl(spark, pages, seeds_df(spark, site.seeds), cfg,
                        str(tmp_path / "ck"))
        assert res.results is not None and res.results.count() > 0
    finally:
        spark.stop()
