"""Pages-store interface: Iceberg when available, Parquet fallback.

The input table per BASELINE.json input_hint:
``url string, warc_ts timestamp, html binary, text string, lang string``
(+ optional precomputed ``url_canon`` — strongly recommended at ingest,
see crawl.prepare_pages).

This sandbox ships no Iceberg runtime jar (SURVEY.md §7.6), so the store
is an interface with a Parquet implementation; ``IcebergPageStore``
carries the exact configuration a cluster deployment uses and fails
loudly when the catalog is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from siren_spark.functions.udfs import canonicalize_udf

PAGES_SCHEMA = ("url string, url_canon string, warc_ts timestamp, "
                "html binary, text string, lang string")


class PageStore:
    def read(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError

    def write(self, df: DataFrame) -> None:
        raise NotImplementedError


class ParquetPageStore(PageStore):
    """Parquet-backed store. ``buckets`` emulates Iceberg's
    bucket(N, url_canon) by repartitioning on write so fetch joins can
    use the SMJ path without reshuffling the corpus."""

    def __init__(self, path: str, buckets: int | None = None):
        self.path = path
        self.buckets = buckets

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def write(self, df: DataFrame) -> None:
        if "url_canon" not in df.columns:
            df = df.withColumn("url_canon", canonicalize_udf(F.col("url")))
        if self.buckets:
            df = df.repartition(self.buckets, "url_canon")
        df.write.mode("overwrite").parquet(self.path)


class IcebergPageStore(PageStore):
    """Iceberg-backed store (cluster deployments).

    Requires the iceberg-spark-runtime jar and a catalog, e.g.::

        spark.sql.catalog.crawl = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.crawl.type = hadoop
        spark.sql.catalog.crawl.warehouse = <path>

    Table DDL (bucketed for co-located fetch joins)::

        CREATE TABLE crawl.pages (url string, url_canon string,
            warc_ts timestamp, html binary, text string, lang string)
        USING iceberg PARTITIONED BY (bucket(1024, url_canon))
    """

    def __init__(self, table: str):
        self.table = table

    def read(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.table(self.table)
        except Exception as e:  # catalog/jar absent in this sandbox
            raise RuntimeError(
                f"Iceberg table {self.table!r} unavailable — is the "
                "iceberg-spark-runtime jar on the classpath and the "
                "catalog configured? Use ParquetPageStore locally."
            ) from e

    def write(self, df: DataFrame) -> None:
        df.writeTo(self.table).createOrReplace()


__all__ = ["PageStore", "ParquetPageStore", "IcebergPageStore",
           "PAGES_SCHEMA"]
