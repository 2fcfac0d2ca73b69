"""DataFrame builders for sitegen fixtures (shared by tests + harness)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, MapType, StringType, StructField, StructType, TimestampType,
)

PAGES_FIXTURE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

SEEDS_FIXTURE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("keyword", StringType()),
    StructField("source", StringType()),
    StructField("meta", MapType(StringType(), StringType())),
])


def pages_df(spark: SparkSession, pages: list[dict]) -> DataFrame:
    return spark.createDataFrame(pages, PAGES_FIXTURE_SCHEMA)


def seeds_df(spark: SparkSession, seeds: list[dict]) -> DataFrame:
    return spark.createDataFrame(seeds, SEEDS_FIXTURE_SCHEMA)


__all__ = ["pages_df", "seeds_df", "PAGES_FIXTURE_SCHEMA",
           "SEEDS_FIXTURE_SCHEMA"]
