"""Structured Streaming extraction drain (optional surface).

The reference is batch-per-invocation (GH Actions workflow_dispatch,
SURVEY.md §2.8) and the crawl loop is iterative batch, but a continuous
ingestion deployment wants newly-landed pages extracted as they arrive.
``extract_stream`` wires the same single-pass kernel dispatch into a
Structured Streaming pipeline over the pages directory:

    readStream(parquet) -> extract_pages -> records -> writeStream

``Trigger.AvailableNow`` drains everything present then stops (the
streaming analog of one crawl round); omit it for continuous mode.
Exactly-once lands on the sink via the streaming checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from siren_spark.functions.udfs import extract_pages
from siren_spark.sources.pages import PAGES_SCHEMA


def extract_stream(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming extract; returns the StreamingQuery."""
    reader = (spark.readStream.schema(PAGES_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(pages_dir)

    inp = pages.select(
        "url", "html",
        F.create_map(F.lit("keyword"), F.lit("")).alias("meta"),
    )
    records: DataFrame = (
        extract_pages(inp)
        .filter(F.col("kind") == "record")
        # url_canon/domain are link-row-only columns (null on records)
        .drop("kind", "meta", "url_canon", "domain")
    )
    writer = (records.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = ["extract_stream"]
