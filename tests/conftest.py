import pytest

from siren_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[4]", app_name="siren_spark_tests",
                  shuffle_partitions=8)
    yield s
    s.stop()


def pages_df(spark, pages):
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )
    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])
    return spark.createDataFrame(pages, schema)


def seeds_df(spark, seeds):
    from pyspark.sql.types import (
        MapType, StringType, StructField, StructType,
    )
    schema = StructType([
        StructField("url", StringType()),
        StructField("keyword", StringType()),
        StructField("source", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
    ])
    return spark.createDataFrame(seeds, schema)
