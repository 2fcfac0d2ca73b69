from siren_spark.streaming.drain import extract_stream  # noqa: F401
