from siren_spark.functions.udfs import (  # noqa: F401
    canonicalize_udf,
    domain_udf,
    extract_pages,
    EXTRACT_SCHEMA,
)
