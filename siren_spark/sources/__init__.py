from siren_spark.sources.csv_export import reference_csv_bytes, result_filename  # noqa: F401
from siren_spark.sources.pages import PageStore, ParquetPageStore  # noqa: F401
