from siren_spark.testing.sitegen import SiteSpec, build_site  # noqa: F401
