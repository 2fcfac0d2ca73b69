import pytest

from siren_spark.session import get_spark
from siren_spark.testing.frames import pages_df, seeds_df  # noqa: F401 (re-export)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[4]", app_name="siren_spark_tests",
                  shuffle_partitions=8)
    yield s
    s.stop()
