import pytest

from etl_rs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etl-rs-spark-tests", parallelism=8, shuffle_partitions=8)
    yield s
