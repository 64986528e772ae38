import pytest

from hadoop_logfile_inputformat_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="hlis-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
