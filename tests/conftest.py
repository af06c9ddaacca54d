import pytest

from takco_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="takco-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.coalescePartitions.minPartitionSize": "1b"},
    )
    yield s
    s.stop()
