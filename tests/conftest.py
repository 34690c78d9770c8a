import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from flux_spark.session import get_spark

    s = get_spark("flux-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def store(spark, tmp_path):
    from flux_spark.log import LogStore

    return LogStore(spark, tmp_path / "warehouse", max_records_per_file=100_000)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
