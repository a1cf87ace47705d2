import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small for test speed


@pytest.fixture(scope="session")
def spark():
    from laradb_spark.session import get_spark

    s = get_spark("laradb-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
