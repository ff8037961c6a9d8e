import os

import pytest

TESTDATA_ROOT = "/root/testdata"
SF_SMALL = os.path.join(TESTDATA_ROOT, "sf0.001")
SF_MEDIUM = os.path.join(TESTDATA_ROOT, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from lakeflush_spark import get_spark

    s = get_spark("lakeflush-tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium_dir():
    return SF_MEDIUM
