import os

import pytest

SF_SMOKE = os.environ.get("JOBX_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from jobx_spark.session import get_spark

    s = get_spark("jobx_spark_tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
