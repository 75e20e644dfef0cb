import os

import pytest

from codex_africanus_spark.session import get_spark

# Override to rehearse the suite at another scale factor, e.g. the
# driver's correctness scale: SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("codex-africanus-spark-tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
