import pytest

from codex_africanus_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("codex-africanus-spark-tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
