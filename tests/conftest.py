import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")

from polars_grouper_spark.session import get_spark  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "scale: large synthetic-graph tests (minutes); run with "
        "SPARK_GRAFT_SCALE=1 python -m pytest -m scale tests/test_scale.py",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("polars-grouper-spark-tests")
    yield s
