from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from f1_realtime_data_pipeline_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias fixture for property tests (hypothesis manages examples;
    the session-scoped SparkSession is reused across them)."""
    return spark
