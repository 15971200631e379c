"""Shared fixtures: one SparkSession per test session, testdata paths."""

from __future__ import annotations

import pytest

from etl_pipeline_last_fm_spark.session import get_spark

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF001
