from __future__ import annotations

import pytest

from aggregation_duckdb_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[8]",
                      extra_confs={"spark.sql.shuffle.partitions": "8",
                                   "spark.ui.enabled": "false"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration test")
