from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lakeflow-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
