from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"

# The plan-audit pins (tests/test_plans.py, tests/test_round8.py) need
# sf0.01: the executed-plan window detectors threshold at >=1000
# runtime input rows, and sf0.001's fact tables are below it, so the
# detector would vacuously pass at the smaller SF.
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lakeflow-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf01_dir():
    import os

    if not os.path.isdir(SF01_DIR):
        pytest.skip(f"{SF01_DIR} not present on this machine")
    return SF01_DIR
