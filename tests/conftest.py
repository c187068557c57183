from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL
