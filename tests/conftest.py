from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stockanalyses_downloader_spark.session import get_session  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_session("tests", shuffle_partitions=8,
                          extra_conf={"spark.driver.memory": "4g"})
    yield session


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE
