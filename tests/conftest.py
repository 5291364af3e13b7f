from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2mapreduce_spark.session import get_spark  # noqa: E402
from i2mapreduce_spark.oracle import oracle_connect  # noqa: E402

SF_SMALL = os.environ.get("I2MR_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("I2MR_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="i2mr-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = oracle_connect(sf_dir)
    yield con
    con.close()
