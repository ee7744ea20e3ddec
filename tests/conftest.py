import os

import pytest

from kafkastreamsinteractivequeries_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("ksiq-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
