from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from torchfusion_spark.session import session

    spark = session(app_name="torchfusion_tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from torchfusion_spark.engine import Engine

    return Engine(spark)


@pytest.fixture(scope="session")
def tables(spark):
    from torchfusion_spark.sources import load_tables

    load_tables(spark, SF_DIR)
    return SF_DIR
