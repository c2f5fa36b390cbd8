from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark

    s = build_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import TableEngine

    return TableEngine(spark)
