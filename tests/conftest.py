from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark

    # Plain local mode (maxFailures=1) ON PURPOSE: a task failure fails the
    # job immediately, so intermittent task-level bugs surface as failures
    # instead of being masked by silent retries.  The sink's exactly-once-
    # under-retry tests, which DO need Spark to re-run a poisoned task,
    # run their own local[4, 2] session in a subprocess
    # (tests/fault_retry_runner.py) rather than relaxing the whole suite.
    s = build_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import TableEngine

    return TableEngine(spark)
