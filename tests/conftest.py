from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark

    # local[4, 2]: allow ONE task retry (maxFailures=2).  Plain local mode
    # fails the job on the first task failure, which makes task-retry
    # semantics untestable — the sink's exactly-once-under-retry test
    # (test_kinesis_sim.py) poisons a first write attempt and needs Spark
    # to actually re-run the task.
    s = build_spark(app_name="tests", master="local[4, 2]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import TableEngine

    return TableEngine(spark)
