"""Shared pytest fixtures: one tuned local SparkSession per test run."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))  # fixtures_golden
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))  # repo root

TESTDATA = "/root/testdata"
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECT = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from feat_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="feat_spark-tests")
    yield s
    s.stop()
