"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_state_provider_spark.session import get_spark

SF_DIR = os.environ.get("SSPS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="ssps-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.execution.pyspark.udf.faulthandler.enabled": "true",
            "spark.driver.memory": "4g",
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
