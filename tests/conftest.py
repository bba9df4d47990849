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
    # local[16] (was local[8]): the whole-registry sweeps overlap ~8
    # independent queries (guide §2.6), each planning 8-partition stages —
    # on 8 cores the pool was core-starved. Results are partition- and
    # core-count-invariant by contract (driver_replica's geometry sweep
    # pins that); shuffle_partitions stays 8 so per-query shapes are
    # unchanged.
    spark = get_spark(
        app_name="ssps-tests",
        master="local[16]",
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
