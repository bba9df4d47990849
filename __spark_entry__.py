"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``spark_state_provider_spark``; this module only
adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry

operators.load_all()

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's UserStatistics fold, batch form.

    Per-user accumulation of page-visit events — the exact computation the
    reference's end-to-end test drives through
    ``groupByKey(_.id).mapGroupsWithState(updateUserStatistics)``
    (reference RedistateTest.scala:29-31, redis/package.scala:33-45):
    ``UserStatistics(userId, visits, totalVisits)`` with the visits array
    materialized (sorted for determinism) and the running count.
    """
    from spark_state_provider_spark.tables import load_table

    events = load_table(spark, _SMOKE_SF_DIR, "events")
    return events.groupBy(F.col("user_id").alias("userId")).agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type", "value"))
        ).alias("visits"),
        F.count("*").alias("totalVisits"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops)."""
    return registry.all_oracles()
