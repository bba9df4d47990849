"""As-of join edge cases on hand-built frames (the testdata never exercises
"no prior order" — every event postdates every order — so these pin the
semantics the oracle can't reach there)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _asof(events_df, orders_df):
    """Same tagged-union + running-last construction as q08b_asof_join."""
    left = events_df.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    right = orders_df.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        left.unionByName(right)
        .withColumn("asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .where(F.col("is_event") == 1)
        .select("event_id", F.col("k").alias("user_id"), "asof_orderkey")
    )


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_edges(spark):
    events = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-05T00:00:00")),  # after both orders → latest
            (2, 1, _ts("2024-01-02T00:00:00")),  # between → first order
            (3, 1, _ts("2023-12-31T00:00:00")),  # before ALL orders → null
            (4, 2, _ts("2024-01-01T00:00:00")),  # exactly AT the order ts → match
            (5, 3, _ts("2024-01-01T00:00:00")),  # user with no orders → null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    orders = spark.createDataFrame(
        [
            (101, 1, _ts("2024-01-01T00:00:00")),
            (102, 1, _ts("2024-01-03T00:00:00")),
            (201, 2, _ts("2024-01-01T00:00:00")),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    got = {r["event_id"]: r["asof_orderkey"] for r in _asof(events, orders).collect()}
    assert got == {1: 102, 2: 101, 3: None, 4: 201, 5: None}
