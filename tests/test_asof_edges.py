"""As-of join edge cases on hand-built frames, driven through the SHARED
production helper (operators/asof.asof_join — the same code q08b uses).
The testdata never exercises "no prior order" — every event postdates every
order — so these pin the semantics the oracle can't reach there."""

from __future__ import annotations

import datetime

from spark_state_provider_spark.operators.asof import asof_join


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
    out = asof_join(
        events.withColumnRenamed("user_id", "o_custkey"),
        orders,
        key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_value="o_orderkey",
        left_id="event_id",
    )
    got = {r["event_id"]: r["asof_o_orderkey"] for r in out.collect()}
    assert got == {1: 102, 2: 101, 3: None, 4: 201, 5: None}
