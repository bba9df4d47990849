"""``transformWithStateInPandas`` processors (Spark 4 StatefulProcessor API).

This is the closest native analog of the reference's TTL design:

* ``ttlDurationMs`` on the value state = the reference's **non-strict** mode
  (store-level lazy expiry, clocked from the last write — RocksDB ``TtlDB``,
  RocksDbStateStoreProvider.scala:107);
* processing-time **timers** (``registerTimer`` + ``handleExpiredTimer``) =
  the reference's "timeout is not eventual" claim (README.md:46-52): state
  eviction fires on clock progress, independent of the key receiving data —
  the piece ``applyInPandasWithState``'s GroupStateTimeout cannot express.

The fold itself is the same UserStatistics accumulation as
``stateful.py`` (reference redis/package.scala:33-45).
"""

from __future__ import annotations

from collections.abc import Iterator
from importlib.util import find_spec

import pandas as pd

#: transformWithStateInPandas speaks protobuf to the JVM state server;
#: protobuf is not guaranteed in every runtime, so callers gate on this.
try:
    HAS_TWS_DEPS = find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    HAS_TWS_DEPS = False
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from spark_state_provider_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    _ZERO,
    _emit,
    _fold,
)

STATE_SCHEMA_TWS = (
    "total bigint, first_id bigint, last_id bigint, types string, "
    "first_ts_us bigint, last_ts_us bigint"
)


def _pack(st: tuple) -> tuple:
    # ValueState rows are flat; the types set travels as a '|'-joined string
    total, first_id, last_id, types, first_us, last_us = st
    return (total, first_id, last_id, "|".join(types), first_us, last_us)


def _unpack(row) -> tuple:
    total, first_id, last_id, types, first_us, last_us = row
    return (
        total,
        first_id,
        last_id,
        types.split("|") if types else [],
        first_us,
        last_us,
    )


class UserStatsProcessor(StatefulProcessor):
    """Per-user UserStatistics fold with optional native state TTL and
    optional timer-based eviction.

    ``ttl_ms``     — store-level lazy TTL (reference non-strict mode).
    ``evict_timers`` — register a processing-time timer per key on every
    update; when it fires (clock passes the deadline, whether or not the key
    sees data) the state is dropped — reference strict/progress-independent
    expiry. The fired eviction emits a tombstone row (total_visits = -1) so
    tests can observe firing deterministically.
    """

    def __init__(self, ttl_ms: int | None = None, evict_after_ms: int | None = None):
        self.ttl_ms = ttl_ms
        self.evict_after_ms = evict_after_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState(
            "user_stats", STATE_SCHEMA_TWS, ttlDurationMs=self.ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        st = _unpack(self.state.get()) if self.state.exists() else _ZERO
        for pdf in rows:
            if len(pdf):
                st = _fold(st, pdf)
        self.state.update(_pack(st))
        if self.evict_after_ms is not None:
            self.handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + self.evict_after_ms
            )
        yield _emit(key[0], st)

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        self.state.clear()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "total_visits": [-1],  # tombstone marking a timer eviction
                "first_event_id": [None],
                "last_event_id": [None],
                "n_event_types": [0],
                "first_ts_us": [None],
                "last_ts_us": [None],
            }
        )

    def close(self) -> None:
        pass


def user_statistics_transform(
    events: DataFrame,
    ttl_ms: int | None = None,
    evict_after_ms: int | None = None,
) -> DataFrame:
    """UserStatistics via transformWithStateInPandas (update mode)."""
    out = events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStatsProcessor(ttl_ms, evict_after_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime"
        if (evict_after_ms is not None or ttl_ms is not None)
        else "None",
    )
    return out.select(
        "user_id",
        "total_visits",
        "first_event_id",
        "last_event_id",
        "n_event_types",
        F.timestamp_micros(F.col("first_ts_us")).alias("first_ts"),
        F.timestamp_micros(F.col("last_ts_us")).alias("last_ts"),
    )
