"""Checkpoint recovery: stop a stateful streaming query mid-stream and
restart it from the same checkpoint — state must resume, nothing double
counted. This rebuilds the reference's snapshot/recovery provider-contract
scenario (RocksDbStateStoreProviderSuite.scala:25-67) against Spark's
native RocksDB store: exactly-once across restarts is the invariant.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import functions as F

from spark_state_provider_spark.streaming.sources import stream_events
from spark_state_provider_spark.streaming.state_reader import read_state
from spark_state_provider_spark.tables import load_table


def test_stateful_query_resumes_from_checkpoint(spark, sf_dir):
    ckpt = tempfile.mkdtemp(prefix="ssps_ckpt_recovery_")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def counts_stream():
        # 4 slices so the first run has unprocessed files left when stopped
        ev = stream_events(spark, sf_dir, 4, tag="rec")
        return ev.groupBy("user_id").agg(F.count("*").alias("n"))

    # phase 1: process at least one micro-batch, then stop mid-stream
    q1 = (
        counts_stream()
        .writeStream.format("memory")
        .queryName("mem_rec1")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .option("maxFilesPerTrigger", 1)
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and len(q1.recentProgress) < 1:
            time.sleep(0.2)
        assert q1.recentProgress, "no batch completed before stop"
    finally:
        q1.stop()

    # committed state after phase 1: a partial key set / partial counts
    partial = read_state(spark, ckpt)
    assert partial.count() > 0

    # phase 2: restart from the SAME checkpoint; availableNow drains the rest
    q2 = (
        counts_stream()
        .writeStream.format("memory")
        .queryName("mem_rec2")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q2.awaitTermination(180)
    finally:
        q2.stop()

    got = {r["user_id"]: r["n"] for r in spark.table("mem_rec2").collect()}
    expect = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # exactly-once: resumed totals equal the batch truth — no loss, no dupes
    assert got == expect
