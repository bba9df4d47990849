"""Checkpoint recovery: run a stateful query over HALF the input, then
restart from the same checkpoint after the rest of the files appear —
state must resume and nothing double-counts. This rebuilds the reference's
snapshot/recovery provider-contract scenario
(RocksDbStateStoreProviderSuite.scala:25-67) against Spark's native RocksDB
store, deterministically: both phases are drained AvailableNow runs, so
there is no stop-mid-flight race.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from spark_state_provider_spark.streaming.sources import split_events_dir
from spark_state_provider_spark.streaming.state_reader import read_state
from spark_state_provider_spark.tables import load_table


def _run_phase(spark, src_dir, ckpt, name):
    ev = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    q = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()


def test_stateful_query_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    slices = sorted(
        (
            e
            for e in os.scandir(split_events_dir(spark, sf_dir, 4, tag="rec4"))
            if e.is_dir()
        ),
        key=lambda e: e.name,
    )
    assert len(slices) == 4

    # phase 1: only the first two slices exist → partial state committed
    for e in slices[:2]:
        shutil.copytree(e.path, os.path.join(src, e.name))
    _run_phase(spark, src, ckpt, "mem_rec1")
    phase1 = {r["user_id"]: r["n"] for r in spark.table("mem_rec1").collect()}
    assert read_state(spark, ckpt).count() == len(phase1) > 0

    # phase 2: the rest of the data arrives; a NEW query resumes from the
    # same checkpoint and must fold it onto the recovered state
    for e in slices[2:]:
        shutil.copytree(e.path, os.path.join(src, e.name))
    _run_phase(spark, src, ckpt, "mem_rec2")

    got = {r["user_id"]: r["n"] for r in spark.table("mem_rec2").collect()}
    expect = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # exactly-once across the restart: no loss, no dupes
    assert got == expect
    # and phase 1 was genuinely partial (the restart actually added data)
    assert any(phase1.get(u, 0) < n for u, n in expect.items())
