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
            for e in os.scandir(split_events_dir(spark, sf_dir, 4))
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


def _corrupt_newest_changelog(ckpt: str) -> int:
    """Truncate-and-garbage the newest changelog in every partition dir of
    operator 0; returns how many files were corrupted."""
    n = 0
    state_root = os.path.join(ckpt, "state", "0")
    for part in os.scandir(state_root):
        if not part.is_dir():
            continue
        logs = sorted(
            (
                f
                for f in os.scandir(part.path)
                if f.name.endswith(".changelog")
            ),
            key=lambda f: int(f.name.split(".")[0]),
        )
        if logs:
            with open(logs[-1].path, "wb") as fh:
                fh.write(b"\x00corrupt\xff" * 3)
            n += 1
    return n


def test_corrupted_checkpoint_fails_fast_and_degrades_explicitly(
    spark, sf_dir, tmp_path
):
    """Reference parity for corruption recovery (RocksDbStateStoreProvider.
    scala:381-384, suite :90-117): the reference silently walks snapshot
    versions descending past corrupt ones. Our documented contract is the
    two-sided version: (1) the native store FAILS FAST — a restart over a
    corrupt changelog raises rather than silently double- or under-counting;
    (2) the reference's degrade walk is available EXPLICITLY via
    read_state_degraded, which lands on the newest readable older version
    (and (None, -1) = the reference's empty-store terminal case)."""
    from spark_state_provider_spark.streaming.state_reader import (
        read_state,
        read_state_degraded,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    slices = sorted(
        (
            e
            for e in os.scandir(split_events_dir(spark, sf_dir, 4))
            if e.is_dir()
        ),
        key=lambda e: e.name,
    )
    # two micro-batches (maxFilesPerTrigger=1) → state versions 1 and 2
    for e in slices[:2]:
        shutil.copytree(e.path, os.path.join(src, e.name))
    _run_phase(spark, src, ckpt, "mem_cor1")

    # capture the last fully-good version's content (batch 0 → version 1)
    v0 = {
        (r["key"]["user_id"]): r["value"][0]
        for r in read_state(spark, ckpt, batch_id=0).select("key", "value").collect()
    }
    assert _corrupt_newest_changelog(ckpt) > 0

    # (1) reading the corrupted latest version fails loudly
    import pytest

    with pytest.raises(Exception):
        read_state(spark, ckpt).count()

    # ...and so does restarting the query on top of the corruption
    for e in slices[2:]:
        shutil.copytree(e.path, os.path.join(src, e.name))
    with pytest.raises(Exception):
        _run_phase(spark, src, ckpt, "mem_cor2")

    # (2) the explicit degrade walk lands on version 1 (batch_id 0) with
    # exactly the content committed there
    df, batch_id = read_state_degraded(spark, ckpt)
    assert batch_id == 0
    got = {
        (r["key"]["user_id"]): r["value"][0]
        for r in df.select("key", "value").collect()
    }
    assert got == v0 and len(got) > 0


def test_degrade_to_empty_when_all_versions_corrupt(spark, sf_dir, tmp_path):
    """When EVERY version is unreadable the walk returns the reference's
    empty-store terminal case rather than raising."""
    from spark_state_provider_spark.streaming.state_reader import (
        read_state_degraded,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    slices = sorted(
        (
            e
            for e in os.scandir(split_events_dir(spark, sf_dir, 4))
            if e.is_dir()
        ),
        key=lambda e: e.name,
    )
    shutil.copytree(slices[0].path, os.path.join(src, slices[0].name))
    _run_phase(spark, src, ckpt, "mem_cor3")
    # corrupt the ONLY changelog of every partition
    state_root = os.path.join(ckpt, "state", "0")
    for part in os.scandir(state_root):
        if part.is_dir():
            for f in os.scandir(part.path):
                if f.name.endswith(".changelog"):
                    with open(f.path, "wb") as fh:
                        fh.write(b"\xff\x00garbage")
    df, batch_id = read_state_degraded(spark, ckpt)
    assert df is None and batch_id == -1
