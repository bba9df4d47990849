"""State-export sink: the external-KV observability the reference's
Redis/Aerospike providers give implicitly (any client can read state while
and after the query runs) — here as an explicit, engine-agnostic parquet KV
copy. The export must equal the ``statestore`` reader's view exactly."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from spark_state_provider_spark.streaming.sources import split_events_dir
from spark_state_provider_spark.streaming.state_export import (
    attach_state_export,
    export_state_snapshot,
    read_exported_state,
)
from spark_state_provider_spark.streaming.state_reader import read_state


def _events_stream(spark, src_dir):
    return (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )


def _kv(df):
    # state value struct uses the internal buffer field name ("count"),
    # not the query's output alias — index positionally
    return sorted(
        (r["key"]["user_id"], r["value"][0])
        for r in df.select("key", "value").collect()
    )


def test_export_snapshot_equals_state_reader(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "export")
    os.makedirs(src)
    for e in os.scandir(split_events_dir(spark, sf_dir, 2)):
        if e.is_dir():
            shutil.copytree(e.path, os.path.join(src, e.name))

    agg = _events_stream(spark, src).groupBy("user_id").agg(
        F.count("*").alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("mem_exp1")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()

    export_state_snapshot(spark, ckpt, out)
    exported = read_exported_state(spark, out)
    assert _kv(exported) == _kv(read_state(spark, ckpt))
    assert len(_kv(exported)) > 0


def test_attach_state_export_publishes_during_run(spark, sf_dir, tmp_path):
    """The foreachBatch hook keeps an external copy fresh while the query
    runs (lagging one micro-batch), and a final snapshot publishes the
    terminal state."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "export")
    os.makedirs(src)
    for e in os.scandir(split_events_dir(spark, sf_dir, 3)):
        if e.is_dir():
            shutil.copytree(e.path, os.path.join(src, e.name))

    seen_batches: list[int] = []

    def handler(df, bid):
        seen_batches.append(bid)
        # a handler must process the whole batch (commit validation)
        df.write.format("noop").mode("overwrite").save()

    agg = _events_stream(spark, src).groupBy("user_id").agg(
        F.count("*").alias("n")
    )
    q = (
        attach_state_export(
            agg.writeStream.outputMode("update"),
            ckpt,
            out,
            batch_handler=handler,
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()

    assert seen_batches == [0, 1, 2]
    # mid-run export exists and equals the LAST-BUT-ONE committed version
    mid = _kv(read_exported_state(spark, out))
    assert mid == _kv(read_state(spark, ckpt, batch_id=1))
    # finalize: one more snapshot equals the terminal state
    export_state_snapshot(spark, ckpt, out)
    assert _kv(read_exported_state(spark, out)) == _kv(read_state(spark, ckpt))
