"""Run-to-completion harness for streaming queries.

``Trigger.AvailableNow`` drains every pending micro-batch then stops — the
deterministic test/verification mode. Two sinks:

* memory sink (complete/append modes) — the reference's own test sink
  (RedistateTest.scala:33-38);
* a driver-side upsert via ``foreachBatch`` for update-mode stateful
  operators, where "latest row per key" is the semantic result. In
  production the same ``foreachBatch`` body would MERGE into a table; the
  collect here is test-scale only.
"""

from __future__ import annotations

import tempfile
import threading

from pyspark.sql import DataFrame


def run_to_memory(
    sdf: DataFrame,
    name: str,
    output_mode: str,
    timeout_secs: int = 180,
) -> DataFrame:
    """Start writeStream→memory with AvailableNow, await, return the table."""
    spark = sdf.sparkSession
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ssps_ckpt_{name}_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_secs)
    finally:
        q.stop()
    if not finished:
        raise TimeoutError(
            f"streaming query {name!r} did not drain within {timeout_secs}s"
        )
    return spark.table(name)


def run_upsert_collect(
    sdf: DataFrame,
    key_cols: list[str],
    timeout_secs: int = 180,
) -> list:
    """Drain an update-mode stream, keeping the LAST row emitted per key.

    Mirrors what a MERGE-into sink does with update output; returns plain
    Rows (driver-side dict at test scale).
    """
    state: dict[tuple, object] = {}
    lock = threading.Lock()

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.collect()
        with lock:
            for r in rows:
                state[tuple(r[k] for k in key_cols)] = r

    q = (
        sdf.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ssps_ckpt_upsert_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_secs)
    finally:
        q.stop()
    if not finished:
        raise TimeoutError(
            f"streaming upsert did not drain within {timeout_secs}s"
        )
    return list(state.values())

