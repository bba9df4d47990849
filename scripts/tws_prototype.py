"""A/B: q203's per-user streaming EWMA on `applyInPandasWithState` (the
shipping implementation) vs Spark 4's `transformWithStateInPandas` — the
round-9 verdict #5 experiment: is the ~16 ms/group framework floor of the
old API lower on the new one?

Both variants run the same 2-micro-batch replay from the same slices with
the same RocksDB store and the same per-key sequential fold; outputs are
asserted identical. min-of-N wall clock per variant, control-interleaved.

Usage: python scripts/tws_prototype.py [n_runs]
Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from spark_state_provider_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class EwmaProcessor(StatefulProcessor):
    """The exact ewma_handler fold on the transformWithState API."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("acc", "ewma double, n long")

    def handleInputRows(self, key, rows, timerValues):
        acc, n = self.state.get() if self.state.exists() else (None, 0)
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            pdf = pdf.sort_values(["ts", "event_id"])
            for x in pdf["value"].astype("float64"):
                x = float(x)
                acc = x if acc is None else acc * 0.5 + x * 0.5
            n += len(pdf)
        self.state.update((acc, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma": [acc]}
        )

    def close(self) -> None:
        pass


def tws_ewma(spark, sf_dir: str):
    from spark_state_provider_spark.operators.streaming_queries import (
        N_BATCHES,
        _streaming_session,
    )
    from spark_state_provider_spark.streaming.harness import run_upsert_table
    from spark_state_provider_spark.streaming.sources import stream_events

    with _streaming_session(spark):
        ev = stream_events(spark, sf_dir, N_BATCHES)
        out = ev.select("user_id", "ts", "event_id", "value").groupBy(
            "user_id"
        ).transformWithStateInPandas(
            EwmaProcessor(),
            outputStructType="user_id bigint, n_events bigint, ewma double",
            outputMode="Update",
            timeMode="None",
        )
        return run_upsert_table(out, ["user_id"])


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    operators.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="tws-proto", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    from spark_state_provider_spark.streaming.sources import split_events_dir

    split_events_dir(spark, SF_DIR, 2)

    ctl = registry.get("q63_tpch_q1").fn
    old = registry.get("q203_stream_ewma").fn

    def timed(fn, *a):
        t0 = time.perf_counter()
        df = fn(*a)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0, df

    # equality first (one run each)
    _, df_old = timed(old, spark, SF_DIR)
    _, df_new = timed(tws_ewma, spark, SF_DIR)
    rows_old = sorted(map(tuple, df_old.collect()))
    rows_new = sorted(map(tuple, df_new.collect()))
    assert rows_old == rows_new, (
        f"outputs differ: {len(rows_old)} vs {len(rows_new)} rows; "
        f"first diff {next((a, b) for a, b in zip(rows_old, rows_new) if a != b)}"
    )
    print(f"outputs identical: {len(rows_old)} rows")

    for label, fn in (("old applyInPandasWithState", old), ("new transformWithStateInPandas", tws_ewma)):
        cts, ts = [], []
        for _ in range(n_runs):
            c, _df = timed(ctl, spark, SF_DIR)
            cts.append(round(c, 3))
            t, _df = timed(fn, spark, SF_DIR)
            ts.append(round(t, 3))
        print(f"{label}: min {min(ts):.3f}s runs {ts} (controls {cts})")
    spark.stop()


if __name__ == "__main__":
    main()
