"""Profile one streaming query: per-batch durationMs breakdown from
StreamingQuery.recentProgress — where does the wall-clock go?

Usage: python scripts/stream_profile.py q181_session_timeout_state
Works by monkeypatching harness.run_to_memory/run_upsert_table to capture
progress before the query object is discarded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from spark_state_provider_spark.session import get_spark
from spark_state_provider_spark.streaming import harness

PROGRESS: list = []

_orig_start = None


def main() -> None:
    name = sys.argv[1]
    operators.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="stream-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    from spark_state_provider_spark.streaming.sources import split_events_dir

    split_events_dir(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), 2)

    # wrap awaitTermination capture: patch DataStreamWriter.start to record queries
    from pyspark.sql.streaming import DataStreamWriter

    started = []
    orig = DataStreamWriter.start

    def patched(self, *a, **k):
        q = orig(self, *a, **k)
        started.append(q)
        return q

    DataStreamWriter.start = patched

    fn = registry.get(name).fn
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for attempt in range(2):
        started.clear()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        print(f"== attempt {attempt}: wall {wall:.3f}s, {len(started)} stream(s)")
        for q in started:
            for p in q.recentProgress:
                d = p.get("durationMs", {})
                rows = p.get("numInputRows")
                so = p.get("stateOperators", [])
                st = [
                    {
                        k: s.get(k)
                        for k in (
                            "operatorName",
                            "commitTimeMs",
                            "allUpdatesTimeMs",
                            "allRemovalsTimeMs",
                            "numRowsTotal",
                            "numRowsUpdated",
                        )
                    }
                    for s in so
                ]
                print(
                    f"  batch {p.get('batchId')}: rows={rows} durationMs={json.dumps(d)}"
                )
                if st:
                    print(f"    state: {json.dumps(st)}")
    spark.stop()


if __name__ == "__main__":
    main()
