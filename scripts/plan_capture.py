"""Capture .explain("formatted") output for headline queries into plans/r09/.

Usage:
    python scripts/plan_capture.py before q110_bfs_distances q63c_tpch_q9 ...
    python scripts/plan_capture.py after q110_bfs_distances ...

Writes plans/r09/<name>_<tag>.txt. Streaming queries (whose result frame is
a drained sink read, not the streaming plan) are captured too — the batch
plan of the returned frame is still what the bench's noop sink executes for
the final read, and the per-batch streaming plan is what tests pin — but
the primary use is batch queries.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from spark_state_provider_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09"
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), tag
    os.makedirs(OUT_DIR, exist_ok=True)
    operators.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="plan-capture", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = registry.get(name).fn
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
