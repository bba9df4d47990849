"""Lineage truncation for iterative driver-loop operators (BFS, CC, …).

Iterative algorithms (q110 BFS, q28e large-star/small-star CC) must cut
lineage each round or round N replays rounds 1..N-1 on any recompute and
the plan grows without bound. Two truncation strategies:

* ``localCheckpoint`` (default): partitions go to executor block storage.
  Fast (no DFS write), but NON-RECOMPUTABLE — an executor loss mid-job
  kills the query. The right default for local[...] and for short bounded
  loops where a rare restart is acceptable.
* reliable ``checkpoint``: partitions go to the configured checkpoint
  directory (HDFS/S3 at cluster scale), surviving executor loss. Opt in
  with env ``SSPS_RELIABLE_CHECKPOINT=1`` or Spark conf
  ``spark.ssps.reliableCheckpoint=true``; the checkpoint dir falls back to
  a process-scoped tmp dir when the cluster has not set one (local mode).

Both are exposed through :func:`truncate` so every iterative operator
shares one switch. Pass ``eager=False`` and follow with a ``count()`` to
fold the materialization and the loop's convergence/emptiness scalar into
ONE Spark job per round (the q110 lesson: eager checkpoint + isEmpty +
re-checkpoint was three jobs per round of pure launch latency).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

_CONF = "spark.ssps.reliableCheckpoint"
_ENV = "SSPS_RELIABLE_CHECKPOINT"


def _cleanup_fallback_dir(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


def reliable_enabled(spark) -> bool:
    if os.environ.get(_ENV, "") == "1":
        return True
    try:
        return spark.conf.get(_CONF, "false").lower() == "true"
    except Exception:
        return False


def truncate(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage via the configured checkpoint strategy."""
    spark = df.sparkSession
    if reliable_enabled(spark):
        # Reliable checkpoint RDD files are not auto-deleted unless
        # spark.cleaner.referenceTracking.cleanCheckpoints=true is set at
        # SESSION BUILD time (ContextCleaner reads SparkConf, which cannot
        # be modified at runtime) — session.get_spark sets it; sessions
        # built elsewhere get the atexit fallback-dir sweep below.
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            from spark_state_provider_spark.scratch import scratch_base

            ckpt = os.path.join(
                scratch_base(), f"ssps_ckpt_{os.getpid()}"
            )
            sc.setCheckpointDir(ckpt)
            # The process-scoped fallback dir would otherwise outlive the
            # run (ADVICE r3): remove it when the driver process exits.
            atexit.register(_cleanup_fallback_dir, ckpt)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
