"""State-store inspection — parity with the reference's ``iterator`` /
``latestIterator`` / ``metrics`` surface.

The reference exposes committed state through provider methods
(``RocksDbStateStoreProvider.scala:228-264`` full scan, ``:642-647`` latest
version, ``:269-270`` metrics). Spark ≥ 4 exposes exactly this through the
``statestore`` / ``state-metadata`` batch readers over a checkpoint — no
custom provider needed; these helpers wrap them as the engine's public API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_state(
    spark: SparkSession,
    checkpoint_location: str,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """Iterate a query's committed state (reference ``iterator``/
    ``latestIterator``): one row per state key with its value struct.

    ``batch_id=None`` reads the latest committed version, matching
    ``latestIterator`` (RocksDbStateStoreProvider.scala:642-647); passing an
    older ``batch_id`` replays a past version — the reference's versioned
    ``getStore(version)`` re-execution semantics (``:53-55``).
    """
    reader = (
        spark.read.format("statestore")
        .option("path", checkpoint_location)
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    return reader.load()


def state_metadata(spark: SparkSession, checkpoint_location: str) -> DataFrame:
    """Operator/partition/batch metadata for every state store under a
    checkpoint (the reference's ``metrics``/version-listing analog,
    ``fetchVersions`` RocksDbStateStoreProvider.scala:584-600)."""
    return (
        spark.read.format("state-metadata").option("path", checkpoint_location).load()
    )


def state_key_count(
    spark: SparkSession, checkpoint_location: str, operator_id: int = 0
) -> int:
    """numKeys metric (reference ``metrics`` — ``ROCKS:269-270``)."""
    return read_state(spark, checkpoint_location, operator_id).count()


def read_state_changes(
    spark: SparkSession,
    checkpoint_location: str,
    start_batch_id: int,
    end_batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """Per-version state CHANGE feed: (batch_id, change_type, key, value)
    rows for every update/delete between two committed versions.

    The reader analog of the reference's versioned-delta model — each
    version namespace holds that batch's updates (RedisStateStoreProvider's
    ``$prefix:$version:`` keyspace, redis/package.scala:7;
    RocksDbStateStoreProvider.scala:53-55 re-apply semantics). Requires the
    RocksDB store with changelog checkpointing (the engine default —
    session.py), because the feed is read from the changelogs themselves.
    """
    reader = (
        spark.read.format("statestore")
        .option("path", checkpoint_location)
        .option("operatorId", operator_id)
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", start_batch_id)
    )
    if end_batch_id is not None:
        reader = reader.option("changeEndBatchId", end_batch_id)
    return reader.load()


def read_state_degraded(
    spark: SparkSession,
    checkpoint_location: str,
    operator_id: int = 0,
) -> tuple[DataFrame | None, int]:
    """Read committed state, degrading past corrupt versions — the
    reference's corruption-recovery walk (RocksDbStateStoreProvider.scala:
    381-384: try snapshot versions descending, fall back to an older one,
    then to an empty store; tested RocksDbStateStoreProviderSuite.scala:
    90-117).

    Spark's native store FAILS FAST on a corrupt/missing changelog (a
    restart raises instead of silently degrading — the safer default); this
    helper makes the reference's explicit degrade semantics available on
    top: returns ``(state_df, batch_id)`` for the newest fully-readable
    version, or ``(None, -1)`` when no version is readable (the reference's
    empty-store terminal case). Each probe is one distributed read; only a
    scalar count crosses the driver.
    """
    from pyspark.sql import functions as F

    meta = (
        state_metadata(spark, checkpoint_location)
        .where(F.col("operatorId") == operator_id)
        .agg(
            F.min("minBatchId").alias("lo"), F.max("maxBatchId").alias("hi")
        )
        .collect()[0]
    )
    if meta["hi"] is None:
        return None, -1
    for b in range(int(meta["hi"]), int(meta["lo"]) - 1, -1):
        try:
            df = read_state(spark, checkpoint_location, operator_id, batch_id=b)
            df.count()  # force every partition to replay its changelogs
            return df, b
        except Exception:
            continue
    return None, -1


def read_join_state(
    spark: SparkSession,
    checkpoint_location: str,
    join_side: str,
    operator_id: int = 0,
    batch_id: int | None = None,
) -> DataFrame:
    """Iterate the buffered state of ONE SIDE of a stream-stream join.

    The join operator keeps per-side keyed buffers (four internal stores);
    the reader's ``joinSide`` option surfaces each side's buffered rows —
    the reference's ``iterator`` applied to its most state-hungry consumer
    (a StateStore SPI join both buffers through the same provider the
    reference implements, SURVEY.md §2-C Q26).
    """
    if join_side not in ("left", "right"):
        raise ValueError(f"join_side must be 'left' or 'right', got {join_side!r}")
    reader = (
        spark.read.format("statestore")
        .option("path", checkpoint_location)
        .option("operatorId", operator_id)
        .option("joinSide", join_side)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load()
