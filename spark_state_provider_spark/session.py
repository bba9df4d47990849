"""SparkSession builder helpers.

Parity with the reference's implicit session helpers:

* ``useRocksDBStateStore()``   — reference ``rocksdb/implicits.scala:34-37``
  (sets ``SQLConf.STATE_STORE_PROVIDER_CLASS`` to the RocksDB provider).
* ``useRedisDBStateStore()``   — reference ``redis/implicits.scala:10-15``.
* ``useAerospikeDBStateStore()`` — reference ``aerospike/implicits.scala:10-17``.

The rebuild pins Spark's *native* RocksDB provider (Spark ≥ 3.2) instead of a
custom JNI fork: state stays off the JVM heap (the reference's entire
motivation, its ``README.md:15``) and changelog checkpointing replaces the
reference's full-zip snapshot upload (``RocksDbStateStoreProvider.scala:435-449``)
with incremental deltas — strictly better at 100 TB state.

Redis/Aerospike have no public PySpark-side equivalent (a JVM SPI cannot be
implemented from Python); their *capability* — external, partition-parallel,
versioned KV state — is covered by the same native RocksDB store. The helper
names are kept so reference users can switch with a one-line change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from spark_state_provider_spark.scratch import scratch_base as _scratch_base

STATE_STORE_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)

# RocksDB tuning carried over from the reference's constants
# (RocksDbStateStoreProvider.scala:87-93, 676-682: 200MB x 3 write buffers,
# background compactions, compression) re-expressed as the native provider's
# public conf surface.
_ROCKSDB_TUNING = {
    "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB": "200",
    "spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber": "3",
    "spark.sql.streaming.stateStore.rocksdb.compression": "lz4",
    # Changelog checkpointing = incremental state upload (vs the reference's
    # full zip per version) — the scale-critical setting.
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    "spark.sql.streaming.stateStore.rocksdb.compactOnCommit": "false",
}


def use_rocksdb_state_store(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Configure the builder to keep streaming state in RocksDB (off-heap).

    Python analog of ``SparkSession.builder().useRocksDBStateStore()``
    (reference ``rocksdb/implicits.scala:34-37``).
    """
    builder = builder.config(STATE_STORE_PROVIDER_CONF, ROCKSDB_PROVIDER)
    for k, v in _ROCKSDB_TUNING.items():
        builder = builder.config(k, v)
    return builder


def use_hdfs_state_store(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Configure the builder to use Spark's default in-memory/HDFS state store."""
    return builder.config(STATE_STORE_PROVIDER_CONF, HDFS_PROVIDER)


def use_redis_state_store(
    builder: SparkSession.Builder,
    host: str = "localhost",
    port: int = 6379,
    prefix: str = "spark-state",
) -> SparkSession.Builder:
    """Name-parity shim for the reference's ``useRedisDBStateStore`` helper
    (``redis/implicits.scala:10-15``, defaults ``RedisStateStoreProvider.scala:163-164``).

    A Python process cannot implement Spark's JVM ``StateStoreProvider`` SPI,
    and an external per-op network hop (the reference does a Redis MULTI/GET
    round-trip per key — ``RedisStateStoreProvider.scala:105-115``) is the
    wrong design at scale anyway. We record the requested connection settings
    under the reference's conf keys for observability and pin the native
    RocksDB store, which provides the same durable, versioned KV semantics.

    The one capability that pinning loses — state OBSERVABLE from outside
    the running query, the reason to reach for Redis — is provided
    explicitly by ``streaming.state_export``: ``export_state_snapshot`` /
    ``attach_state_export`` publish a keyed, partition-parallel external
    copy of committed state that any KV loader can ingest.
    """
    builder = (
        builder.config("spark.sql.streaming.stateStore.redis.host", host)
        .config("spark.sql.streaming.stateStore.redis.port", str(port))
        .config("spark.sql.streaming.stateStore.redis.prefix", prefix)
    )
    return use_rocksdb_state_store(builder)


def use_aerospike_state_store(
    builder: SparkSession.Builder,
    host: str = "localhost",
    port: int = 3000,
    prefix: str = "spark-state",
    namespace: str = "test",
    set_name: str = "state",
) -> SparkSession.Builder:
    """Name-parity shim for ``useAerospikeDBStateStore``
    (``aerospike/implicits.scala:10-17``, defaults ``AerospikeStateStoreProvider.scala:144-146``).
    Same rationale as :func:`use_redis_state_store`.
    """
    builder = (
        builder.config("spark.sql.streaming.stateStore.aerospike.host", host)
        .config("spark.sql.streaming.stateStore.aerospike.port", str(port))
        .config("spark.sql.streaming.stateStore.aerospike.prefix", prefix)
        .config("spark.sql.streaming.stateStore.aerospike.namespace", namespace)
        .config("spark.sql.streaming.stateStore.aerospike.set", set_name)
    )
    return use_rocksdb_state_store(builder)


def ensure_active_session(spark: SparkSession) -> None:
    """Bind ``spark`` as the JVM-side ACTIVE session for the calling
    thread. The JVM active session is a thread-local; a plain Python
    worker thread (guide §2.6 job overlap) maps to a fresh JVM thread
    with no active session, and lookups that consult it — Python data
    sources above all: ``DataSource.lookupDataSource`` resolves
    ``spark.dataSource.register``-ed names through the active session's
    DataSourceManager — fail with DATA_SOURCE_NOT_FOUND even though the
    source is registered. Call once at the top of every worker thread
    that submits Spark work."""
    spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
        spark._jsparkSession
    )


def get_spark(
    app_name: str = "spark-state-provider-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession with scale-oriented defaults.

    Defaults chosen for the 100 TB design point (and safe locally):
    AQE on (runtime re-plan, skew-join splitting, partition coalescing),
    broadcast joins enabled, Arrow for any pandas exchange, UTC session
    timezone (matches the DuckDB oracle), RocksDB state store.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Reliable checkpoint() files (SSPS_RELIABLE_CHECKPOINT path in
        # checkpointing.truncate) are never deleted unless the cleaner is
        # told to; must be set at session build (ContextCleaner reads it).
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config(
            # default checkpoint ROOT: queries without an explicit
            # checkpointLocation get a subdir under the scratch base
            "spark.sql.streaming.checkpointLocation",
            _scratch_base(),
        )
    )
    # spark.local.dir (shuffle files, spill, broadcast staging, RocksDB
    # state-store working dirs) deliberately stays on the platform temp
    # disk: an A/B at sf0.1 on local[32] put the RocksDB working dirs on
    # tmpfs and REGRESSED the stateful streaming family ~2.5x (q217
    # 4.6→11.6s min-of-4) while checkpoint/sink scratch on tmpfs helped —
    # so only the latter moves (scratch.scratch_base). Cluster deployments
    # point this at provisioned local SSDs via SSPS_LOCAL_DIR.
    if os.environ.get("SSPS_LOCAL_DIR"):
        builder = builder.config(
            "spark.local.dir", os.environ["SSPS_LOCAL_DIR"]
        )
    builder = use_rocksdb_state_store(builder)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
