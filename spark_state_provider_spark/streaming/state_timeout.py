"""State-timeout (TTL) configuration surface — parity with the reference's
``stateTimeout`` writer helper and per-query expiry conf.

Reference semantics being mirrored (rocksdb/implicits.scala:42-71,
RocksDbStateStoreProvider.scala:57-80, 686-692, 725-756; README.md:38-108):

* conf key    ``spark.sql.streaming.stateStore.stateExpirySecs[.queryName]``
* strict flag ``spark.sql.streaming.stateStore.strictExpire``
* specials    ``-1`` = keep state forever (default), ``0`` = stateless
  (puts instantly invisible); any negative value coerces to ``-1``
  (implicits.scala:66)
* per-query resolution: the provider looks up
  ``stateExpirySecs.<queryName>`` then falls back to the unsuffixed key,
  else ``-1`` (RocksDbStateStoreProvider.scala:725-729); unnamed queries
  resolve under ``UNNAMED_QUERY`` (``:692``)
* the writer helper forces queryName + checkpointLocation onto the writer
  and records the per-query TTL in the session RuntimeConfig
  (implicits.scala:66-70)

The reference read the writer's private ``extraOptions`` by reflection
(implicits.scala:73-79) because Scala's writer hides them; PySpark's writer
also hides options, so precedence here is **explicit args > RuntimeConfig >
defaults** — no reflection, public API only (documented deviation).
"""

from __future__ import annotations

from pyspark.sql.conf import RuntimeConfig
from pyspark.sql.streaming import DataStreamWriter

STATE_EXPIRY_SECS = "spark.sql.streaming.stateStore.stateExpirySecs"
STRICT_EXPIRE = "spark.sql.streaming.stateStore.strictExpire"
CHECKPOINT_LOCATION = "spark.sql.streaming.checkpointLocation"
UNNAMED_QUERY = "UNNAMED_QUERY"

#: -1 → state never expires (reference DEFAULT_STATE_EXPIRY_SECS :688)
NO_TTL = -1
#: 0 → stateless: every put is instantly invisible (README.md:107-108)
STATELESS = 0


def coerce_expiry(expiry_secs: int | str | None) -> int:
    """Parse + clamp an expiry value the way the reference does.

    Any negative (or unparseable) value means "no TTL" → -1
    (implicits.scala:66, provider parsing RocksDbStateStoreProvider.scala:744-756).
    """
    if expiry_secs is None:
        return NO_TTL
    try:
        v = int(str(expiry_secs).strip())
    except ValueError:
        return NO_TTL
    return v if v >= 0 else NO_TTL


def get_expiration_by_query(conf: RuntimeConfig, query_name: str | None) -> int:
    """Resolve the TTL for a query: per-query key > global key > -1."""
    name = query_name or UNNAMED_QUERY
    per_query = conf.get(f"{STATE_EXPIRY_SECS}.{name}", None)
    if per_query is not None:
        return coerce_expiry(per_query)
    return coerce_expiry(conf.get(STATE_EXPIRY_SECS, None))


def is_strict(conf: RuntimeConfig) -> bool:
    return str(conf.get(STRICT_EXPIRE, "false")).lower() == "true"


def state_timeout(
    writer: DataStreamWriter,
    conf: RuntimeConfig,
    query_name: str | None = None,
    expiry_secs: int | None = None,
    checkpoint_location: str | None = None,
) -> DataStreamWriter:
    """Python analog of ``writer.stateTimeout(conf, queryName, expirySecs,
    checkpointLocation)`` (implicits.scala:42-71).

    Resolves query name and checkpoint location (args > RuntimeConfig),
    stores the per-query TTL under ``stateExpirySecs.<name>``, and returns
    the writer with queryName + checkpointLocation applied.
    """
    name = query_name or conf.get("spark.sql.streaming.queryName", None) or UNNAMED_QUERY
    ckpt = checkpoint_location or conf.get(CHECKPOINT_LOCATION, None)
    if ckpt is None:
        raise ValueError(
            "checkpointLocation must be given as an argument or set via "
            f"'{CHECKPOINT_LOCATION}' (reference implicits.scala:58-64 raises "
            "IllegalArgumentException here too)"
        )
    conf.set(f"{STATE_EXPIRY_SECS}.{name}", str(coerce_expiry(expiry_secs)))
    return writer.queryName(name).option("checkpointLocation", ckpt)
