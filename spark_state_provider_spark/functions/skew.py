"""Skew-mitigation primitives: salting for hot keys.

At 100 TB a handful of hot grouping/join keys will stall a shuffle stage on
one reducer. Two standard remedies, both here:

* AQE skew-join splitting — enabled session-wide in ``session.get_spark``
  (``spark.sql.adaptive.skewJoin.enabled``), free for joins.
* **Salting** — explicit two-phase shapes for aggregations (and for joins
  against a replicable build side) when the skew is in a groupBy or the
  optimizer can't see it. Deterministic: the salt comes from hashing a
  secondary column, never ``rand()``, so results are replayable and
  oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: str | Column, buckets: int) -> DataFrame:
    """Add a deterministic ``_salt`` column in [0, buckets)."""
    col = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    return df.withColumn("_salt", F.pmod(F.hash(col), F.lit(buckets)))


def salted_sum_count(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    salt_from: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation for algebraic aggregates.

    Phase 1 shuffles on (key, salt) — hot keys fan out over ``buckets``
    reducers; phase 2 re-aggregates the tiny per-salt partials on key alone.
    ``agg_exprs`` maps output column -> SQL aggregate over the *input*
    (supported: SUM/COUNT, the reassociable ones).
    """
    salted = with_salt(df, salt_from, buckets)
    phase1 = salted.groupBy(key, "_salt").agg(
        *[F.expr(expr).alias(f"_p_{name}") for name, expr in agg_exprs.items()]
    )
    phase2 = phase1.groupBy(key).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in agg_exprs]
    )
    return phase2


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int,
    salt_from: str,
) -> DataFrame:
    """Equi-join a skewed fact to a replicable build side without hot
    reducers: the fact gets a deterministic salt, the build side is
    replicated ``buckets`` times, and the join key becomes (key, salt).

    ``salt_from`` is REQUIRED and must vary within a key (a row id, event
    id, …) — salting from the join key itself would put every row of a hot
    key in one bucket, replicating the build side for nothing.

    Use when broadcast is too big and AQE's split heuristic misses the skew.
    """
    left = with_salt(skewed, salt_from, buckets)
    right = small.crossJoin(
        F.broadcast(
            skewed.sparkSession.range(buckets).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    return left.join(right, [key, "_salt"]).drop("_salt")
