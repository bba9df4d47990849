"""As-of join — generic tagged-union construction.

For each left row, find the most recent right row with the same key and
``right_ts <= left_ts``. ONE shuffle (union both sides, window per key,
running ``last(..., ignorenulls)``), linear at any scale — never a per-key
cross product. Ties at equal timestamps resolve to "right row matches"
(right sorts before left), i.e. ``<=`` semantics like DuckDB's ASOF JOIN.

The caller must ensure at most one right row per (key, ts) — deduplicate
first (as q08b does with max(o_orderkey)) or the pick is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    left_id: str,
) -> DataFrame:
    """Returns (left_id, key, asof_<right_value>) for every left row."""
    l_ = left.select(
        F.col(key).alias("k"),
        F.col(left_ts).alias("t"),
        F.lit(1).alias("is_left"),
        F.col(left_id),
        F.lit(None).cast("long").alias(right_value),
    )
    r_ = right.select(
        F.col(key).alias("k"),
        F.col(right_ts).alias("t"),
        F.lit(0).alias("is_left"),
        F.lit(None).cast("long").alias(left_id),
        F.col(right_value),
    )
    # right rows sort before left at equal timestamps (is_left asc) => "<="
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_.unionByName(r_)
        .withColumn(
            f"asof_{right_value}", F.last(right_value, ignorenulls=True).over(w)
        )
        .where(F.col("is_left") == 1)
        .select(left_id, F.col("k").alias(key), f"asof_{right_value}")
    )
