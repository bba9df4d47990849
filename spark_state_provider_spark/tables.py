"""Testdata table loading.

Tables (TPC-H-ish star schema + events/documents/embeddings, see
``TESTDATA.md`` / ``FIXTURES.md``) are one parquet file each under an
``sf*`` directory. Loading is a plain ``spark.read.parquet`` — declarative,
so Catalyst keeps predicate pushdown / column pruning / partition pruning
on the scan. Never collect here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Timestamp semantics (date_trunc, window, collected values) must match
    # the DuckDB oracle regardless of the caller's session defaults.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # AQE on for any caller session (runtime re-plan + post-shuffle
    # coalescing; a plain session's static 200 shuffle partitions would
    # drag every small-scale run)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects. Read nanos as long and truncate to microseconds —
        # bit-identical to DuckDB's ns→µs truncation at read time.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            # Integer DIV, not `/`: double division loses precision on
            # nanosecond epochs (~1.7e18 > 2^53).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register each table as a temp view so ``spark.sql`` queries work."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
