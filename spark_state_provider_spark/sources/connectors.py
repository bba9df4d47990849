"""Streaming source builders — the connector matrix behind the engine.

All connectors are thin declarative builders over ``spark.readStream``;
schemas are always explicit (inference is a correctness and performance
hazard on a 100 TB drop directory). The deterministic test source lives in
``streaming/sources.py`` (file replay); these cover the production surface:

* file drop directories (parquet/csv/json) — cloud-storage ingestion
* rate / rate-micro-batch — load generators
* kafka — gated: the connector jar ships separately
  (``spark-sql-kafka-0-10``); the builder raises a clear error if absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_files(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: str,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """File-drop source (parquet/csv/json) with explicit schema."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def stream_rate(
    spark: SparkSession, rows_per_second: int = 1000, num_partitions: int | None = None
) -> DataFrame:
    """Rate source: (timestamp, value) rows — the built-in load generator."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    return reader.load()


def stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    **options: str,
) -> DataFrame:
    """Kafka source (value as binary; pair with ``from_json``/``decode``).

    Requires the ``spark-sql-kafka-0-10`` connector package on the
    classpath; raises a clear error if it is missing rather than failing
    deep inside query planning.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # surface the missing-package case crisply
        if "kafka" in str(e).lower() and "find" in str(e).lower():
            raise ImportError(
                "Kafka source needs the spark-sql-kafka-0-10 package "
                "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>)"
            ) from e
        raise
