"""Custom Python DataSource (PySpark 4 `pyspark.sql.datasource` API).

The extensibility surface a user reaches for when an input system has no
built-in Spark connector — the Python analog of the reference's pattern of
plugging a custom backend into a Spark SPI (its StateStoreProvider is
instantiated by reflection from a conf name, RocksDbStateStoreProvider.scala:322-333;
a Python DataSource is instantiated by name after
``spark.dataSource.register``).

The demo source generates a deterministic partitioned dataset: planner-side
``partitions()`` splits the id range, each executor-side ``read(partition)``
yields only its slice — reads scale linearly with partitions and never
funnel through the driver.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Knuth multiplicative hash constant — a deterministic "score" both engines
# can recompute exactly in int64.
_MULT = 2654435761


class SyntheticRowsDataSource(DataSource):
    """``spark.read.format("ssps_synthetic").option("n", ...).option("parts", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "ssps_synthetic"

    def schema(self) -> str:
        return "id bigint, bucket int, score double"

    def reader(self, schema) -> "SyntheticRowsReader":
        return SyntheticRowsReader(
            n=int(self.options.get("n", 1000)),
            parts=int(self.options.get("parts", 4)),
        )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, n: int, parts: int):
        self.n = n
        self.parts = parts

    def partitions(self):
        step = max(1, -(-self.n // self.parts))  # ceil-div
        return [
            _Slice(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield (i, i % 10, ((i * _MULT) % 1000) / 100.0)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticRowsDataSource)
