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
    _register_once(spark, SyntheticRowsDataSource)


# ---------------------------------------------------------------------------
# Streaming variant: the same deterministic generator as a STREAMING Python
# data source (PySpark 4 SimpleDataSourceStreamReader). Offsets are plain
# dicts checkpointed by Spark; each micro-batch emits one fixed-size slice
# of the id range, so the stream is replayable and exactly-once under
# recovery — the property the reference's versioned state exists to
# support, here on the source side.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class SyntheticStreamDataSource(DataSource):
    """``spark.readStream.format("ssps_synthetic_stream")`` — options:
    ``n`` total rows, ``batch`` rows per micro-batch."""

    @classmethod
    def name(cls) -> str:
        return "ssps_synthetic_stream"

    def schema(self) -> str:
        return "id bigint, bucket int, score double"

    def simpleStreamReader(self, schema) -> "SyntheticStreamReader":
        return SyntheticStreamReader(
            n=int(self.options.get("n", 1000)),
            batch=int(self.options.get("batch", 250)),
        )


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, n: int, batch: int):
        self.n = n
        self.batch = batch

    def initialOffset(self) -> dict:
        return {"pos": 0}

    # NOTE: no latestOffset — PySpark's _SimpleStreamReaderWrapper derives
    # the latest offset from read()'s returned next-offset and never calls
    # a user latestOffset on the simple-reader API.

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.batch, self.n)
        rows = [(i, i % 10, ((i * _MULT) % 1000) / 100.0) for i in range(lo, hi)]
        # must be a list_iterator, not a generator and not a bare list: the
        # wrapper copy.copy()s + pickles it (generators support neither)
        # and next()s it for the empty-batch check (lists aren't iterators)
        return iter(rows), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: regenerate the exact slice
        return iter(
            [
                (i, i % 10, ((i * _MULT) % 1000) / 100.0)
                for i in range(start["pos"], end["pos"])
            ]
        )


def register_synthetic_stream_source(spark) -> None:
    _register_once(spark, SyntheticStreamDataSource)


# ---------------------------------------------------------------------------
# Write path of the Python DataSource SPI: a custom sink with the
# two-phase task-commit protocol (write per partition → WriterCommitMessage
# → driver-side commit/abort). The files-then-manifest dance below is the
# exactly-once recipe every distributed sink uses: task outputs land under
# unique attempt names, and only the driver's commit() makes them visible
# by writing the manifest — a straggler/retry's orphan file is simply never
# manifested.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _LineCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class LineFileDataSource(DataSource):
    """``format("ssps_linefile")``: writes each partition as one
    ``part-<uuid>.txt`` of tab-joined lines, committed via manifest."""

    @classmethod
    def name(cls) -> str:
        return "ssps_linefile"

    def writer(self, schema, overwrite: bool) -> "LineFileWriter":
        return LineFileWriter(self.options["path"])


class LineFileWriter(DataSourceWriter):
    def __init__(self, path: str):
        self.path = path

    def write(self, iterator) -> _LineCommit:
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        # unique attempt name: a retried task writes a DIFFERENT file and
        # only the committed attempt's name reaches the manifest
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.txt")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write("\t".join(str(v) for v in row) + "\n")
                n += 1
        return _LineCommit(fname, n)

    def commit(self, messages) -> None:
        import json
        import os

        manifest = {
            "files": sorted(
                os.path.basename(m.path) for m in messages if m is not None
            ),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def register_linefile_sink(spark) -> None:
    _register_once(spark, LineFileDataSource)


# ---------------------------------------------------------------------------
# Streaming half of the linefile sink: DataSourceStreamWriter. Same
# per-partition-file + manifest commit protocol, but the manifest is
# per-micro-batch (_MANIFEST-<batchId>.json), written from commit(messages,
# batchId) — Spark's streaming epoch commit. A batch replayed after failure
# rewrites the SAME manifest name (idempotent), so readers that union the
# manifests see each epoch exactly once — the standard transactional-sink
# contract (reference's Redis/Aerospike writers commit per batch the same
# way: RedisStateStoreProvider.scala:52-185).
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamWriter


class LineFileStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str):
        self.path = path

    def write(self, iterator) -> _LineCommit:
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.txt")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write("\t".join(str(v) for v in row) + "\n")
                n += 1
        return _LineCommit(fname, n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        manifest = {
            "batch_id": batchId,
            "files": sorted(
                os.path.basename(m.path) for m in messages if m is not None
            ),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(
            os.path.join(self.path, f"_MANIFEST-{batchId}.json"), "w"
        ) as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def _linefile_stream_writer(self, schema, overwrite: bool) -> LineFileStreamWriter:
    return LineFileStreamWriter(self.options["path"])


# attach the stream half to the same registered format
LineFileDataSource.streamWriter = _linefile_stream_writer

# Registration is serialized and idempotent per session: PySpark's
# ``spark.dataSource.register`` is not safe to call concurrently (the
# whole-registry test sweeps overlap independent queries per guide §2.6;
# concurrent registerPython calls intermittently left the name
# unresolvable — DATA_SOURCE_NOT_FOUND at save/start). One lock + a
# session-keyed done set makes every later call a cheap no-op, so after
# warm-up no register call can race a lookup.
import threading

_REG_LOCK = threading.Lock()
_REG_DONE: set[tuple[str, str]] = set()


def _register_once(spark, cls) -> None:
    key = (spark.sparkContext.applicationId, cls.name())
    if key in _REG_DONE:
        return
    with _REG_LOCK:
        if key in _REG_DONE:
            return
        spark.dataSource.register(cls)
        _REG_DONE.add(key)


def register_all_python_sources(spark) -> None:
    """Eagerly register every Python data source this package defines —
    call once before fanning queries out over threads (tests) or at
    session init (production), so no lazy registration can race a
    concurrent lookup."""
    for cls in (
        SyntheticRowsDataSource,
        SyntheticStreamDataSource,
        LineFileDataSource,
    ):
        _register_once(spark, cls)
