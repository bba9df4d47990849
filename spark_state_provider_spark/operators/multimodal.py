"""Multimodal (binary) column operators — LLM-pipeline plumbing.

Images / audio / video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, partition-parallel ``mapInPandas``, Arrow
batch shape, metadata extraction — is real and tested; the actual media
*decode* is stubbed (``NotImplementedError`` behind ``strict=True``, a
deterministic fake otherwise) because no image/audio libraries ship in this
container. Swapping the fake for PIL/ffmpeg changes ONE function; every
plan stays identical.

The demo payloads are the documents' UTF-8 bytes (a deterministic stand-in
blob per row), which keeps the whole pipeline DuckDB-oracle-checkable:
the fake "decode" derives metadata purely from byte length and a byte
checksum, both computable in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_state_provider_spark.operators.registry import register
from spark_state_provider_spark.tables import load_table

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, checksum bigint, width int, height int, "
    "format string"
)


def decode_image_bytes(payload: bytes, strict: bool = False) -> dict:
    """Decode an image payload → (width, height, format).

    STUB: real decoding needs an image library not present in this
    container. ``strict=True`` raises (production wiring point); otherwise a
    deterministic fake derived from the bytes themselves stands in so the
    distributed plumbing is fully exercisable.
    """
    if strict:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not available in this "
            "container; wire the real decoder here"
        )
    n = len(payload)
    checksum = (payload[0] if n else 0) + (payload[-1] if n else 0) + n
    return {
        "n_bytes": n,
        "checksum": checksum,
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
        "format": "fake/deterministic",
    }


def decode_metadata(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Partition-parallel metadata extraction over a binary column.

    ``mapInPandas`` with Arrow batches: each python worker receives
    record batches of (id, payload), runs the decoder, emits typed metadata.
    No shuffle, no driver collect — linear at any scale.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_bytes(p) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out[["doc_id", "n_bytes", "checksum", "width", "height", "format"]]

    return binary_df.mapInPandas(extract, schema=DECODE_SCHEMA)


@register(
    "q31_multimodal_meta",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               ascii(substr(text, 1, 1)) + ascii(substr(text, -1, 1))
                   + octet_length(encode(text)) AS checksum
        FROM documents
    )
    SELECT doc_id, n_bytes, checksum,
           CAST(n_bytes % 640 + 1 AS INTEGER) AS width,
           CAST((n_bytes * 7) % 480 + 1 AS INTEGER) AS height,
           'fake/deterministic' AS format
    FROM b
    """,
)
def q31_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas decode → typed metadata.

    The payload is the document's UTF-8 bytes; the python worker sees real
    ``bytes`` through Arrow and derives metadata from them. The oracle
    recomputes the same metadata arithmetically — so the whole binary
    round-trip (encode → Arrow batch → python → typed rows) is checked.
    (Texts here are ASCII, so first/last byte == ascii of first/last char.)
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_metadata(d)


@register(
    "q31b_multimodal_partitioned",
    oracle="""
    SELECT source,
           count(*) AS n_assets,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           max(octet_length(encode(text))) AS max_bytes
    FROM documents
    GROUP BY source
    """,
)
def q31b_multimodal_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset-store layout stats: bytes per source partition — the query a
    100 TB media pipeline runs before choosing partition/bucket sizing."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.encode("text", "UTF-8").alias("payload")
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
    )


def decode_metadata_arrow(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-native variant of ``decode_metadata``: ``mapInArrow`` hands the
    worker raw ``pyarrow.RecordBatch``es — no pandas materialization, so
    binary payloads are zero-copy until the decoder touches them. The API
    to prefer when the decode step streams large blobs (video/audio) and
    per-batch pandas conversion would double peak memory.
    """
    import pyarrow as pa

    arrow_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_bytes", pa.int64()),
            ("checksum", pa.int64()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("format", pa.string()),
        ]
    )

    def extract(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_pylist()
            payloads = batch.column(
                batch.schema.get_field_index("payload")
            ).to_pylist()
            rows = [
                {"doc_id": i, **decode_image_bytes(p)}
                for i, p in zip(ids, payloads)
            ]
            yield pa.RecordBatch.from_pylist(rows, schema=arrow_schema)

    return binary_df.mapInArrow(extract, schema=DECODE_SCHEMA)


@register(
    "q31c_multimodal_arrow",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               ascii(substr(text, 1, 1)) + ascii(substr(text, -1, 1))
                   + octet_length(encode(text)) AS checksum
        FROM documents
    )
    SELECT doc_id, n_bytes, checksum,
           CAST(n_bytes % 640 + 1 AS INTEGER) AS width,
           CAST((n_bytes * 7) % 480 + 1 AS INTEGER) AS height,
           'fake/deterministic' AS format
    FROM b
    """,
)
def q31c_multimodal_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same decode pipeline as q31 through the ``mapInArrow`` API (zero-copy
    Arrow batches, no pandas intermediary) — byte-identical output, checked
    by the same oracle."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_metadata_arrow(d)


# ---------------------------------------------------------------------------
# q31d — frame sampling: the video-ish op. The payload is treated as a
# frame stream (fixed-size chunks); every STRIDE-th frame is sampled and
# per-frame metadata emitted — a ROW-EXPANDING mapInPandas (1 blob row →
# k frame rows), which is the plumbing shape a real video pipeline needs
# (ffmpeg keyframe sampling swaps in at the decode point).
# ---------------------------------------------------------------------------

FRAME_BYTES = 64
FRAME_STRIDE = 2

_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, off bigint, fr_bytes bigint, "
    "fr_checksum bigint"
)


def sample_frames(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Sample every {FRAME_STRIDE}-th fixed-size frame from each payload."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n = len(payload)
                n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
                for idx in range(0, n_frames, FRAME_STRIDE):
                    off = idx * FRAME_BYTES
                    chunk = payload[off : off + FRAME_BYTES]
                    rows.append(
                        (
                            doc_id,
                            idx,
                            off,
                            len(chunk),
                            chunk[0] + chunk[-1] + len(chunk),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "off", "fr_bytes", "fr_checksum"],
            )

    return binary_df.mapInPandas(extract, schema=_FRAME_SCHEMA)


@register(
    "q31d_frame_sample",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    ),
    f AS (
        SELECT doc_id, text, n,
               unnest(generate_series(
                   0, CAST(floor((n - 1) / {FRAME_BYTES}) AS INTEGER),
                   {FRAME_STRIDE}
               )) AS frame_idx
        FROM b
    )
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * {FRAME_BYTES} AS BIGINT) AS off,
           CAST(least({FRAME_BYTES}, n - frame_idx * {FRAME_BYTES}) AS BIGINT)
               AS fr_bytes,
           CAST(ascii(substr(text, frame_idx * {FRAME_BYTES} + 1, 1))
                + ascii(substr(text,
                        frame_idx * {FRAME_BYTES}
                        + least({FRAME_BYTES}, n - frame_idx * {FRAME_BYTES}), 1))
                + least({FRAME_BYTES}, n - frame_idx * {FRAME_BYTES}) AS BIGINT)
               AS fr_checksum
    FROM f
    """,
)
def q31d_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (every {FRAME_STRIDE}-th
    {FRAME_BYTES}-byte frame), emitting per-frame metadata.

    Scale shape: pure row-expanding narrow map over Arrow batches — no
    shuffle, no driver involvement; output row count is bounded by
    payload_bytes/{FRAME_BYTES}/{FRAME_STRIDE} per input row. The oracle
    recomputes every sampled frame's offset/length/checksum arithmetically
    (ASCII payloads ⇒ byte == ascii(char)), checking the full explode.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return sample_frames(d)
