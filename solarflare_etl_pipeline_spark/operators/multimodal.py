"""Multimodal columns: opaque binary payloads + typed metadata.

Driver-mandate surface (SURVEY.md §2.2 adjunct): treat image/audio/video
as ``binary`` columns with typed metadata; decode / feature-extract run
as Arrow-batched ``mapInPandas`` over the binary column.  The container
has no image/audio libraries, so the *decode* step is a clearly-marked
deterministic stub (``decode_image_stub``) — the Spark-side plumbing
(schema, batch shape, partitioning) is real and oracle-checked where
the arithmetic is exact.

Scale notes: binary payloads stay opaque until the last possible
operator (no JVM→Python crossing except inside the single mapInPandas
stage); metadata predicates (size, mime) are plain columns, so
filtering happens before any decode at parquet-scan level.  Batches
arrive as Arrow record batches — per-batch vectorized work, no per-row
Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.registry import register


def _with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: documents.text encoded to a binary column stands
    in for an image/audio payload (no binary table in the fixtures)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


@register(
    "mm_binary_meta",
    oracle="""
        SELECT doc_id,
               OCTET_LENGTH(ENCODE(text)) AS n_bytes,
               'application/octet-stream' AS mime,
               SHA256(text) AS payload_sha
        FROM documents
    """,
    doc="Typed metadata over an opaque binary column: byte length + content hash — "
    "computed without decoding, so pushable before any Python stage.",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary_payload(spark, sf_dir)
    return b.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        "mime",
        F.sha2("payload", 256).alias("payload_sha"),
    )


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decode — the container ships no image/audio codecs.

    Returns deterministic fake (width, height, n_frames) derived from
    payload length so tests are stable.  A real deployment replaces
    this body with e.g. PIL/libav decoding; the mapInPandas plumbing
    around it is unchanged.
    """
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 16 + 1)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = pdf["payload"].map(decode_image_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": decoded.map(lambda t: t[0]).astype("int32"),
                "height": decoded.map(lambda t: t[1]).astype("int32"),
                "n_frames": decoded.map(lambda t: t[2]).astype("int32"),
            }
        )


@register(
    "mm_decode_features",
    oracle="""
        SELECT doc_id,
               OCTET_LENGTH(ENCODE(text)) AS n_bytes,
               CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS INT) AS width,
               CAST(OCTET_LENGTH(ENCODE(text)) % 480 + 1 AS INT) AS height,
               CAST(OCTET_LENGTH(ENCODE(text)) % 16 + 1 AS INT) AS n_frames
        FROM documents
    """,
    doc="mapInPandas decode stage over binary payloads (Arrow-batched, one Python "
    "crossing). Decode itself is a marked stub (no codecs in container); the oracle "
    "mirrors the stub's deterministic arithmetic, validating the full plumbing.",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary_payload(spark, sf_dir)
    return b.mapInPandas(_decode_batches, DECODE_SCHEMA)


@register(
    "mm_frame_sample",
    oracle="""
        SELECT doc_id, frame_idx
        FROM (
            SELECT doc_id,
                   UNNEST(RANGE(0, CAST(OCTET_LENGTH(ENCODE(text)) % 16 + 1 AS INT), 4)) AS frame_idx
            FROM documents
        )
    """,
    doc="Frame sampling: explode every 4th frame index per payload (video→frames shape; "
    "indices from the stub's deterministic frame count).",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary_payload(spark, sf_dir)
    n_frames = F.length("payload") % 16 + 1
    return b.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(4))).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))
