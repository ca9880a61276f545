"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata structs; per-item compute (decode, resize, feature
extraction, frame sampling) runs in Arrow-batched ``mapInPandas`` so
bytes move JVM→Python once per batch, never per row.

The actual media decoding is STUBBED — the image/audio libraries are
not in this container — behind ``decode_image``, which raises
``NotImplementedError``; ``extract_binary_meta`` exercises the real
Spark-side plumbing (schema, batching, binary transfer) with
deterministic byte-level features instead.

Scale: payload partitions should target ~128 MiB of binary per task
(``maxPartitionBytes``); metadata-only transforms never touch payload
bytes thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata schema carried alongside every payload column
BINARY_META_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("content_md5", StringType(), True),
    StructField("header_hex", StringType(), True),
])


def attach_binary_payload(
    docs: DataFrame, source_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stand-in payload builder: utf-8 bytes of a text column as the
    opaque ``binary`` payload (real pipelines read image/audio bytes
    from object storage the same shape)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).cast("binary").alias("payload"),
    )


def extract_binary_meta(payloads: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over (id, payload).

    Computes byte length, md5, and an 8-byte header signature per item
    — the deterministic stand-in for a media probe (real deployments
    swap the body for PIL/ffmpeg calls; the Spark plumbing — schema,
    batch shape, binary transfer — is identical).
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({
                "id": pdf["id"],
                "n_bytes": [
                    len(b) if b is not None else None for b in pdf["payload"]
                ],
                "content_md5": [
                    hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    for b in pdf["payload"]
                ],
                "header_hex": [
                    bytes(b)[:8].hex() if b is not None else None
                    for b in pdf["payload"]
                ],
            })
            yield out

    return payloads.mapInPandas(_batches, schema=BINARY_META_SCHEMA)


IMAGE_FEATURE_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("thumbnail", BinaryType(), True),
])


def decode_image(payloads: DataFrame, max_side: int = 256) -> DataFrame:
    """Decode + resize image payloads → (id, width, height, thumbnail).

    STUB: the container has no image codec library. The Spark contract
    (input/output schema, mapInPandas batch shape) is final; the body
    raises until a codec (PIL/opencv) is installed.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decoding requires an image codec library not present "
            "in this environment; plug PIL/opencv into this mapInPandas body"
        )
        yield  # pragma: no cover - keeps this a generator

    return payloads.mapInPandas(_batches, schema=IMAGE_FEATURE_SCHEMA)
