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


#: deterministic fake video container: magic + u32 frame count +
#: fixed 64-byte frames. Stands in for a real container (mp4/webm) so
#: the frame-sampling plumbing — fan-out mapInPandas, one output row
#: per sampled frame — is real and testable without a codec library.
FAKE_VIDEO_MAGIC = b"FAKV"
_FRAME_BYTES = 64

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("frame_md5", StringType(), True),
])


def encode_fake_video(
    docs: DataFrame, n_frames_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake encoder → (id, payload): ``n_frames`` 64-byte
    frames, frame i = sha256(id:i) doubled. Real pipelines read the
    container bytes from object storage; this builder exists so tests
    and the driver query exercise byte-true decode plumbing."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for vid, n in zip(pdf["id"], pdf["n"]):
                frames = b"".join(
                    hashlib.sha256(f"{vid}:{i}".encode()).digest() * 2
                    for i in range(int(n))
                )
                payloads.append(
                    FAKE_VIDEO_MAGIC + int(n).to_bytes(4, "big") + frames
                )
            yield pd.DataFrame({"id": pdf["id"], "payload": payloads})

    src = docs.select(
        F.col(id_col).alias("id"), F.col(n_frames_col).alias("n")
    )
    return src.mapInPandas(
        _batches,
        schema=StructType([
            StructField("id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]),
    )


def sample_frames(
    payloads: DataFrame,
    every: int = 2,
    frame_ms: int = 40,
    on_error: str = "fail",
) -> DataFrame:
    """Sample every ``every``-th frame of each video payload → one row
    per sampled frame (id, frame_idx, ts_ms, frame_md5).

    Fan-out mapInPandas: output rows ≠ input rows, bytes cross to
    Python once per Arrow batch. ``on_error='skip'`` drops payloads
    with a bad magic (quarantine-at-scale behavior); 'fail' raises.
    A real deployment swaps the body for ffmpeg keyframe extraction —
    schema and batch shape stay as they are here.
    """
    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, md5s = [], [], [], []
            for vid, b in zip(pdf["id"], pdf["payload"]):
                if b is None:
                    continue
                b = bytes(b)
                if b[:4] != FAKE_VIDEO_MAGIC:
                    if on_error == "fail":
                        raise ValueError(
                            f"payload id={vid}: bad container magic"
                        )
                    continue
                n = int.from_bytes(b[4:8], "big")
                for i in range(0, n, every):
                    start = 8 + i * _FRAME_BYTES
                    frame = b[start:start + _FRAME_BYTES]
                    ids.append(vid)
                    idxs.append(i)
                    tss.append(i * frame_ms)
                    md5s.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame({
                "id": ids, "frame_idx": idxs, "ts_ms": tss,
                "frame_md5": md5s,
            })

    return payloads.mapInPandas(_batches, schema=FRAME_SAMPLE_SCHEMA)


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
