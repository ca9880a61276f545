"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata structs; per-item compute (decode, resize, feature
extraction, frame sampling) runs in Arrow-batched ``mapInPandas`` so
bytes move JVM→Python once per batch, never per row.

The media codecs are deterministic FAKE container formats (FAKI
image, FAKV video, FAKA audio — no codec library ships in this
environment): headers, pixel/frame/sample bytes, and every transform
over them (average-pool resize, frame sampling, RMS/peak, decimation
resample) are byte-true and independently testable. A real deployment
swaps only the container parse for PIL/ffmpeg/soundfile calls — the
Arrow batching, schemas, fan-out shapes, and error quarantine stay
exactly as written.

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

from .codecs import FAKE_AUDIO_MAGIC, FAKE_IMAGE_MAGIC  # single source
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
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


#: deterministic fake image container: magic + u16 width + u16 height +
#: width*height grayscale bytes (sha256(id) digest tiled to fill the
#: grid). Like FAKE_VIDEO_MAGIC above, it stands in for jpeg/png so the
#: decode → resize → feature plumbing is byte-true and testable without
#: a codec library. The magic byte value lives in codecs.py (imported
#: at module top) so the encoder here and the sniffing decoder can
#: never drift apart.

IMAGE_FEATURE_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("out_w", LongType(), True),
    StructField("out_h", LongType(), True),
    StructField("mean_px", DoubleType(), True),
    StructField("thumb_md5", StringType(), True),
    StructField("thumbnail", BinaryType(), True),
])


def _tile_pixels(image_id: int, n: int) -> bytes:
    digest = hashlib.sha256(str(image_id).encode()).digest()
    return (digest * (n // len(digest) + 1))[:n]


def encode_fake_image(
    docs: DataFrame, width_col: str, height_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake encoder → (id, payload): a ``width``×``height``
    grayscale grid whose bytes are sha256(id) tiled. Real pipelines read
    jpeg/png bytes from object storage into the same (id, binary) shape."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for iid, w, h in zip(pdf["id"], pdf["w"], pdf["h"]):
                w, h = int(w), int(h)
                payloads.append(
                    FAKE_IMAGE_MAGIC
                    + w.to_bytes(2, "big")
                    + h.to_bytes(2, "big")
                    + _tile_pixels(int(iid), w * h)
                )
            yield pd.DataFrame({"id": pdf["id"], "payload": payloads})

    # NO parallelism repartition here (r13 opt round, tried and
    # reverted with numbers): an `ensure_min_parallelism` guard before
    # the codec UDF measured 1.39× SLOWER in the interleaved A/B at
    # sf0.1 — the added Exchange costs more than spreading this cheap
    # payload generator buys. The tokenize-family repartitions survive
    # because they MOVE an exchange that already existed; here it was
    # a new one.
    src = docs.select(
        F.col(id_col).alias("id"),
        F.col(width_col).alias("w"),
        F.col(height_col).alias("h"),
    )
    return src.mapInPandas(
        _batches,
        schema=StructType([
            StructField("id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]),
    )


def decode_image(
    payloads: DataFrame,
    max_side: int = 32,
    on_error: str = "fail",
    codecs=None,
) -> DataFrame:
    """Decode + resize + featurize image payloads → IMAGE_FEATURE_SCHEMA.

    Resize is deterministic integer average-pooling: block size
    ``s = ceil(max(w, h) / max_side)``, each output pixel the floor-mean
    of its ``s×s`` block (partial edge blocks use their true pixel
    count). Features: original dims, thumbnail dims, mean brightness,
    thumbnail md5 + bytes.

    The container parse is pluggable (operators/codecs.py): payloads
    are sniffed by magic and dispatched to the first codec that claims
    them — the FAKI fake format, real binary PGM, and (when the
    library is importable) PIL jpeg/png all flow through the same
    Arrow batching, pooling, and output schema. ``on_error='skip'``
    quarantines payloads no codec claims or that fail to parse instead
    of failing the stage (at 100 TB corrupt items are a certainty, not
    an edge case).
    """
    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")
    if max_side < 1:
        raise ValueError("max_side must be >= 1")
    from .codecs import image_codecs

    codec_list = list(codecs) if codecs is not None else image_codecs()

    # hoist per-payload costs out of the hot loop: plain (sniff,
    # decode) function pairs, no generator/dataclass lookups per item
    # (measured ~µs/payload — real money at millions of rows/task)
    dispatch = [(c.sniff, c.decode) for c in codec_list]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {k.name: [] for k in IMAGE_FEATURE_SCHEMA.fields}
            for iid, b in zip(pdf["id"], pdf["payload"]):
                if b is None:
                    continue
                b = bytes(b)
                try:
                    img = None
                    for sniff, decode in dispatch:
                        if sniff(b):
                            img = decode(b)
                            break
                    if img is None:
                        raise ValueError("bad image container")
                except (ValueError, OSError) as e:
                    if on_error == "fail":
                        raise ValueError(
                            f"payload id={iid}: bad image container ({e})"
                        ) from e
                    continue
                h, w = img.shape
                s = max(1, -(-max(w, h) // max_side))
                r_idx = np.arange(0, h, s)
                c_idx = np.arange(0, w, s)
                sums = np.add.reduceat(
                    np.add.reduceat(img.astype(np.int64), r_idx, axis=0),
                    c_idx,
                    axis=1,
                )
                r_cnt = np.diff(np.append(r_idx, h))
                c_cnt = np.diff(np.append(c_idx, w))
                thumb = (sums // np.outer(r_cnt, c_cnt)).astype(np.uint8)
                tb = thumb.tobytes()
                rows["id"].append(int(iid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_w"].append(int(thumb.shape[1]))
                rows["out_h"].append(int(thumb.shape[0]))
                rows["mean_px"].append(float(img.mean()))
                rows["thumb_md5"].append(hashlib.md5(tb).hexdigest())
                rows["thumbnail"].append(tb)
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(_batches, schema=IMAGE_FEATURE_SCHEMA)


AHASH_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("simhash", LongType(), True),
])


def image_ahash(
    payloads: DataFrame,
    on_error: str = "fail",
    codecs=None,
) -> DataFrame:
    """Perceptual AVERAGE-HASH per image payload → ``(id, simhash)``
    — the 64-bit image near-dup key (aHash: 8×8 average-pooled
    thumbnail, one bit per pixel vs the thumbnail mean). The output
    column is deliberately named ``simhash``: it plugs straight into
    `dedup.simhash_candidate_pairs`' 16-bit-chunk pigeonhole join, so
    image near-dup pairs at Hamming ≤ 3 come from the SAME machinery
    text SimHash uses — the LAION-style image dedup path (exact
    re-encodes hash identically; global brightness/contrast shifts
    are invariant by construction, since every bit compares a pixel
    to the same thumbnail's own mean).

    FLAT-IMAGE DEGENERACY: the mean-threshold bit has no information
    when the thumbnail has no variance — for a uniform image no pixel
    strictly exceeds its own mean, every bit is 0, and an all-black
    and an all-white image would read as Hamming-0 duplicates. Such
    payloads get ``simhash = NULL`` (id still emitted) so callers can
    pre-filter flat images before the candidate join instead of
    clustering every solid-color asset together; near-flat images
    (any variance at all) hash normally.

    Decode goes through the pluggable codec tier (`codecs.py` —
    FAKI / PGM / feature-flagged PIL) with `decode_image`'s
    ``on_error`` quarantine contract. Pooling: images ≥ 8 px per side
    average-pool over an 8-bucket partition of each axis
    (integer-exact reduceat); smaller sides fall back to
    nearest-neighbor sampling (an upsampled mean would invent
    precision). One Arrow-batched map, zero shuffles."""
    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")
    from .codecs import image_codecs

    codec_list = list(codecs) if codecs is not None else image_codecs()
    dispatch = [(c.sniff, c.decode) for c in codec_list]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, sigs = [], []
            for iid, b in zip(pdf["id"], pdf["payload"]):
                if b is None:
                    continue
                b = bytes(b)
                try:
                    img = None
                    for sniff, decode in dispatch:
                        if sniff(b):
                            img = decode(b)
                            break
                    if img is None:
                        raise ValueError("bad image container")
                except (ValueError, OSError) as e:
                    if on_error == "fail":
                        raise ValueError(
                            f"payload id={iid}: bad image container "
                            f"({e})"
                        ) from e
                    continue
                h, w = img.shape

                def _axis(n: int) -> "np.ndarray":
                    return (np.arange(8) * n) // 8

                if h >= 8 and w >= 8:
                    r_idx, c_idx = _axis(h), _axis(w)
                    sums = np.add.reduceat(
                        np.add.reduceat(
                            img.astype(np.int64), r_idx, axis=0
                        ),
                        c_idx,
                        axis=1,
                    )
                    r_cnt = np.diff(np.append(r_idx, h))
                    c_cnt = np.diff(np.append(c_idx, w))
                    thumb = sums / np.outer(r_cnt, c_cnt)
                else:
                    thumb = img[_axis(h)][:, _axis(w)].astype(
                        np.float64
                    )
                ids.append(int(iid))
                if thumb.max() == thumb.min():
                    # zero-variance thumbnail: every bit would be 0
                    # (flat-image degeneracy, see docstring)
                    sigs.append(None)
                    continue
                bits = (thumb > thumb.mean()).flatten()
                v = int.from_bytes(np.packbits(bits).tobytes(), "big")
                sigs.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame(
                {"id": ids, "simhash": pd.array(sigs, dtype="Int64")}
            )

    return payloads.mapInPandas(_batches, schema=AHASH_SCHEMA)


#: deterministic fake audio container: magic + u32 sample rate + u32
#: sample count + s16le samples (sha256(id) tiled). The audio sibling
#: of FAKI/FAKV — stands in for wav/flac so decode → feature →
#: resample plumbing is byte-true without an audio library. Magic
#: value shared from codecs.py (see FAKE_IMAGE_MAGIC note above).

AUDIO_FEATURE_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("sample_rate", LongType(), True),
    StructField("n_samples", LongType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("n_resampled", LongType(), True),
    StructField("rms", DoubleType(), True),
    StructField("peak", LongType(), True),
])


def encode_fake_audio(
    docs: DataFrame,
    rate_col: str,
    n_samples_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fake encoder → (id, payload): ``n_samples`` s16le
    samples at ``rate`` Hz, bytes = sha256(id) tiled."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for iid, rate, n in zip(pdf["id"], pdf["rate"], pdf["n"]):
                rate, n = int(rate), int(n)
                payloads.append(
                    FAKE_AUDIO_MAGIC
                    + rate.to_bytes(4, "big")
                    + n.to_bytes(4, "big")
                    + _tile_pixels(int(iid), 2 * n)
                )
            yield pd.DataFrame({"id": pdf["id"], "payload": payloads})

    # no parallelism repartition — tried and reverted, 2.04× slower in
    # the interleaved A/B at sf0.1 (see `encode_fake_image`): the new
    # Exchange outweighs spreading this cheap payload generator
    src = docs.select(
        F.col(id_col).alias("id"),
        F.col(rate_col).alias("rate"),
        F.col(n_samples_col).alias("n"),
    )
    return src.mapInPandas(
        _batches,
        schema=StructType([
            StructField("id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]),
    )


def decode_audio_features(
    payloads: DataFrame,
    target_rate: int = 8000,
    on_error: str = "fail",
    codecs=None,
) -> DataFrame:
    """Decode + featurize + decimation-resample audio payloads →
    AUDIO_FEATURE_SCHEMA.

    Features: duration, RMS amplitude, absolute peak (the
    loudness/clipping screens an audio-corpus pipeline gates on), and
    the post-resample sample count for an integer decimation to
    ``target_rate`` (factor ``max(1, rate // target_rate)`` — a real
    deployment swaps the stride slice for a polyphase filter; batch
    shape and schema stay put). The container parse is pluggable
    (operators/codecs.py): FAKA, real PCM WAV via the stdlib ``wave``
    module, and (when importable) soundfile formats dispatch by magic
    through identical batching. ``on_error='skip'`` quarantines
    unclaimed magics / truncated sample buffers.
    """
    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")
    from .codecs import audio_codecs

    codec_list = list(codecs) if codecs is not None else audio_codecs()

    dispatch = [(c.sniff, c.decode) for c in codec_list]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {k.name: [] for k in AUDIO_FEATURE_SCHEMA.fields}
            for iid, b in zip(pdf["id"], pdf["payload"]):
                if b is None:
                    continue
                b = bytes(b)
                try:
                    decoded = None
                    for sniff, decode in dispatch:
                        if sniff(b):
                            decoded = decode(b)
                            break
                    if decoded is None:
                        raise ValueError("bad audio container")
                    rate, samples = decoded
                except (ValueError, OSError, EOFError) as e:
                    if on_error == "fail":
                        raise ValueError(
                            f"payload id={iid}: bad audio container ({e})"
                        ) from e
                    continue
                n = len(samples)
                x = samples.astype(np.float64)
                k = max(1, rate // int(target_rate))
                rows["id"].append(int(iid))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(n * 1000 // rate)
                rows["n_resampled"].append(-(-n // k) if n else 0)
                rows["rms"].append(
                    float(np.sqrt(np.mean(x * x))) if n else 0.0
                )
                rows["peak"].append(int(np.abs(x).max()) if n else 0)
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(_batches, schema=AUDIO_FEATURE_SCHEMA)
