"""Streaming ingest over the export layout.

The reference is strictly daily batch — idempotent day re-runs stand in
for late data (SURVEY.md §2.8). The engine adds the natural streaming
extension: a file source watching the export prefix (new day files
appear → incremental processing), watermarked event-time windows for
late rows, and the same partitioned parquet sink via
``foreachBatch`` so batch and streaming share one write path.

Scale: the file source lists incrementally (maxFilesPerTrigger bounds a
micro-batch); state for windowed aggs is bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas.staging import STAGING_FORMATS, staging_schema


def read_staging_stream(
    spark: SparkSession,
    table: str,
    path_glob: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` twin of ``sources.staging.read_staging`` — same
    explicit schema, file source over the export layout."""
    schema = staging_schema(table)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    fmt = STAGING_FORMATS[table]
    if fmt == "json":
        return reader.json(path_glob)
    if fmt == "csv":
        return reader.option("header", True).csv(path_glob)
    raise ValueError(f"unsupported streaming staging format {fmt!r}")


def windowed_counts(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked window counts per key — tumbling by default, hopping
    when ``slide`` < ``window`` (each event then lands in
    window/slide overlapping windows). The late-data handling the
    reference gets from idempotent day re-runs."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window, slide or window).alias("win"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on ``key_cols`` (e.g. a content
    fingerprint) with state bounded by the watermark — duplicates
    arriving within the watermark horizon are dropped, state for older
    keys is evicted. The streaming twin of ``operators.dedup``'s exact
    path for training-data ingest; at scale, state size is
    (unique keys per horizon) × key width, independent of stream
    length."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def write_stream_partitioned(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = False,
):
    """Stream → partitioned parquet through foreachBatch, reusing the
    batch sink semantics (exactly-once per micro-batch via checkpoint).
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    writer = df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
