"""Structured Streaming surface: file-source staging ingest, watermarked
windowed aggregation, and stateful per-key accumulation."""

from .ingest import (  # noqa: F401
    dedup_stream,
    read_staging_stream,
    windowed_counts,
    write_stream_partitioned,
)
from .maintain import stream_merge_additive  # noqa: F401
from .stateful import running_totals  # noqa: F401
from .txn import ManifestedBucketStore  # noqa: F401
