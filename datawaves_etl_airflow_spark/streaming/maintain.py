"""Streaming cumulative-aggregate maintenance: a running warehouse
aggregate kept current by micro-batches.

Composes Structured Streaming's ``foreachBatch`` with
`operators.incremental.merge_additive_bucket_pruned`: each micro-batch
is pre-aggregated (map-side partials), then folded into the bucketed
cumulative layout touching only the buckets its keys hash into.
Exactly-once per micro-batch comes from the stream checkpoint plus the
merge's idempotence hazard being bounded to the touched buckets (a
replayed batch re-merges its rows — callers needing strict
exactly-once dedupe the stream by an event id first, e.g.
`dedup_stream`).

At 100 TB this is the shape a continuously-ingesting warehouse wants:
per-trigger cost scales with the batch's key count, never with
history; the cumulative table never rewrites untouched buckets; and
the same layout serves key-probe reads (`anti_join_bucket_pruned`)
between triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.incremental import merge_additive_bucket_pruned

__all__ = ["stream_merge_additive"]


def stream_merge_additive(
    stream: DataFrame,
    cum_path: str,
    keys: list[str],
    sum_cols: list[str],
    checkpoint: str,
    n_buckets: int = 64,
    available_now: bool = False,
):
    """Maintain a cumulative additive aggregate from a streaming source.

    Returns the started StreamingQuery. Each micro-batch is reduced to
    per-key partials before the bucket-pruned merge, so the merge's
    input is at most one row per key per trigger.
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partials = batch_df.groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in sum_cols]
        )
        merge_additive_bucket_pruned(
            cum_path, partials, keys, sum_cols, n_buckets=n_buckets
        )

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
