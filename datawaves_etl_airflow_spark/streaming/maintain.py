"""Streaming cumulative-aggregate maintenance: a running warehouse
aggregate kept current by micro-batches.

Composes Structured Streaming's ``foreachBatch`` with
`operators.incremental.merge_additive_bucket_pruned`: each micro-batch
is pre-aggregated (map-side partials), then folded into the bucketed
cumulative layout touching only the buckets its keys hash into.

Replay safety: foreachBatch is at-least-once — after a crash between a
successful merge and the stream checkpoint's offset commit, the SAME
batch id is re-delivered. The merger therefore records the last
applied batch id in a ``_last_batch_id`` marker beside the layout
(written AFTER the merge commits) and skips any batch id ≤ it, making
the ordinary replay path idempotent. The residual window is a crash
BETWEEN the merge's partition-overwrite commit and the marker write:
that one batch can double-apply on restart. Closing it requires an
atomic data+marker commit — i.e. a transactional table format — which
a plain parquet layout cannot express; deployments needing strict
exactly-once should put a transactional log in front (documented
limitation, not a silent one).

At 100 TB this is the shape a continuously-ingesting warehouse wants:
per-trigger cost scales with the batch's key count, never with
history; the cumulative table never rewrites untouched buckets; and
the same layout serves key-probe reads (`anti_join_bucket_pruned`)
between triggers.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.incremental import merge_additive_bucket_pruned
from ..sources.fs import read_text, write_text

__all__ = ["make_batch_merger", "stream_merge_additive"]


def make_batch_merger(
    cum_path: str,
    keys: list[str],
    sum_cols: list[str],
    n_buckets: int = 64,
) -> Callable[[DataFrame, int], None]:
    """The per-micro-batch fold, exposed for direct testing: reduces
    the batch to per-key partials and merges them bucket-pruned,
    guarded by the ``_last_batch_id`` replay marker."""
    marker = os.path.join(cum_path, "_last_batch_id")

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        last = read_text(spark, marker)
        if last is not None:
            # defensive parse: a corrupt marker must STOP the stream
            # with a clear message, never be treated as absent —
            # absent means "apply", and applying on a corrupt marker
            # is exactly the double-apply the marker exists to prevent
            try:
                last_id = int(last.strip())
            except ValueError:
                raise ValueError(
                    f"corrupt replay marker at {marker!r}: {last!r} — "
                    f"refusing to merge (treating it as absent would "
                    f"double-apply a batch). Restore the marker to the "
                    f"last applied batch id, or use the exactly-once "
                    f"manifest store (streaming.txn) which has no "
                    f"marker to corrupt."
                ) from None
            if batch_id <= last_id:
                return  # replayed batch — already folded in
        partials = batch_df.groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in sum_cols]
        )
        merge_additive_bucket_pruned(
            cum_path, partials, keys, sum_cols, n_buckets=n_buckets
        )
        write_text(spark, marker, str(batch_id))

    return _merge


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
    input is at most one row per key per trigger; replayed batch ids
    are skipped via the layout's marker file (see module docstring for
    the exact guarantee).
    """
    writer = stream.writeStream.foreachBatch(
        make_batch_merger(cum_path, keys, sum_cols, n_buckets)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
