"""Streaming cumulative-aggregate maintenance: a running warehouse
aggregate kept current by micro-batches.

Composes Structured Streaming's ``foreachBatch`` with
`operators.incremental.merge_additive_bucket_pruned`: each micro-batch
is pre-aggregated (map-side partials), then folded into the bucketed
cumulative layout touching only the buckets its keys hash into.

Replay safety: foreachBatch is at-least-once — after a crash between a
successful merge and the stream checkpoint's offset commit, the SAME
batch id is re-delivered. Two merge modes:

- **exactly-once (default)**: `streaming.txn.ManifestedBucketStore` —
  immutable batch directories + an atomic create-if-absent manifest as
  the single commit point carrying both the data references AND the
  batch id. No interleaving of crashes and replays can double-apply
  (crash-injection-tested in tests/test_streaming_txn.py). Reads go
  through ``ManifestedBucketStore.current_df`` (bucket-prunable).
- **plain layout** (``exactly_once=False``): the bucket-pruned merge
  writes a plain `sinks.write_key_bucketed`-style hive layout readable
  by any parquet consumer, guarded by a ``_last_batch_id`` marker
  written AFTER the merge commits. Ordinary replays are idempotent,
  but a crash BETWEEN the partition-overwrite commit and the marker
  write double-applies that one batch on restart — the documented
  price of keeping the layout plain.

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

__all__ = [
    "make_batch_merger",
    "make_txn_batch_merger",
    "stream_merge_additive",
]


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


def make_txn_batch_merger(
    cum_path: str,
    keys: list[str],
    sum_cols: list[str],
    n_buckets: int = 64,
) -> Callable[[DataFrame, int], None]:
    """Exactly-once per-micro-batch fold through the manifest store
    (see streaming.txn for the commit protocol)."""
    from .txn import ManifestedBucketStore

    store = ManifestedBucketStore(cum_path, n_buckets=n_buckets)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.merge_batch(batch_df, batch_id, keys, sum_cols)

    return _merge


def stream_merge_additive(
    stream: DataFrame,
    cum_path: str,
    keys: list[str],
    sum_cols: list[str],
    checkpoint: str,
    n_buckets: int = 64,
    available_now: bool = False,
    exactly_once: bool = True,
):
    """Maintain a cumulative additive aggregate from a streaming source.

    Returns the started StreamingQuery. Each micro-batch is reduced to
    per-key partials before the bucket-pruned merge, so the merge's
    input is at most one row per key per trigger. With ``exactly_once``
    (the default) the cumulative state is a
    `streaming.txn.ManifestedBucketStore` at ``cum_path`` — read it via
    ``ManifestedBucketStore(cum_path).current_df(spark)``; with
    ``exactly_once=False`` it is a plain bucketed parquet layout
    guarded by the replay marker (see module docstring for the exact
    guarantee each mode gives).
    """
    merger = (
        make_txn_batch_merger(cum_path, keys, sum_cols, n_buckets)
        if exactly_once
        else make_batch_merger(cum_path, keys, sum_cols, n_buckets)
    )
    writer = stream.writeStream.foreachBatch(merger).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
