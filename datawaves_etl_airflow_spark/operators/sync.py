"""Incremental index synchronization: drive a persisted index from
one corpus snapshot to the next using `profile.snapshot_diff`'s
worklist — the composition a dataset release actually runs (monthly
crawl lands, the retrieval indexes must follow) without the rebuild
whose cost is the whole corpus.

The sequence per index is fixed by the tombstone RE-ADD contract:

1. DELETE removed ∪ changed ids (`delete_from_*_index` — O(|diff|)
   tombstone write);
2. COMPACT (`compact_*_index` — applies the tombstones physically and
   clears them; REQUIRED before step 3, because a tombstone
   suppresses its id wherever it lives, including batches folded
   after it — re-appending a changed doc under live tombstones would
   resurrect nothing);
3. APPEND added ∪ changed rows (`append_*_index` — O(|diff|) fold).

Cost is O(|snapshot| join) for the diff + O(|changed set|) for the
writes + one compaction (a full rewrite of the index files, but
never a re-tokenize / re-assign of the corpus — the same cost the
scheduled maintenance tick already pays). The result is
VALUE-IDENTICAL to a fresh build over the new snapshot: BM25 because
compaction corrects N/sum_dl exactly from the dropped rows, IVF at
any probe of the same quantizer (the stored quantizer does not adapt
— the documented append contract; schedule a true rebuild when the
embedding distribution drifts). Pinned in tests and by the
llm_bm25_sync / llm_ann_ivf_sync driver oracles, which probe a
synced index under the FRESH-BUILD query's oracle verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHANGED = ("removed", "changed")
_ADDED = ("added", "changed")


def _diff_sets(
    old: DataFrame, new: DataFrame, id_col: str, compare_cols: list[str]
) -> tuple[DataFrame, dict]:
    """(diff, counts) — the snapshot diff plus its per-status counts
    (one bounded 4-row collect, reported back to the caller's job
    log)."""
    from .profile import snapshot_diff

    diff_all = snapshot_diff(old, new, id_col=id_col, compare_cols=compare_cols)
    counts = {
        r["status"]: r["n"]
        for r in diff_all.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # checkpoint only the WORKLIST (added/removed/changed — small in
    # steady state), never the corpus-sized unchanged majority; the
    # join runs twice (counts above, worklist here), which beats
    # materializing corpus-sized rows to executor storage
    diff = diff_all.filter(
        F.col("status") != F.lit("unchanged")
    ).localCheckpoint()
    return diff, {
        "n_added": counts.get("added", 0),
        "n_removed": counts.get("removed", 0),
        "n_changed": counts.get("changed", 0),
        "n_unchanged": counts.get("unchanged", 0),
    }


def sync_bm25_index_to_snapshot(
    old_docs: DataFrame,
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sync_token: str | None = None,
) -> dict:
    """Drive a persisted BM25 index built over ``old_docs`` to match
    ``new_docs`` — delete (removed ∪ changed) → compact → append
    (added ∪ changed). Post-sync probes are value-identical to
    `write_bm25_index(new_docs)` (exact stats correction at the
    compaction). ``sync_token`` namespaces the delete/append tokens
    (``<token>-del`` / ``<token>-add``) so a re-run of the SAME sync
    is replay-safe end to end: the delete replays no-op via
    ``folded_deletes``, the append via ``folded``. Returns the diff
    counts + which steps ran."""
    from .text import (
        append_bm25_index,
        compact_bm25_index,
        delete_from_bm25_index,
    )

    import uuid as _uuid

    token = sync_token if sync_token is not None else _uuid.uuid4().hex
    diff, report = _diff_sets(old_docs, new_docs, id_col, [text_col])
    spark = new_docs.sparkSession
    dels = diff.filter(F.col("status").isin(*_CHANGED)).select(id_col)
    report["deleted"] = report["compacted"] = False
    if report["n_removed"] + report["n_changed"] > 0:
        delete_from_bm25_index(dels, path, delete_token=f"{token}-del")
        report["deleted"] = True
        # REQUIRED between delete and re-append (the RE-ADD contract)
        report["compacted"] = compact_bm25_index(spark, path)
    adds = new_docs.join(
        diff.filter(F.col("status").isin(*_ADDED)).select(id_col),
        id_col,
        "left_semi",
    )
    report["appended"] = report["n_added"] + report["n_changed"] > 0
    if report["appended"]:
        append_bm25_index(
            adds, path, batch_token=f"{token}-add", text_col=text_col
        )
    return report


def sync_ivf_index_to_snapshot(
    old_vectors: DataFrame,
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sync_token: str | None = None,
) -> dict:
    """The IVF twin of `sync_bm25_index_to_snapshot`: delete → compact
    → append against the STORED quantizer. Post-sync probes equal a
    probe of the same quantizer over the new snapshot (full probe ⇒
    exact top-k over it); the quantizer itself does not adapt —
    schedule a `write_ivf_index` rebuild when the embedding
    distribution drifts (the standing append contract). Vector change
    detection is null-safe array equality on ``vec_col``."""
    from .similarity import (
        append_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
    )

    import uuid as _uuid

    token = sync_token if sync_token is not None else _uuid.uuid4().hex
    diff, report = _diff_sets(old_vectors, new_vectors, id_col, [vec_col])
    spark = new_vectors.sparkSession
    dels = diff.filter(F.col("status").isin(*_CHANGED)).select(id_col)
    report["deleted"] = report["compacted"] = False
    if report["n_removed"] + report["n_changed"] > 0:
        delete_from_ivf_index(dels, path, delete_token=f"{token}-del")
        report["compacted"] = compact_ivf_index(spark, path)
        report["deleted"] = True
    adds = new_vectors.join(
        diff.filter(F.col("status").isin(*_ADDED)).select(id_col),
        id_col,
        "left_semi",
    )
    report["appended"] = report["n_added"] + report["n_changed"] > 0
    if report["appended"]:
        append_ivf_index(adds, path, batch_token=f"{token}-add")
    return report
