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

Crash-retry: a re-run under the SAME ``sync_token`` is replay-safe at
every step — the delete replays no-op via ``folded_deletes``, the
append via ``folded`` (or its same-token overwrite), and a crash
INSIDE the append's job commit (part files landed, no ``_SUCCESS``)
is healed by discarding the sync's OWN torn ``<token>-add`` batch
dirs before the compaction: without that, the compaction's
torn-commit refusal would fire on debris the retry itself is about
to rewrite, wedging the sync behind a manual cleanup. Foreign torn
batches (someone else's crashed ingest) still refuse loudly — only
dirs under this sync's token are ours to discard.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHANGED = ("removed", "changed")
_ADDED = ("added", "changed")


def _diff_sets(
    old: DataFrame, new: DataFrame, id_col: str, compare_cols: list[str]
) -> tuple[DataFrame, dict]:
    """(worklist, counts) — the snapshot diff's non-unchanged rows
    plus per-status counts (one bounded 4-row collect for the
    caller's job log)."""
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


def _discard_torn_own_append(
    spark, data_root: str, sides: tuple[str, ...], batch_token: str
) -> bool:
    """Remove THIS sync's append batch dirs when they hold data files
    without a ``_SUCCESS`` marker — the crash-inside-job-commit
    debris a same-token retry is about to rewrite anyway. Complete
    dirs (marker present) are left alone: the compaction folds them
    and the append replay no-ops via ``folded``. Returns whether
    anything was discarded."""
    import posixpath as _pp

    from ..sources.fs import delete_path, path_exists

    discarded = False
    for side in sides:
        bdir = _pp.join(data_root, side, f"batch={batch_token}")
        if path_exists(spark, _pp.join(bdir, "_SUCCESS")):
            continue
        if path_exists(spark, bdir):
            # torn (data, no marker) or empty — either way ours to
            # rewrite; removing it keeps the compaction's refusal
            # reserved for foreign crashes
            delete_path(spark, bdir)
            discarded = True
    return discarded


def _run_sync(
    old: DataFrame,
    new: DataFrame,
    path: str,
    id_col: str,
    compare_cols: list[str],
    sync_token: str | None,
    delete_fn: Callable,
    compact_fn: Callable,
    append_fn: Callable,
    data_root_fn: Callable,
    sides: tuple[str, ...],
) -> dict:
    """The ONE delete→compact→append driver behind all three sync
    fronts (BM25 / IVF / MinHash) — token construction, worklist
    plumbing, crash-retry healing and report bookkeeping live here so
    the families cannot drift."""
    import uuid as _uuid

    token = sync_token if sync_token is not None else _uuid.uuid4().hex
    diff, report = _diff_sets(old, new, id_col, compare_cols)
    spark = new.sparkSession
    dels = diff.filter(F.col("status").isin(*_CHANGED)).select(id_col)
    report["deleted"] = report["compacted"] = False
    if report["n_removed"] + report["n_changed"] > 0:
        delete_fn(dels, path, delete_token=f"{token}-del")
        report["deleted"] = True
        # a prior run of THIS sync may have crashed inside its
        # append's job commit — discard that torn debris (ours to
        # rewrite) so the compaction's torn-commit refusal stays
        # reserved for FOREIGN crashes
        _discard_torn_own_append(
            spark, data_root_fn(spark), sides, f"{token}-add"
        )
        # REQUIRED between delete and re-append (the RE-ADD contract)
        report["compacted"] = compact_fn(spark, path)
    adds = new.join(
        diff.filter(F.col("status").isin(*_ADDED)).select(id_col),
        id_col,
        "left_semi",
    )
    report["appended"] = report["n_added"] + report["n_changed"] > 0
    if report["appended"]:
        append_fn(adds, path, batch_token=f"{token}-add")
    return report


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
    is replay-safe end to end, including a crash inside the append's
    job commit (module docstring). Returns the diff counts + which
    steps ran."""
    from .text import (
        _resolve_bm25_index,
        append_bm25_index,
        compact_bm25_index,
        delete_from_bm25_index,
    )

    return _run_sync(
        old_docs,
        new_docs,
        path,
        id_col,
        [text_col],
        sync_token,
        delete_fn=delete_from_bm25_index,
        compact_fn=compact_bm25_index,
        append_fn=lambda df, p, batch_token: append_bm25_index(
            df, p, batch_token=batch_token, text_col=text_col
        ),
        data_root_fn=lambda spark: _resolve_bm25_index(spark, path)[1],
        sides=("postings", "meta", "forward"),
    )


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
        _resolve_ivf_index,
        append_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
    )

    return _run_sync(
        old_vectors,
        new_vectors,
        path,
        id_col,
        [vec_col],
        sync_token,
        delete_fn=delete_from_ivf_index,
        compact_fn=compact_ivf_index,
        append_fn=lambda df, p, batch_token: append_ivf_index(
            df, p, batch_token=batch_token
        ),
        data_root_fn=lambda spark: _resolve_ivf_index(spark, path)[1],
        sides=("cells",),
    )


def sync_minhash_index_to_snapshot(
    old_docs: DataFrame,
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sync_token: str | None = None,
) -> dict:
    """The MinHash-dedup twin of `sync_bm25_index_to_snapshot`,
    completing snapshot sync across all three persisted indexes:
    delete (removed ∪ changed) → compact → append (added ∪ changed)
    under the STORED banding contract (k / n_hashes / n_bands come
    from the manifest — `append_minhash_index` re-shingles only the
    worklist rows). Post-sync, `dedup_against_index` probes are
    value-identical to a `write_minhash_index(new_docs)` fresh build:
    banding is deterministic per (text, params), so unchanged docs
    keep bit-identical band rows and shingle sets, and the compaction
    drops the deleted ids from BOTH probe surfaces (bands and sets).
    Without this operator the release tick that syncs the retrieval
    indexes would leave the dedup index drifting until a manual
    rebuild — a changed doc would keep claiming new-batch rows as
    near-duplicates of its STALE text. Same crash-retry contract as
    the other two fronts (module docstring); write-order note: a
    crash between the append's sets and bands writes leaves the batch
    merely unindexed, never verifying against missing sets."""
    from .dedup import (
        _resolve_minhash_index,
        append_minhash_index,
        compact_minhash_index,
        delete_from_minhash_index,
    )

    return _run_sync(
        old_docs,
        new_docs,
        path,
        id_col,
        [text_col],
        sync_token,
        delete_fn=delete_from_minhash_index,
        compact_fn=compact_minhash_index,
        append_fn=lambda df, p, batch_token: append_minhash_index(
            df,
            p,
            batch_token=batch_token,
            text_col=text_col,
            id_col=id_col,
        ),
        data_root_fn=lambda spark: _resolve_minhash_index(spark, path)[
            1
        ],
        sides=("sets", "bands"),
    )
