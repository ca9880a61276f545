"""The ONE tombstone-delete core behind all three persisted-index
delete operators (`similarity.delete_from_ivf_index`,
`text.delete_from_bm25_index`, `dedup.delete_from_minhash_index`) —
token validation, the 5-attempt manifest CAS loop, the
``folded_deletes`` replay check, the idempotent tombstone batch write
and its success-marker validation live exactly once, so the three
families cannot drift (the review that motivated this extraction had
already caught one copy hand-parsing the manifest without the
family's corrupt-payload handling).

Delete tokens live in their OWN manifest list: ``folded_deletes``,
disjoint from the append tokens' ``folded``. One shared namespace
would let an append token silently swallow a later delete replay
using the same string — and the default streaming tokens collide by
construction (an add stream and a retraction stream under
``checkpoint=None`` both emit ``b0``, ``b1``, …), which would turn a
takedown into a silent permanent no-op. Compactions fold applied
tombstone tokens into ``folded_deletes``; appends never consult it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def tombstone_delete(
    ids: DataFrame,
    path: str,
    delete_token: str | None,
    op_name: str,
    resolve: Callable[..., tuple[str, str, str]],
) -> None:
    """Write ``ids`` as an idempotent ``tombstones/batch=<token>/``
    directory of the index's current version, serialized against
    compactions by the same-payload manifest version bump.

    ``resolve(spark, version, payload)`` returns ``(data_root,
    accept_col, surface_col)`` for the current version — the root to
    write under, the caller-facing id column to accept when present,
    and the on-disk tombstone column name — raising the family's
    standard error for a missing/legacy/corrupt index. ``ids`` may
    carry ``accept_col`` or be any one-column DataFrame (first column
    taken); per-batch ``.distinct()`` is applied here. Same-token
    retries overwrite their own batch dir; tokens already applied by
    a compaction (``folded_deletes``) no-op.
    """
    import posixpath as _pp
    import uuid as _uuid

    from pyspark.sql import functions as F

    from ..sources.fs import require_success_marker
    from ..sources.manifest import VersionedManifest

    token = (
        delete_token if delete_token is not None else _uuid.uuid4().hex
    )
    if "/" in token or "=" in token:
        raise ValueError(f"delete_token must be path-safe: {token!r}")
    spark = ids.sparkSession
    vm = VersionedManifest(path)
    for _attempt in range(5):
        version, payload = vm.resolve(spark)
        if token in set(
            payload.get("folded_deletes", ()) if payload else ()
        ):
            return
        data_root, accept_col, surface_col = resolve(
            spark, version, payload
        )
        tomb = (
            ids.select(F.col(accept_col).alias(surface_col))
            if accept_col in ids.columns
            else ids.select(F.col(ids.columns[0]).alias(surface_col))
        ).distinct()
        tdir = _pp.join(data_root, "tombstones", f"batch={token}")
        (
            tomb.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .parquet(tdir)
        )
        require_success_marker(spark, tdir, op_name)
        if vm.publish(spark, payload, version):
            vm.vacuum_superseded(spark)
            return
    raise RuntimeError(
        f"{op_name} {token!r} at {path} lost the manifest race "
        "5 times in a row — pause compactions and retry"
    )


def read_tombstone_ids(spark, data_root: str, col: str) -> DataFrame | None:
    """Ids deleted from this index version, or None when no complete
    tombstone batch exists — one column ``col``. Only MARKED batch
    dirs are read: a torn delete commit (data files, no ``_SUCCESS``)
    is invisible to probes until its same-token replay completes, the
    same completeness rule compactions apply to data folds. One FS
    listing per call — the price the batch layout already pays."""
    import posixpath as _pp

    from ..sources.fs import glob_paths

    troot = _pp.join(data_root, "tombstones")
    marked = glob_paths(spark, _pp.join(troot, "batch=*", "_SUCCESS"))
    if not marked:
        return None
    return (
        spark.read.option("basePath", troot)
        .parquet(*[p.rsplit("/", 1)[0] for p in marked])
        .select(col)
    )
