"""Exactly-once cumulative maintenance on plain parquet: a manifest-
committed bucket store.

The marker-file merger (`maintain.make_batch_merger`) closes the
ordinary replay path but honestly documents a residual window: a crash
BETWEEN the partition-overwrite commit and the marker write double-
applies one batch on restart. Worse, a dynamic partition overwrite is
itself not atomic on plain parquet — a crash mid-job-commit can leave
a subset of partitions swapped.

This module closes both with the one atomic primitive plain
filesystems offer: create-if-absent. Data files are immutable and
append-only; visibility is decided solely by a versioned manifest
whose creation (``fs.create(overwrite=False)``) is the commit point.

Layout under ``root``::

    _manifests/manifest-<v>.json   {"version", "last_batch_id",
                                    "buckets": {bucket: [dirs]}}
    _batches/batch-<id>-<uuid>/pkb=<K>/part-*.parquet

Each merge writes its output to a FRESH uniquely-named batch directory
(never touching live data), then publishes manifest v+1 that maps each
touched bucket to its new directory and records the batch id. Crash
anywhere before the manifest create leaves only unreferenced garbage —
the replayed batch recomputes from the still-current manifest and
commits once. Crash after it: the replay reads ``last_batch_id`` and
skips. There is no state in between, hence exactly-once.

Reads resolve through the manifest (`current_df`), optionally pruned
to a bucket subset — the same ``min(K, n_buckets)/n_buckets`` probe
economics as the plain `sinks.write_key_bucketed` layout, because the
manifest keys data by the same ``pmod(xxhash64(key), n_buckets)``.

Scale posture: the manifest holds one entry per bucket (≤ n_buckets
dirs after compaction; one extra dir per touched bucket per un-
compacted batch), read and written once per trigger — driver-side
state is O(n_buckets + batches-since-compaction), never O(rows).
`compact` folds every live directory back to one per bucket and
`vacuum` deletes unreferenced batch dirs and superseded manifests.
"""

from __future__ import annotations

import posixpath
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fs import glob_paths, path_exists
from ..sources.manifest import VersionedManifest

__all__ = ["ManifestedBucketStore"]


class ManifestedBucketStore:
    """Versioned-manifest bucket store over immutable parquet dirs.

    The commit protocol (resolve-latest / publish-via-create-if-absent
    / vacuum) lives in `sources.manifest.VersionedManifest`, shared
    with the persisted MinHash and IVF index rebuilds; this class owns
    only the bucket-store payload schema and merge semantics."""

    def __init__(self, root: str, n_buckets: int = 64):
        self.root = root.rstrip("/")
        self.n_buckets = n_buckets
        self._vm = VersionedManifest(self.root)

    # -- manifest resolution ------------------------------------------

    def _resolve(self, spark: SparkSession) -> tuple[int, dict | None]:
        """(latest version, manifest dict) — (0, None) for an empty
        store. Payloads that don't match the bucket-store schema raise
        (a torn manifest is impossible by construction — create-if-
        absent publishes whole files — so one signals real corruption).
        """
        version, m = self._vm.resolve(spark)
        if m is None:
            return 0, None
        try:
            m["buckets"] = {int(k): list(v) for k, v in m["buckets"].items()}
            int(m["last_batch_id"])
        except (ValueError, KeyError, TypeError) as exc:
            raise ValueError(
                f"corrupt manifest version {version} under "
                f"{self.root}: {m!r}"
            ) from exc
        return version, m

    def last_batch_id(self, spark: SparkSession) -> int | None:
        _, m = self._resolve(spark)
        return None if m is None else int(m["last_batch_id"])

    # -- reads --------------------------------------------------------

    def _live_dirs(self, m: dict, buckets=None) -> list[str]:
        out = []
        for b, dirs in m["buckets"].items():
            if buckets is None or b in buckets:
                out.extend(posixpath.join(self.root, d) for d in dirs)
        return out

    def current_df(
        self, spark: SparkSession, buckets: list[int] | None = None
    ) -> DataFrame | None:
        """The committed snapshot (None when the store is empty),
        optionally pruned to ``buckets`` — the key-probe read path:
        only the selected buckets' directories are ever listed or
        scanned. ``key_bucket`` is a data column in every file, so no
        partition-discovery basePath gymnastics are needed across
        batch directories."""
        _, m = self._resolve(spark)
        if m is None:
            return None
        dirs = self._live_dirs(m, set(buckets) if buckets is not None else None)
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    # -- the exactly-once fold ----------------------------------------

    def merge_batch(
        self,
        batch_df: DataFrame,
        batch_id: int,
        keys: list[str],
        sum_cols: list[str],
    ) -> bool:
        """Fold one micro-batch exactly once. Returns True if this call
        committed, False if the batch id was already applied (replay).

        The write targets a fresh uniquely-named directory and the
        manifest create is first-writer-wins, so any interleaving of
        crashes and replays yields each batch id applied exactly once.
        """
        spark = batch_df.sparkSession
        version, m = self._resolve(spark)
        if m is not None and batch_id <= int(m["last_batch_id"]):
            return False  # replayed after a successful commit

        bucket = F.pmod(F.xxhash64(F.col(keys[0])), F.lit(self.n_buckets))
        partials = (
            batch_df.select(*keys, *sum_cols)
            .groupBy(*keys)
            .agg(*[F.sum(c).alias(c) for c in sum_cols])
            .withColumn("key_bucket", bucket)
        )
        touched = sorted(
            r["key_bucket"]
            for r in partials.select("key_bucket").distinct().collect()
        )
        if not touched:
            return False

        live = m["buckets"] if m is not None else {}
        cum_dirs = [
            posixpath.join(self.root, d)
            for b in touched
            for d in live.get(b, [])
        ]
        merged_in = partials
        if cum_dirs:
            cum_slice = spark.read.parquet(*cum_dirs).select(
                *keys, *sum_cols, "key_bucket"
            )
            merged_in = cum_slice.unionByName(partials)
        merged = merged_in.groupBy(*keys, "key_bucket").agg(
            *[F.sum(c).alias(c) for c in sum_cols]
        )

        rel_batch = posixpath.join(
            "_batches", f"batch-{batch_id}-{uuid.uuid4().hex[:8]}"
        )
        batch_dir = posixpath.join(self.root, rel_batch)
        # pkb partitions the files per bucket (so bucket-pruned reads
        # list single directories); key_bucket stays a DATA column so
        # multi-directory reads need no basePath reconstruction
        (
            merged.withColumn("pkb", F.col("key_bucket"))
            .write.mode("errorifexists")
            .partitionBy("pkb")
            .parquet(batch_dir)
        )

        new_buckets = {**live}
        for b in touched:
            new_buckets[b] = [posixpath.join(rel_batch, f"pkb={b}")]
        committed = self._vm.publish(
            spark,
            {
                "version": version + 1,
                "last_batch_id": batch_id,
                "buckets": {str(k): v for k, v in new_buckets.items()},
            },
            version,
        )
        if committed:
            return True
        # lost the version race: only a replayed attempt of this same
        # batch can legitimately win it (foreachBatch is single-writer
        # per checkpoint) — verify, then drop our orphaned output
        _, m2 = self._resolve(spark)
        if m2 is not None and int(m2["last_batch_id"]) >= batch_id:
            return False
        raise RuntimeError(
            f"manifest version {version + 1} was taken by a writer that "
            f"did not apply batch {batch_id}: concurrent writers on one "
            f"store are not supported"
        )

    # -- maintenance --------------------------------------------------

    def compact(self, spark: SparkSession) -> bool:
        """Fold all live directories into one per bucket (publishes a
        new manifest; batch ids unaffected). Returns False on an empty
        store. Run periodically — read cost grows with directories per
        bucket between compactions."""
        version, m = self._resolve(spark)
        if m is None:
            return False
        df = spark.read.parquet(*self._live_dirs(m))
        rel = posixpath.join("_batches", f"compact-{uuid.uuid4().hex[:8]}")
        (
            df.withColumn("pkb", F.col("key_bucket"))
            .write.mode("errorifexists")
            .partitionBy("pkb")
            .parquet(posixpath.join(self.root, rel))
        )
        present = {
            int(p.rsplit("pkb=", 1)[1])
            for p in glob_paths(
                spark, posixpath.join(self.root, rel, "pkb=*")
            )
        }
        return self._vm.publish(
            spark,
            {
                "version": version + 1,
                "last_batch_id": int(m["last_batch_id"]),
                "buckets": {
                    str(b): [posixpath.join(rel, f"pkb={b}")]
                    for b in present
                },
            },
            version,
        )

    def vacuum(self, spark: SparkSession) -> list[str]:
        """Delete batch directories unreferenced by the LATEST manifest
        and all superseded manifests. Safe after any crash: orphans are
        by definition invisible to readers. Returns deleted paths.

        Cadence contract (pinned in TestVacuumConcurrency): a reader
        that resolved the CURRENT manifest keeps collecting through a
        vacuum — only unreferenced dirs are deleted. What vacuum does
        NOT protect is a reader still draining a SUPERSEDED snapshot
        (resolved before a later merge/compact): its directories are
        exactly the garbage vacuum reclaims. Operationally: vacuum on
        a schedule longer than the longest query over the store, the
        same retention discipline as any snapshot-isolated table
        format."""
        _, m = self._resolve(spark)
        if m is None:
            return []
        live_roots = {
            d.split("/pkb=", 1)[0]
            for dirs in m["buckets"].values()
            for d in dirs
        }
        deleted = self._vm.vacuum_data(spark, "_batches", live_roots)
        deleted.extend(self._vm.vacuum_superseded(spark))
        return deleted

    def exists(self, spark: SparkSession) -> bool:
        return path_exists(spark, self._vm.manifest_dir())
