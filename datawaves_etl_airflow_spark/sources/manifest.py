"""Versioned-manifest commit: the one transactional primitive every
persisted layout in the engine shares.

Plain filesystems (and object stores behind Hadoop's FileSystem API)
offer exactly one atomic primitive usable for coordination:
create-if-absent (``fs.create(overwrite=False)``). Everything durable
the engine maintains — the streaming cumulative bucket store
(`streaming.txn`), the persisted MinHash dedup index and the IVF ANN
index (`operators.dedup` / `operators.similarity`) — commits through
the same protocol built on it:

1. write data to FRESH, uniquely-named, immutable directories (never
   touching the live set);
2. publish ``_manifests/manifest-<v+1>.json`` whose creation is the
   commit point — the payload references the new live directories;
3. readers resolve the HIGHEST manifest version and read only what it
   references.

A crash anywhere before step 2 leaves only unreferenced garbage — the
previous manifest (and therefore the previous index/store state) stays
live and fully readable throughout. A lost create race means another
writer took the version; the caller decides whether that is a benign
replay (txn batch folds) or an unsupported concurrent writer (index
rebuilds). `vacuum` deletes what no current manifest references.

This module holds the protocol once; the consumers keep only their
payload schemas. At 100 TB the manifest is a handful of KB read once
per operation — driver-side state never scales with data.

Object-store honesty: rename is never on the commit path (data dirs
are write-once under unique names; manifests are whole-file creates),
which is exactly what S3-style stores need. The one primitive that
must hold is create-if-absent: atomic on HDFS/ABFS/local; on S3A it is
implemented as a HEAD-then-PUT, so the no-concurrent-writers contract
(one committer per store/index, enforced by the callers' single-writer
semantics, e.g. one foreachBatch per checkpoint) is load-bearing
there — or use S3 conditional writes (If-None-Match) via a current
hadoop-aws. That upgrade is a config change on exactly ONE seam:
`fs.create_text_exclusive` is the only primitive the commit path
uses — pinned by tests/test_advice_r6.py::TestManifestSeamIsolation,
which runs the full persisted-index lifecycle (build, append,
compact, vacuum) with the rename-based marker writer forbidden.
The sandbox has no object store; tests/test_chaos_fs.py emulates the
failure modes (failed rename, copy-without-delete leftovers, lagging
listings, racing committers) behind the fs seams instead.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import SparkSession

from .fs import (
    _fs_and_path,
    create_text_exclusive,
    glob_paths,
    read_text,
)

__all__ = ["VersionedManifest"]


class VersionedManifest:
    """Resolve/publish/vacuum for one ``_manifests`` directory."""

    def __init__(self, root: str, dirname: str = "_manifests"):
        self.root = root.rstrip("/")
        self.dirname = dirname

    def manifest_dir(self) -> str:
        return posixpath.join(self.root, self.dirname)

    def _path(self, version: int) -> str:
        return posixpath.join(
            self.manifest_dir(), f"manifest-{version}.json"
        )

    def latest_version(self, spark: SparkSession) -> int:
        """Highest committed version (0 = empty store). One glob."""
        best = 0
        for p in glob_paths(
            spark, posixpath.join(self.manifest_dir(), "manifest-*.json")
        ):
            name = p.rsplit("manifest-", 1)[1].removesuffix(".json")
            try:
                v = int(name)
            except ValueError:
                continue
            best = max(best, v)
        return best

    def resolve(self, spark: SparkSession) -> tuple[int, dict | None]:
        """(latest version, payload) — (0, None) when empty.

        Unparseable payloads RAISE: a torn manifest is impossible by
        construction (create-if-absent publishes whole files), so one
        signals real corruption, and guessing would silently reset the
        store."""
        v = self.latest_version(spark)
        if v == 0:
            return 0, None
        raw = read_text(spark, self._path(v))
        if raw is None:
            # the glob saw it; re-resolve once (a vacuum may have just
            # rewritten the listing), then fail LOUD: reporting a
            # listed store as empty would let a writer fork version 1,
            # publish a manifest referencing only its own batch, and
            # silently lose everything readers still resolve
            v2 = self.latest_version(spark)
            raw = read_text(spark, self._path(v2)) if v2 else None
            if raw is None:
                raise ValueError(
                    f"manifest listing under {self.manifest_dir()} shows "
                    f"version {v} but its payload cannot be read — "
                    "refusing to treat a listed store as empty"
                )
            v = v2
        try:
            payload = json.loads(raw)
            if not isinstance(payload, dict):
                raise ValueError("manifest payload must be an object")
        except ValueError as exc:
            raise ValueError(
                f"corrupt manifest at {self._path(v)}: {raw!r}"
            ) from exc
        return v, payload

    def publish(
        self, spark: SparkSession, payload: dict, base_version: int
    ) -> bool:
        """Commit ``payload`` as version ``base_version + 1``. False
        means another writer took that version first (caller decides
        replay-vs-error); True means this call is the commit."""
        return create_text_exclusive(
            spark, self._path(base_version + 1), json.dumps(payload)
        )

    def publish_or_raise(
        self,
        spark: SparkSession,
        payload: dict,
        base_version: int,
        what: str,
    ) -> None:
        """Publish for single-writer consumers (index rebuilds and
        compactions): a lost create race means an unsupported
        concurrent writer, so raise — the loser's data directory is
        vacuumable garbage, the winner's version is live."""
        if not self.publish(spark, payload, base_version):
            raise RuntimeError(
                f"{what} at {self.root} lost the manifest race for "
                f"version {base_version + 1}: concurrent writers on one "
                "store are not supported (the other writer's version is "
                "now live; this build's directory is vacuumable garbage)"
            )

    def vacuum_superseded(self, spark: SparkSession) -> list[str]:
        """Delete every manifest below the latest version. Data-dir
        vacuum stays with the consumer (only it knows its layout)."""
        latest = self.latest_version(spark)
        deleted = []
        for p in glob_paths(
            spark, posixpath.join(self.manifest_dir(), "manifest-*.json")
        ):
            name = p.rsplit("manifest-", 1)[1].removesuffix(".json")
            try:
                v = int(name)
            except ValueError:
                continue
            if v < latest:
                fs, jp = _fs_and_path(spark, p)
                fs.delete(jp, False)
                deleted.append(p)
        return deleted

    def vacuum_data(
        self,
        spark: SparkSession,
        subdir: str,
        live: set[str],
        spare=None,
    ) -> list[str]:
        """Delete children of ``root/subdir/`` whose root-relative path
        ``subdir/<name>`` is not in ``live`` (consumer-computed from
        the latest manifest). ``<name>`` is the child's BASENAME —
        children are exactly one level deep, and splitting on
        ``/subdir/`` would mis-key any root whose own path contains a
        same-named component (e.g. an index rooted under a directory
        called ``versions``) and delete the live data. ``spare``
        optionally keeps additional children by name (in-flight
        builds). Returns deleted paths."""
        deleted = []
        for p in glob_paths(spark, posixpath.join(self.root, subdir, "*")):
            name = p.rstrip("/").rsplit("/", 1)[1]
            if posixpath.join(subdir, name) in live:
                continue
            if spare is not None and spare(name):
                continue
            fs, jp = _fs_and_path(spark, p)
            fs.delete(jp, True)
            deleted.append(p)
        return deleted

    def vacuum_versions(
        self,
        spark: SparkSession,
        legacy_rels: tuple[str, ...] = (),
    ) -> list[str]:
        """Reclaim superseded state for a ``versions/``-layout consumer
        (the MinHash and IVF indexes): version directories the latest
        manifest does not reference, superseded manifests, and any
        ``legacy_rels`` residue once a manifest exists.

        A directory numbered ABOVE the current manifest version is an
        IN-FLIGHT rebuild (`v<current+1>-<uuid>` exists on disk before
        its manifest publishes) and is never touched — deleting it
        mid-write would destroy a rebuild that may be days of compute.
        A crashed rebuild's orphan becomes reclaimable as soon as a
        later rebuild publishes past its number. Empty store: no-op."""
        from .fs import delete_path, path_exists

        version, payload = self.resolve(spark)
        if payload is None:
            return []

        def in_flight(name: str) -> bool:
            try:
                return int(name.split("-", 1)[0].removeprefix("v")) > version
            except ValueError:
                return False

        deleted = self.vacuum_data(
            spark, "versions", {str(payload["current"])}, spare=in_flight
        )
        deleted.extend(self.vacuum_superseded(spark))
        for rel in legacy_rels:
            p = posixpath.join(self.root, rel)
            if path_exists(spark, p):
                delete_path(spark, p)
                deleted.append(p)
        return deleted
