"""Filesystem probes through Hadoop's FileSystem API.

`os.path` / `glob` silently report everything missing on hdfs:// or
s3a:// paths — the failure mode is never an error, it is wrong
behavior (a sensor that always times out, a view that never registers,
an incremental merge that drops history). Every path-existence probe
in the engine goes through these helpers, which resolve the scheme's
actual FileSystem (local paths included) via the session's Hadoop
configuration.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p


def path_exists(spark: SparkSession, path: str) -> bool:
    """Does ``path`` (any scheme) exist?"""
    fs, p = _fs_and_path(spark, path)
    return fs.exists(p)


def glob_paths(spark: SparkSession, pattern: str) -> list[str]:
    """Paths matching a Hadoop glob ``pattern`` (any scheme) — ONE
    round-trip, where per-path exists() probes would be one each."""
    fs, p = _fs_and_path(spark, pattern)
    statuses = fs.globStatus(p)
    if statuses is None:
        return []
    return [s.getPath().toString() for s in statuses]


def read_text(spark: SparkSession, path: str) -> str | None:
    """Small-file text read through the FileSystem API (None if the
    file does not exist) — for marker/state files beside a layout.

    One JVM round-trip for the whole payload (commons-io ships with
    Spark): the earlier per-byte ``stream.read()`` loop was one py4j
    round-trip PER BYTE — fine for a 3-byte marker, pathological for
    anything else."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _rename(fs, src, dst) -> bool:
    """Rename seam: every marker move goes through here so the chaos
    tests (tests/test_chaos_fs.py) can emulate object-store rename
    semantics — outright failure, or copy-without-delete leftovers —
    without a real object store in the sandbox. Hadoop rename returns
    False on failure rather than raising."""
    return fs.rename(src, dst)


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Small-file text overwrite through the FileSystem API.

    Crash-safe against partial writes: content goes to a same-directory
    temp file first, then moves into place with delete+rename, so a
    reader only ever sees the complete old content, the complete new
    content, or (in the delete→rename window) no file — never a torn
    half-write. (``fs.create`` + write is NOT atomic on object stores.)
    """
    jvm = spark._jvm
    fs, p = _fs_and_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(
        path + ".__tmp__" + uuid.uuid4().hex
    )
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not _rename(fs, tmp, p):
        fs.delete(tmp, False)
        raise OSError(f"rename {tmp} -> {path} failed")


def create_text_exclusive(
    spark: SparkSession, path: str, content: str
) -> bool:
    """Atomically create ``path`` with ``content`` IFF it does not
    already exist (Hadoop create(overwrite=False) — the one primitive
    plain filesystems give us that is atomic w.r.t. concurrent
    creators). Returns False if the path already existed: the commit
    token for manifest-style transactional commits
    (streaming.txn) — whoever creates the manifest wins the version.
    """
    fs, p = _fs_and_path(spark, path)
    try:
        stream = fs.create(p, False)
    except Exception as exc:  # FileAlreadyExistsException via py4j
        if "AlreadyExists" in str(exc.__class__) or "AlreadyExists" in str(
            exc
        ) or "already exists" in str(exc).lower():
            return False
        raise
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()
    return True


def require_success_marker(
    spark: SparkSession, directory: str, what: str
) -> None:
    """Fail loudly at WRITE time if a job commit left no ``_SUCCESS``
    marker (mapreduce.fileoutputcommitter.marksuccessfuljobs=false):
    the index compaction's torn-commit refusal keys on the marker, so
    a marker-less cluster must be rejected at the first write — not
    misdiagnosed as data corruption at the first compaction."""
    import posixpath

    if not path_exists(spark, posixpath.join(directory, "_SUCCESS")):
        raise RuntimeError(
            f"{what} committed without a _SUCCESS marker at "
            f"{directory} — the index torn-commit guard requires "
            "mapreduce.fileoutputcommitter.marksuccessfuljobs=true"
        )


def delete_path(spark: SparkSession, path: str) -> None:
    """Recursive delete via the Hadoop FS (works on any configured
    store, not just the local posix view); missing paths are a no-op."""
    fs, p = _fs_and_path(spark, path)
    if fs.exists(p):
        fs.delete(p, True)
