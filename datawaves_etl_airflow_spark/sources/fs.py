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
    file does not exist) — for marker/state files beside a layout."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        out = bytearray()
        while True:
            b = stream.read()
            if b < 0:
                break
            out.append(b)
        return out.decode("utf-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Small-file text overwrite through the FileSystem API."""
    fs, p = _fs_and_path(spark, path)
    stream = fs.create(p, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()
