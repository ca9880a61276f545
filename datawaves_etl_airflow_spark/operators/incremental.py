"""Incremental aggregate maintenance: fold a day's partial aggregates
into a cumulative table without recomputing history.

The reference materializes enriched tables per day and leaves
cumulative questions ("total transfers per token, ever") to downstream
full scans; a warehouse at 100 TB wants the running aggregate
maintained incrementally. Additive aggregates (SUM/COUNT — and MIN/MAX
which are monotone under merge) support exact incremental folds:
``merge(cum, agg(day)) == agg(history + day)``.

Two tiers, mirroring the J-6 anti-join's scale path:

- `merge_additive`: union + one hash aggregation. Exact and
  oracle-checkable; shuffles cum+day once — fine when the cumulative
  side fits a routine job.
- `merge_additive_bucket_pruned`: the cumulative table lives in a
  `sinks.write_key_bucketed` hive layout; only the ``key_bucket=``
  directories the day's keys hash into are read, merged, and
  rewritten (static partition overwrite of exactly those directories).
  Untouched buckets are never read OR written — a day touching K keys
  costs ``min(K, n_buckets)/n_buckets`` of the table in both I/O
  directions, regardless of history size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "merge_additive",
    "merge_additive_bucket_pruned",
    "distinct_sketch_day",
    "merge_distinct_sketch",
    "distinct_estimate",
]


def _existing_buckets(spark: SparkSession, cum_path: str) -> set[int]:
    """Bucket ids present in the layout — ONE Hadoop glob round-trip
    (sources.fs), not a per-bucket exists() probe: remote stores charge
    per request, and os.path on a remote warehouse would report every
    bucket missing and silently DROP the accumulated history."""
    from ..sources.fs import glob_paths

    out = set()
    for p in glob_paths(spark, os.path.join(cum_path, "key_bucket=*")):
        try:
            out.add(int(p.rsplit("key_bucket=", 1)[1]))
        except ValueError:
            continue
    return out


def merge_additive(
    cum: DataFrame, day: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Exact additive merge: per-key sums over ``cum ∪ day``.

    Both inputs carry the same ``keys + sum_cols`` columns (``day`` may
    be raw rows or partial aggregates — sums are associative either
    way). One shuffle with map-side partial aggregation.
    """
    cols = [*keys, *sum_cols]
    both = cum.select(*cols).unionByName(day.select(*cols))
    return both.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def merge_additive_bucket_pruned(
    cum_path: str,
    day: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    n_buckets: int = 64,
) -> list[int]:
    """In-place incremental merge over a `write_key_bucketed` layout.

    Reads ONLY the bucket directories the day's first-key values hash
    into, merges the day's rows, and dynamically overwrites exactly
    those ``key_bucket=`` partitions (every touched bucket appears in
    the merged output, and dynamic overwrite replaces only partitions
    present in it). Returns the touched bucket ids
    (≤ min(|day keys|, n_buckets) — bounded driver state).

    Correctness: same-key rows always share a bucket (the layout
    contract), so a per-bucket merge is complete; untouched buckets
    hold no key from the day and keep their bytes verbatim.
    """
    spark = day.sparkSession
    day_key_type = day.schema[keys[0]].dataType.simpleString()
    _validate_layout(spark, cum_path, n_buckets, keys[0], day_key_type)
    bucket = F.pmod(F.xxhash64(F.col(keys[0])), F.lit(n_buckets))
    day_b = day.select(*keys, *sum_cols).withColumn("key_bucket", bucket)
    touched = sorted(
        r["key_bucket"]
        for r in day_b.select("key_bucket").distinct().collect()
    )
    if not touched:
        return []

    existing = sorted(set(touched) & _existing_buckets(spark, cum_path))
    day_slice = day_b.filter(F.col("key_bucket").isin(touched))
    if existing:
        cum_slice = (
            spark.read.option("basePath", cum_path).parquet(
                *[
                    os.path.join(cum_path, f"key_bucket={b}")
                    for b in existing
                ]
            )
        ).select(*keys, *sum_cols, "key_bucket")
        merged_input = cum_slice.unionByName(day_slice)
    else:
        merged_input = day_slice
    merged = merged_input.groupBy(*keys, "key_bucket").agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("key_bucket")
        .parquet(cum_path)
    )
    from .sinks import read_layout_meta, write_layout_meta

    if read_layout_meta(spark, cum_path) is None:
        # first write onto a fresh/legacy layout: pin the contract so
        # every later merge validates against it
        write_layout_meta(
            spark, cum_path, n_buckets, keys[0], day_key_type
        )
    return touched


def _validate_layout(
    spark: SparkSession,
    cum_path: str,
    n_buckets: int,
    key: str,
    key_type: str,
) -> None:
    """Fail loudly when the caller's bucketing parameters don't match
    the layout on disk. xxhash64 is type-sensitive and pmod is
    n_buckets-sensitive: a mismatched merge silently reads the WRONG
    bucket directories, splits keys across buckets, and leaves stale
    rows with wrong cumulative totals — no error, just corrupt data.

    Layouts written by `sinks.write_key_bucketed` (or a prior merge)
    carry a ``_bucket_layout.json`` contract; for legacy marker-less
    layouts, the weaker guard is that no existing bucket id can be
    ≥ n_buckets (which catches shrinking the bucket count, the most
    destructive mismatch).
    """
    from .sinks import read_layout_meta

    meta = read_layout_meta(spark, cum_path)
    if meta is not None:
        problems = []
        if meta["n_buckets"] != n_buckets:
            problems.append(
                f"n_buckets={n_buckets} vs layout {meta['n_buckets']}"
            )
        if meta["key"] != key:
            problems.append(f"key={key!r} vs layout {meta['key']!r}")
        if meta["key_type"] != key_type:
            problems.append(
                f"key type {key_type} vs layout {meta['key_type']} "
                f"(xxhash64 hashes these differently)"
            )
        if problems:
            raise ValueError(
                f"bucketed-layout contract mismatch at {cum_path}: "
                + "; ".join(problems)
            )
        return
    stale = [b for b in _existing_buckets(spark, cum_path) if b >= n_buckets]
    if stale:
        raise ValueError(
            f"bucketed layout at {cum_path} has bucket ids {stale[:5]} "
            f"≥ n_buckets={n_buckets} — the layout was written with a "
            f"different bucket count; merging would split keys across "
            f"buckets and corrupt cumulative totals"
        )


# ---------------------------------------------------------------------------
# Incremental DISTINCT-count maintenance: mergeable HLL sketches
# ---------------------------------------------------------------------------

def distinct_sketch_day(
    day: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-key Datasketches-HLL sketch of a day's distinct
    ``value_col``: ``(keys..., sketch: binary)``.

    COUNT(DISTINCT) is the aggregate `merge_additive` cannot maintain
    (distinct does not distribute over days); a mergeable sketch does:
    store one small binary per key per fold, union instead of recount.
    ``lg_k=12`` → ~1.6% relative standard error in ~4 KiB/key max.
    One hash aggregation, all JVM (Spark's built-in Datasketches HLL).
    """
    return day.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(int(lg_k))).alias("sketch")
    )


def merge_distinct_sketch(
    cum: DataFrame, day_sketch: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold a day's per-key sketches into the cumulative sketch table:
    ``merge(cum, sketch(day)) ≈ sketch(history ∪ day)`` within the
    sketch's error bound (bit-exactness is NOT promised: a union
    forces dense-HLL mode while a small direct build may stay sparse)
    — mergeability, extended from sums to distinct counts. The output
    stays a sketch (binary), so folds chain indefinitely; call
    `distinct_estimate` only at read time. One shuffle on the keys."""
    both = cum.select(*keys, "sketch").unionByName(
        day_sketch.select(*keys, "sketch")
    )
    return both.groupBy(*keys).agg(
        F.hll_union_agg("sketch").alias("sketch")
    )


def distinct_estimate(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time estimates: ``(keys..., n_distinct: long)``."""
    return sketches.select(
        *keys,
        F.hll_sketch_estimate("sketch").alias("n_distinct"),
    )
