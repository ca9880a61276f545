"""Slowly-changing-dimension maintenance without a table format.

`m1_upsert_dimension` (queries.generic) shows SCD1 — overwrite in
place. This module is SCD2: every attribute change closes the current
row (stamps ``valid_to``) and opens a new version, preserving full
history — the dimension pattern a warehouse needs for as-of joins
against facts (``operators.temporal.asof_join`` over
``valid_from`` is the read side).

Plan shape: one left join of the CURRENT slice against the updates
batch (history rows pass through untouched, never shuffled by the
join), then unions of narrow projections. The updates batch is a daily
delta — orders of magnitude smaller than the dimension — so the join
broadcasts; the dimension is never shuffled at any size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attr_cols: list[str],
    eff_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply an updates batch (one row per key, effective at
    ``eff_col``) to an SCD2 dimension.

    Row fates: history rows (``to_col`` set) pass through; current
    rows whose update changes any attribute are closed at the
    effective time and re-opened as a new version; current rows with
    no update (or an identical one) pass through; keys new to the
    dimension are inserted as open rows. Null-safe attribute
    comparison (NULL → NULL is "no change").
    """
    out_cols = [key, *attr_cols, from_col, to_col]
    to_type = dim.schema[to_col].dataType
    hist = dim.filter(F.col(to_col).isNotNull()).select(*out_cols)
    cur = dim.filter(F.col(to_col).isNull())

    u = F.broadcast(
        updates.select(
            F.col(key),
            *[F.col(a).alias(f"_u_{a}") for a in attr_cols],
            F.col(eff_col).alias("_eff"),
        )
    )
    j = cur.join(u, key, "left")
    changed = F.col("_eff").isNotNull() & reduce(
        lambda x, y: x | y,
        [~F.col(a).eqNullSafe(F.col(f"_u_{a}")) for a in attr_cols],
    )
    unchanged = j.filter(~changed).select(*out_cols)
    closed = j.filter(changed).select(
        key, *attr_cols, from_col, F.col("_eff").alias(to_col)
    )
    new_version = j.filter(changed).select(
        F.col(key),
        *[F.col(f"_u_{a}").alias(a) for a in attr_cols],
        F.col("_eff").alias(from_col),
        F.lit(None).cast(to_type).alias(to_col),
    )
    inserts = (
        updates.join(cur.select(key), key, "left_anti")
        .select(
            F.col(key),
            *[F.col(a) for a in attr_cols],
            F.col(eff_col).alias(from_col),
            F.lit(None).cast(to_type).alias(to_col),
        )
    )
    return (
        hist.unionByName(unchanged)
        .unionByName(closed)
        .unionByName(new_version)
        .unionByName(inserts)
    )
