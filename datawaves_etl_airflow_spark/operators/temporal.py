"""Temporal join operators: as-of join and bucketed range join.

The reference's surface is daily-batch equi-joins only (SURVEY.md §2.3;
ref `dags/templates/evm_load_template.py:370-375` is the most complex
join shape), but downstream consumers of its decoded tables — price
attribution, promo attribution, event sessionization — need the two
temporal join shapes Spark lacks as builtins. Both are implemented as
compositions of existing DataFrame ops (no UDFs, no driver loops), so
Catalyst/Tungsten run the whole plan JVM-side.

Scale posture (100 TB):

- ``asof_join`` is ONE hash shuffle on the join key followed by a
  linear window scan per key partition — the union trick turns the
  point-in-time lookup into ``last(value, ignorenulls)`` over an
  interleaved, time-sorted stream. No range explosion, no O(n·m)
  candidate pairs, no broadcast requirement on either side. A key whose
  row count exceeds one executor's partition is the only hazard
  (windows cannot be salted); at that point pre-bucket the timeline by
  coarse time range and as-of join within buckets, carrying each
  bucket's last row forward.
- ``bucketed_range_join`` avoids the O(|facts|·|ranges|) broadcast
  nested-loop plan Spark picks for pure inequality joins: ranges are
  exploded onto a fixed time grid (one row per covered bucket) and the
  join becomes an equi-join on the bucket id + an exact residual
  filter. Each fact lands in exactly one bucket, so no dedup pass is
  needed. Cost scales with |facts| + Σ(range_len/bucket)·|ranges| —
  pick ``bucket`` near the median range length so ranges explode to
  O(1) rows each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_bucketed", "bucketed_range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward (inclusive) as-of join: for every ``left`` row, attach
    the ``value_cols`` of the latest ``right`` row with the same
    ``key`` and ``right_ts <= left_ts``; nulls where no such row.

    Semantics match DuckDB's ``ASOF LEFT JOIN`` (the oracle used by the
    ``aj1_asof_clicks`` driver query). Right rows must be unique per
    (key, right_ts) — pre-aggregate otherwise, or which of the tied
    rows wins is undefined in both engines.

    Implementation: union the two sides tagged 0 (right) / 1 (left)
    and run ``last(carry, ignorenulls=True)`` over a window ordered by
    (ts, tag) — at equal timestamps the right row sorts first, which is
    exactly the inclusive-backward rule. One shuffle, linear scan.

    All carried columns (matched_ts + value_cols) travel as ONE struct:
    the struct is non-null exactly on right rows, so a matched row's
    genuinely-NULL value column rides along as NULL instead of being
    skipped by ignorenulls and replaced with an older row's value
    (which would break ASOF semantics — the DuckDB oracle returns the
    NULL).
    """
    from pyspark.sql import Window

    matched_ts = f"{right_ts}_matched" if right_ts == left_ts else right_ts
    carried = [matched_ts] + [c for c in value_cols if c != matched_ts]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias(matched_ts),
            *[F.col(c) for c in value_cols if c != matched_ts],
        ).alias("_carry"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
    )
    both = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = both.withColumn("_carry", F.last("_carry", ignorenulls=True).over(w))
    out = both.filter(F.col("_side") == 1)
    for c in carried:
        out = out.withColumn(c, F.col(f"_carry.{c}"))
    return out.drop("_ts", "_side", "_carry")


def bucketed_range_join(
    facts: DataFrame,
    fact_ts: str,
    ranges: DataFrame,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner join of ``facts`` to every ``ranges`` row whose half-open
    interval [start_col, end_col) contains ``fact_ts``.

    Both timestamp columns are mapped to a fixed grid of
    ``bucket_seconds``-wide buckets; each range row is exploded to the
    buckets it covers (``sequence`` + ``explode``), each fact to its
    single bucket, and the containment predicate is applied after the
    bucket equi-join as an exact residual filter. The equi-join
    shuffles on the bucket id, so Catalyst is free to pick
    broadcast/sort-merge and AQE can split skewed buckets — none of
    which happens with the broadcast-nested-loop plan a raw
    inequality join produces.
    """
    # bucket arithmetic in integer MICROSECONDS: unix_timestamp()
    # truncates sub-second precision, so a range ending at 60.5s with
    # 60s buckets would lose its final bucket and silently drop facts
    # in [60, 60.5). unix_micros needs LTZ timestamps; the cast is a
    # no-op for LTZ and a UTC reinterpretation for NTZ inputs.
    busec = F.lit(int(bucket_seconds) * 1_000_000).cast("long")

    def _us(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    r = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(_us(start_col) / busec),
                # half-open upper bound: the last covered instant is
                # end - 1µs, so no -1-second trick and no lost bucket
                F.floor((_us(end_col) - 1) / busec),
            )
        ),
    )
    f = facts.withColumn("_bucket", F.floor(_us(fact_ts) / busec))
    joined = f.join(r, "_bucket", "inner").filter(
        (F.col(fact_ts) >= F.col(start_col))
        & (F.col(fact_ts) < F.col(end_col))
    )
    return joined.drop("_bucket")


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """`asof_join` for pathologically hot keys: identical semantics,
    but the window partitions on (key, time-bucket) instead of key, so
    no single partition ever exceeds one bucket's worth of rows — the
    mitigation `asof_join`'s docstring promises for a key whose
    timeline outgrows one executor partition.

    Cross-bucket correctness comes from SEED rows: per (key, bucket)
    the last right row of every EARLIER bucket is computed on the
    per-bucket aggregate (a frame orders of magnitude smaller than the
    raw timeline) and injected into each bucket's partition, where its
    strictly-earlier timestamp makes it the fallback match. Three
    shuffles total: per-bucket aggregate, seed window on the bucket
    grid, and the main (key, bucket) window.
    """
    from pyspark.sql import Window

    bsec = F.lit(int(bucket_seconds)).cast("long")
    matched_ts = f"{right_ts}_matched" if right_ts == left_ts else right_ts
    carried = [matched_ts] + [c for c in value_cols if c != matched_ts]

    # all carried columns travel as one struct (same NULL-transparency
    # rationale as asof_join: a matched row's NULL value column must
    # ride along, not be skipped by ignorenulls)
    rb = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.floor(F.unix_timestamp(F.col(right_ts)) / bsec).alias("_bucket"),
        F.struct(
            F.col(right_ts).alias(matched_ts),
            *[F.col(c) for c in value_cols if c != matched_ts],
        ).alias("_carry"),
    )
    # last right row per (key, bucket); right rows are unique per
    # (key, ts) by contract, so struct-max == argmax on _ts
    packed = F.struct(F.col("_ts"), F.col("_carry"))
    last_per_bucket = rb.select(key, "_bucket", packed.alias("_s")).groupBy(
        key, "_bucket"
    ).agg(F.max("_s").alias("_s"))

    lb = left.select(
        F.col(key).alias("_k"),
        F.floor(F.unix_timestamp(F.col(left_ts)) / bsec).alias("_bucket"),
    ).select(F.col("_k").alias(key), "_bucket").distinct()
    grid = lb.unionByName(
        last_per_bucket.select(key, "_bucket")
    ).distinct().join(last_per_bucket, [key, "_bucket"], "left")
    seed_w = (
        Window.partitionBy(key)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        grid.withColumn("_seed", F.last("_s", ignorenulls=True).over(seed_w))
        .filter(F.col("_seed").isNotNull())
        .select(
            F.col(key),
            F.col("_seed._ts").alias("_ts"),
            F.col("_bucket"),
            F.col("_seed._carry").alias("_carry"),
        )
    )

    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.floor(F.unix_timestamp(F.col(left_ts)) / bsec).alias("_bucket"),
    )
    r_rows = rb.withColumn("_side", F.lit(0))
    seed_rows = seeds.withColumn("_side", F.lit(0))
    both = l.unionByName(
        r_rows.unionByName(seed_rows, allowMissingColumns=True),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(key, "_bucket")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = both.withColumn("_carry", F.last("_carry", ignorenulls=True).over(w))
    out = both.filter(F.col("_side") == 1)
    for c in carried:
        out = out.withColumn(c, F.col(f"_carry.{c}"))
    return out.drop("_ts", "_side", "_bucket", "_carry")
