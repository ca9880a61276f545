"""Hot-key stress tests: pin the documented per-partition row bounds
of the skew operators under a synthetic 10×-hot key (VERDICT r3 task
#8). Each test checks BOTH properties the operators promise:

1. correctness — salted/bucketed result ≡ the plain-plan result;
2. the bound — no single reducer group (the unit a shuffle partition
   is built from) receives more than the documented share of the hot
   key's rows. The bound is measured on the operator's own grouping
   construction, so it holds independent of executor count.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.skew import (
    salted_count_sum,
    salted_join,
)
from datawaves_etl_airflow_spark.operators.temporal import (
    asof_join,
    asof_join_bucketed,
)

HOT = "hotkey"
N_HOT = 4000          # hot key rows: 10× the rest of the corpus combined
N_COLD_KEYS = 40
N_COLD_EACH = 10
BUCKET_SECONDS = 600  # hot timeline spans ~4000s → ~7 buckets
EPOCH = dt.datetime(2024, 1, 1)


def _skewed_events(spark, n_parts: int = 8):
    """(key, ts, v): one pathologically hot key + a cold tail."""
    hot = spark.range(N_HOT).select(
        F.lit(HOT).alias("key"),
        (F.lit(EPOCH) + F.make_interval(secs=F.col("id"))).alias("ts"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    cold = spark.range(N_COLD_KEYS * N_COLD_EACH).select(
        F.concat(F.lit("k"), (F.col("id") % N_COLD_KEYS)).alias("key"),
        (F.lit(EPOCH) + F.make_interval(secs=F.col("id") * 7)).alias("ts"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    return hot.unionByName(cold).repartition(n_parts)


class TestSaltedCountSum:
    def test_equals_plain_groupby_under_hot_key(self, spark):
        df = _skewed_events(spark)
        got = salted_count_sum(df, ["key"], {"sum_v": F.col("v")})
        want = df.groupBy("key").agg(
            F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_partial_stage_spreads_hot_key(self, spark):
        """The bound: with P input partitions and S salts, no partial
        (key, salt) group exceeds ceil(P/S) partitions' worth of the
        hot key — i.e. the hot key is genuinely split, never funneled
        to one reducer."""
        n_parts, n_salts = 8, 4
        df = _skewed_events(spark, n_parts=n_parts)
        partial = (
            df.withColumn(
                "_salt", F.spark_partition_id() % F.lit(n_salts)
            )
            .groupBy("key", "_salt")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("key") == HOT)
        )
        rows = partial.collect()
        # hot key lands on >1 salt (split happened) ...
        assert len(rows) > 1
        # ... and no salt group holds more than its partition share
        # (ceil(P/S) partitions × per-partition ceiling), far below
        # the unsalted single-group N_HOT.
        per_part_ceiling = -(-N_HOT // n_parts) + N_COLD_KEYS * N_COLD_EACH
        share = -(-n_parts // n_salts) * per_part_ceiling
        assert max(r["n"] for r in rows) <= share < N_HOT


class TestSaltedJoin:
    def test_equals_plain_join_under_hot_key(self, spark):
        big = _skewed_events(spark)
        small = spark.createDataFrame(
            [(HOT, "hot-dim")]
            + [(f"k{i}", f"dim{i}") for i in range(N_COLD_KEYS)],
            "key string, dim string",
        )
        got = salted_join(big, small, "key", n_salts=4)
        want = big.join(small, "key", "inner")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_reducer_groups_bounded(self, spark):
        """Per-(key, salt) reducer input from the big side is bounded
        by the hot key's share of ceil(P/S) input partitions."""
        n_parts, n_salts = 8, 4
        big = _skewed_events(spark, n_parts=n_parts)
        groups = (
            big.withColumn(
                "_salt", F.spark_partition_id() % F.lit(n_salts)
            )
            .groupBy("key", "_salt")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("key") == HOT)
            .collect()
        )
        per_part_ceiling = -(-N_HOT // n_parts) + N_COLD_KEYS * N_COLD_EACH
        share = -(-n_parts // n_salts) * per_part_ceiling
        assert len(groups) > 1
        assert max(r["n"] for r in groups) <= share < N_HOT


class TestAsofBucketedHotKey:
    def _sides(self, spark):
        right = _skewed_events(spark).withColumnRenamed("ts", "rts")
        # left probes: every 37s over the same span, same hot skew
        left = spark.range(N_HOT // 37 + 50).select(
            F.when(F.col("id") % 10 < 9, F.lit(HOT))
            .otherwise(F.concat(F.lit("k"), F.col("id") % N_COLD_KEYS))
            .alias("key"),
            (F.lit(EPOCH) + F.make_interval(secs=F.col("id") * 37 + 3))
            .alias("lts"),
        )
        return left, right

    def test_equals_plain_asof_under_hot_key(self, spark):
        left, right = self._sides(spark)
        got = asof_join_bucketed(
            left, right, "key", "lts", "rts", ["v"],
            bucket_seconds=BUCKET_SECONDS,
        )
        want = asof_join(left, right, "key", "lts", "rts", ["v"])
        cols = ["key", "lts", "rts", "v"]
        assert got.select(cols).exceptAll(want.select(cols)).count() == 0
        assert want.select(cols).exceptAll(got.select(cols)).count() == 0

    def test_window_groups_bounded_by_bucket(self, spark):
        """The documented bound: the main window partitions on
        (key, bucket), so no group exceeds one bucket's worth of rows
        (left + right + 1 seed) — for the hot key that is
        BUCKET_SECONDS right rows + probes, ≪ the full N_HOT timeline
        a plain key-partitioned window would hold."""
        left, right = self._sides(spark)
        bsec = F.lit(BUCKET_SECONDS).cast("long")
        r = right.select(
            "key", F.floor(F.unix_timestamp("rts") / bsec).alias("_b")
        )
        l = left.select(
            "key", F.floor(F.unix_timestamp("lts") / bsec).alias("_b")
        )
        sizes = (
            r.unionByName(l)
            .groupBy("key", "_b")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("key") == HOT)
            .collect()
        )
        # hot timeline is 1 row/sec → per-bucket right rows ≤
        # BUCKET_SECONDS; probes add ≤ ceil(BUCKET_SECONDS/37)+1; one
        # seed row per bucket.
        bound = BUCKET_SECONDS + (BUCKET_SECONDS // 37 + 2) + 1
        assert len(sizes) >= N_HOT // BUCKET_SECONDS  # genuinely split
        assert max(r["n"] for r in sizes) <= bound < N_HOT

    def test_hot_key_null_before_first_right_row(self, spark):
        """Seed injection must not invent matches: probes before the
        first right row stay NULL, exactly as plain asof_join."""
        left, right = self._sides(spark)
        early = left.unionByName(
            left.limit(1).select(
                "key",
                (F.lit(EPOCH) - F.make_interval(secs=F.lit(5)))
                .alias("lts"),
            )
        )
        got = asof_join_bucketed(
            early, right, "key", "lts", "rts", ["v"],
            bucket_seconds=BUCKET_SECONDS,
        )
        row = got.filter(F.col("lts") < F.lit(EPOCH)).collect()
        assert len(row) == 1 and row[0]["v"] is None
