"""Incremental aggregate maintenance (operators.incremental): additive
merges equal full recomputation, and the bucket-pruned variant touches
only the day's buckets — verified down to untouched files' bytes."""

import os

from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.incremental import (
    merge_additive,
    merge_additive_bucket_pruned,
)
from datawaves_etl_airflow_spark.operators.sinks import write_key_bucketed


def _snapshot(root):
    """{relpath: (size, mtime_ns)} for every data file under root."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def _cum_rows(n_keys=200):
    return [(k, k * 10, 1) for k in range(n_keys)]


class TestMergeAdditive:
    def test_equals_full_recompute(self, spark):
        hist = spark.createDataFrame(
            _cum_rows(), ["token", "amount", "n"]
        )
        cum = hist.groupBy("token").agg(
            F.sum("amount").alias("amount"), F.sum("n").alias("n")
        )
        day = spark.createDataFrame(
            [(5, 7, 1), (5, 3, 1), (1000, 42, 1)], ["token", "amount", "n"]
        )
        got = merge_additive(cum, day, ["token"], ["amount", "n"])
        want = hist.unionByName(day).groupBy("token").agg(
            F.sum("amount").alias("amount"), F.sum("n").alias("n")
        )
        assert got.subtract(want).count() == 0
        assert want.subtract(got).count() == 0
        row = {r["token"]: r for r in got.collect()}
        assert row[5]["amount"] == 60 and row[5]["n"] == 3
        assert row[1000]["amount"] == 42  # brand-new key survives


class TestMergeBucketPruned:
    N_BUCKETS = 16

    def _setup(self, spark, tmp_path):
        path = str(tmp_path / "cum")
        cum = spark.createDataFrame(_cum_rows(), ["token", "amount", "n"])
        agg = cum.groupBy("token").agg(
            F.sum("amount").alias("amount"), F.sum("n").alias("n")
        )
        write_key_bucketed(agg, path, "token", n_buckets=self.N_BUCKETS)
        return path, cum

    def test_merge_equals_full_and_untouched_buckets_intact(
        self, spark, tmp_path
    ):
        path, hist = self._setup(spark, tmp_path)
        before = _snapshot(path)
        day = spark.createDataFrame(
            [(5, 7, 1), (1000, 42, 1)], ["token", "amount", "n"]
        )
        touched = merge_additive_bucket_pruned(
            path, day, ["token"], ["amount", "n"], n_buckets=self.N_BUCKETS
        )
        assert 1 <= len(touched) <= 2
        after = _snapshot(path)

        # untouched bucket dirs: every file byte- and mtime-identical
        touched_dirs = {f"key_bucket={b}" for b in touched}
        for rel, sig in before.items():
            if rel.split(os.sep)[0] not in touched_dirs:
                assert after[rel] == sig, f"untouched file rewritten: {rel}"

        got = (
            spark.read.parquet(path)
            .drop("key_bucket")
            .select("token", "amount", "n")
        )
        want = hist.unionByName(day).groupBy("token").agg(
            F.sum("amount").alias("amount"), F.sum("n").alias("n")
        )
        assert got.subtract(want).count() == 0
        assert want.subtract(got).count() == 0

    def test_two_days_accumulate(self, spark, tmp_path):
        path, hist = self._setup(spark, tmp_path)
        d1 = spark.createDataFrame([(7, 100, 1)], ["token", "amount", "n"])
        d2 = spark.createDataFrame([(7, 11, 1)], ["token", "amount", "n"])
        merge_additive_bucket_pruned(
            path, d1, ["token"], ["amount", "n"], n_buckets=self.N_BUCKETS
        )
        merge_additive_bucket_pruned(
            path, d2, ["token"], ["amount", "n"], n_buckets=self.N_BUCKETS
        )
        row = (
            spark.read.parquet(path)
            .filter(F.col("token") == 7)
            .collect()[0]
        )
        assert row["amount"] == 7 * 10 + 100 + 11
        assert row["n"] == 3

    def test_bootstrap_from_nonexistent_path(self, spark, tmp_path):
        """First-ever merge: the cumulative path does not exist yet —
        the bucket glob finds nothing and the day's totals create the
        layout."""
        path = str(tmp_path / "brand_new")
        day = spark.createDataFrame(
            [(1, 10, 1), (2, 20, 1)], ["token", "amount", "n"]
        )
        touched = merge_additive_bucket_pruned(
            path, day, ["token"], ["amount", "n"], n_buckets=self.N_BUCKETS
        )
        assert touched
        got = {r["token"]: r["amount"]
               for r in spark.read.parquet(path).collect()}
        assert got == {1: 10, 2: 20}

    def test_empty_day_is_noop(self, spark, tmp_path):
        path, _ = self._setup(spark, tmp_path)
        before = _snapshot(path)
        day = spark.createDataFrame([], "token bigint, amount bigint, n bigint")
        assert (
            merge_additive_bucket_pruned(
                path, day, ["token"], ["amount", "n"],
                n_buckets=self.N_BUCKETS,
            )
            == []
        )
        assert _snapshot(path) == before


class TestDistinctSketch:
    """Mergeable HLL distinct-count maintenance: fold ≡ full rebuild,
    estimates near-exact at small cardinality, chains across folds."""

    def _day(self, spark, lo, hi, key="k1"):
        from pyspark.sql import functions as F

        return spark.range(lo, hi).select(
            F.lit(key).alias("k"), F.col("id").alias("v")
        )

    def test_merge_equals_rebuild(self, spark):
        from datawaves_etl_airflow_spark.operators.incremental import (
            distinct_sketch_day,
            distinct_estimate,
            merge_distinct_sketch,
        )

        d1 = self._day(spark, 0, 500)
        d2 = self._day(spark, 250, 800)  # 250 overlap
        merged = merge_distinct_sketch(
            distinct_sketch_day(d1, ["k"], "v"),
            distinct_sketch_day(d2, ["k"], "v"),
            ["k"],
        )
        rebuilt = distinct_sketch_day(d1.unionByName(d2), ["k"], "v")
        got = distinct_estimate(merged, ["k"]).collect()[0]["n_distinct"]
        want = distinct_estimate(rebuilt, ["k"]).collect()[0]["n_distinct"]
        # union forces dense-HLL mode while a direct build may stay
        # sparse, so fold ≡ rebuild holds at the ERROR-BOUND level
        # (~1.6% rse at lg_k=12), not bit level
        assert abs(got - want) / want < 0.03
        assert abs(got - 800) / 800 < 0.05
        assert abs(want - 800) / 800 < 0.05

    def test_chained_folds_and_multiple_keys(self, spark):
        from datawaves_etl_airflow_spark.operators.incremental import (
            distinct_sketch_day,
            distinct_estimate,
            merge_distinct_sketch,
        )

        cum = distinct_sketch_day(self._day(spark, 0, 100), ["k"], "v")
        for lo in (100, 200, 300):
            day = self._day(spark, lo, lo + 100).unionByName(
                self._day(spark, 0, 50, key="k2")
            )
            cum = merge_distinct_sketch(
                cum, distinct_sketch_day(day, ["k"], "v"), ["k"]
            )
        est = {
            r["k"]: r["n_distinct"]
            for r in distinct_estimate(cum, ["k"]).collect()
        }
        assert abs(est["k1"] - 400) / 400 < 0.05
        assert abs(est["k2"] - 50) / 50 < 0.05
