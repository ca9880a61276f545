"""Sampling / dataset-partitioning operators (operators.sampling)."""

from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators import sampling

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


class TestAssignSplit:
    def test_fractions_and_determinism(self, spark):
        d = sampling.assign_split(_docs(spark))
        counts = {r["split"]: r["n"] for r in
                  d.groupBy("split").agg(F.count("*").alias("n")).collect()}
        n = sum(counts.values())
        assert n == 500
        # 75/12.5/12.5 nominal; binomial noise at n=500 stays well inside
        assert 0.65 <= counts["train"] / n <= 0.85
        assert 0.06 <= counts["val"] / n <= 0.20
        assert 0.06 <= counts["test"] / n <= 0.20
        # membership is a pure function of the id: repartitioning the
        # input must not move any row between splits
        again = sampling.assign_split(_docs(spark).repartition(7))
        assert (
            d.select("doc_id", "split")
            .exceptAll(again.select("doc_id", "split"))
            .count()
            == 0
        )

    def test_boundaries_partition_the_corpus(self, spark):
        d = sampling.assign_split(_docs(spark))
        assert d.filter(F.col("split").isNull()).count() == 0
        assert d.count() == _docs(spark).count()


class TestSampleByHash:
    def test_subset_and_stable(self, spark):
        docs = _docs(spark)
        s64 = sampling.sample_by_hash(docs, "doc_id", 64)
        s128 = sampling.sample_by_hash(docs, "doc_id", 128)
        n64, n128 = s64.count(), s128.count()
        # nominal 125 and 250 of 500
        assert 80 <= n64 <= 170
        assert 190 <= n128 <= 310
        # monotone: a smaller keep-fraction is a subset of a larger one
        assert s64.join(s128, "doc_id", "left_anti").count() == 0


def _order():
    return [F.col("n_chars").desc(), F.col("doc_id").asc()]


class TestCapPerGroup:
    def test_cap_applied(self, spark):
        capped = sampling.cap_per_group(_docs(spark), "source", _order(), 10)
        per = capped.groupBy("source").agg(F.count("*").alias("n"))
        assert per.filter(F.col("n") > 10).count() == 0
        # rank is dense 1..min(n, k) per group
        assert capped.filter(F.col("rk") > 10).count() == 0

    def test_prefiltered_identical_to_plain(self, spark):
        docs = _docs(spark)
        plain = sampling.cap_per_group(docs, "source", _order(), 7)
        salted = sampling.cap_per_group_prefiltered(
            docs, "source", _order(), 7, id_col="doc_id", salt_buckets=4
        )
        cols = ["doc_id", "source", "n_chars", "rk"]
        assert (
            plain.select(*cols).exceptAll(salted.select(*cols)).count() == 0
        )
        assert plain.count() == salted.count()
