"""Sketch-tier accuracy: approx aggregates within bound of exact."""

from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.queries.generic import (
    _events,
    x1_approx_aggregates,
)

SF = "/root/testdata/sf0.01"


class TestApproxAggregates:
    def test_within_tolerance_of_exact(self, spark):
        approx = {
            r["event_type"]: r
            for r in x1_approx_aggregates(spark, SF).collect()
        }
        exact = {
            r["event_type"]: r
            for r in _events(spark, SF)
            .groupBy("event_type")
            .agg(
                F.countDistinct("user_id").alias("users"),
                F.expr("percentile(value, 0.5)").alias("median"),
            )
            .collect()
        }
        assert set(approx) == set(exact)
        for et, ex in exact.items():
            ap = approx[et]
            # HLL++ at rsd=0.02: allow 5× the nominal error
            assert abs(ap["approx_users"] - ex["users"]) <= max(
                0.1 * ex["users"], 5
            )
            # percentile_approx with 10k accuracy on 10k rows ≈ exact
            assert abs(ap["approx_median"] - ex["median"]) <= max(
                0.05 * abs(ex["median"]), 1.0
            )
