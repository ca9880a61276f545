"""Sketch-tier accuracy: approx aggregates within bound of exact.

x1 is self-checking (it emits booleans asserting the sketch landed
inside tolerance, so the driver oracle can verify it with TRUE
literals); this test additionally recomputes the exact values
independently so the self-check itself is pinned.
"""

from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.queries.generic import (
    _events,
    x1_approx_aggregates,
)

SF = "/root/testdata/sf0.01"


class TestApproxAggregates:
    def test_self_check_green_and_exact_values_match(self, spark):
        rows = {
            r["event_type"]: r
            for r in x1_approx_aggregates(spark, SF).collect()
        }
        exact = {
            r["event_type"]: r
            for r in _events(spark, SF)
            .groupBy("event_type")
            .agg(
                F.countDistinct("user_id").alias("users"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }
        assert set(rows) == set(exact)
        for et, ex in exact.items():
            got = rows[et]
            # the compared projection carries the independently-exact
            # values...
            assert got["exact_users"] == ex["users"]
            assert got["n_rows"] == ex["n"]
            # ...and the sketch bounds must self-report green (this is
            # what the driver oracle asserts with TRUE literals)
            assert got["approx_users_ok"] is True
            assert got["approx_median_ok"] is True
