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


class TestKnnLabelPredict:
    def test_matches_naive_numpy_leave_one_out(self, spark):
        import numpy as np

        from datawaves_etl_airflow_spark.operators.similarity import (
            knn_label_predict,
        )

        rng = np.random.default_rng(5)
        n, dim = 60, 8
        X = rng.normal(size=(n, dim))
        labels = (rng.integers(0, 3, size=n)).astype(int)
        vecs = spark.createDataFrame(
            [(i, [float(x) for x in X[i]], int(labels[i])) for i in range(n)],
            "vec_id long, embedding array<double>, label long",
        )
        qs = spark.createDataFrame(
            [
                (i, [float(x) for x in X[i]], int(labels[i]))
                for i in range(20)
            ],
            "query_id long, query_vec array<double>, true_label long",
        )
        got = {
            r["query_id"]: (r["pred_label"], r["correct"])
            for r in knn_label_predict(vecs, qs, k=5).collect()
        }
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ Xn.T
        for q in range(20):
            order = sorted(
                (i for i in range(n) if i != q),
                key=lambda i: (-sims[q, i], i),
            )[:5]
            counts: dict[int, int] = {}
            for i in order:
                counts[labels[i]] = counts.get(labels[i], 0) + 1
            pred = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            assert got[q] == (pred, pred == labels[q]), q

    def test_self_vector_excluded(self, spark):
        """A query identical to a corpus vector must not vote for
        itself: with k=1 the prediction comes from the nearest OTHER
        vector."""
        from datawaves_etl_airflow_spark.operators.similarity import (
            knn_label_predict,
        )

        vecs = spark.createDataFrame(
            [(0, [1.0, 0.0], 7), (1, [0.9, 0.1], 8), (2, [-1.0, 0.0], 9)],
            "vec_id long, embedding array<double>, label long",
        )
        qs = spark.createDataFrame(
            [(0, [1.0, 0.0], 7)],
            "query_id long, query_vec array<double>, true_label long",
        )
        row = knn_label_predict(vecs, qs, k=1).first()
        assert row["pred_label"] == 8 and row["correct"] is False
