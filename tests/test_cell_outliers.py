"""cell_outliers (prototype-distance quality gate): every input row
gets exactly one decision, assignment is argmax-cosine with the
engine's tie rule (smaller centroid id), the flag compares the RAW
similarity against min_sim, and unscorable rows (NULL or all-zero
vector) are flagged outliers with a NULL cell rather than silently
kept."""

from __future__ import annotations

import pytest

from datawaves_etl_airflow_spark.operators.similarity import cell_outliers

CENTROIDS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
]
CENTROID_SCHEMA = "centroid_id int, centroid array<double>"
VEC_SCHEMA = "vec_id long, embedding array<float>"


def _run(spark, rows, min_sim, cents=CENTROIDS):
    out = cell_outliers(
        spark.createDataFrame(rows, VEC_SCHEMA),
        spark.createDataFrame(cents, CENTROID_SCHEMA),
        min_sim=min_sim,
    )
    return {r["vec_id"]: r for r in out.collect()}


class TestAssignment:
    def test_argmax_and_flag(self, spark):
        rows = [
            (10, [1.0, 0.0, 0.0, 0.0]),   # on centroid 1: sim 1.0
            (11, [0.1, 1.0, 0.0, 0.0]),   # near centroid 2
            (12, [0.0, 0.0, 1.0, 0.0]),   # orthogonal to both: sim 0.0
        ]
        d = _run(spark, rows, min_sim=0.5)
        assert (d[10]["centroid_id"], d[10]["is_outlier"]) == (1, False)
        assert (d[11]["centroid_id"], d[11]["is_outlier"]) == (2, False)
        assert d[12]["is_outlier"] is True
        assert d[12]["centroid_sim"] == 0.0

    def test_tie_breaks_to_smaller_centroid_id(self, spark):
        # equidistant from both axis prototypes
        d = _run(spark, [(10, [1.0, 1.0, 0.0, 0.0])], min_sim=0.1)
        assert d[10]["centroid_id"] == 1

    def test_one_decision_per_input_row(self, spark):
        rows = [(i, [1.0, float(i), 0.0, 0.0]) for i in range(20)]
        d = _run(spark, rows, min_sim=0.5)
        assert sorted(d) == list(range(20))


class TestUnscorableRows:
    def test_null_vector_is_flagged_with_null_cell(self, spark):
        d = _run(spark, [(10, [1.0, 0.0, 0.0, 0.0]), (11, None)], min_sim=0.5)
        assert d[11]["is_outlier"] is True
        assert d[11]["centroid_id"] is None
        assert d[11]["centroid_sim"] is None
        assert d[10]["is_outlier"] is False

    def test_zero_vector_is_flagged_with_null_cell(self, spark):
        # cosine(0, x) is 0/0 for every prototype — the norm guard must
        # route zero vectors through the same NULL-cell branch as NULL
        # vectors, never report an argmax-fallthrough centroid_id
        d = _run(
            spark,
            [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 0.0, 0.0, 0.0])],
            min_sim=0.5,
        )
        assert d[11]["is_outlier"] is True
        assert d[11]["centroid_id"] is None
        assert d[11]["centroid_sim"] is None
        assert d[10]["is_outlier"] is False


class TestThreshold:
    def test_flag_uses_raw_similarity_not_rounded(self, spark):
        # sim = cos(45°) ≈ 0.7071068…; a min_sim a hair above the raw
        # value must flag, a hair below must keep — independent of the
        # 6-dp display rounding of centroid_sim.
        row = [(10, [1.0, 1.0, 0.0, 0.0])]
        assert _run(spark, row, min_sim=0.70712)[10]["is_outlier"] is True
        assert _run(spark, row, min_sim=0.70710)[10]["is_outlier"] is False

    def test_boundary_is_strict_less_than(self, spark):
        # sim exactly 1.0 with min_sim 1.0 → NOT an outlier (< is strict)
        d = _run(spark, [(10, [1.0, 0.0, 0.0, 0.0])], min_sim=1.0)
        assert d[10]["is_outlier"] is False
