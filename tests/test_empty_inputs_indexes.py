"""Empty/degenerate inputs for the r4 index + export operators: cold
starts must work (an empty index is a valid day-0 state), and empty
batches must be no-ops, not crashes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.dedup import (
    append_minhash_index,
    dedup_against_index,
    duplicate_clusters_star,
    write_minhash_index,
)
from datawaves_etl_airflow_spark.operators.sampling import shuffle_shards
from datawaves_etl_airflow_spark.operators.similarity import (
    ivf_search_index,
    write_ivf_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestEmptyIndexInputs:
    def test_cold_start_empty_index_then_probe_and_grow(
        self, spark, tmp_path
    ):
        """Day-0: index built from ZERO docs; first batch self-dedups
        only, appends, and the second batch sees it."""
        p = str(tmp_path / "idx")
        write_minhash_index(_docs(spark, []), p)
        b1 = _docs(spark, [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
        ])
        pairs = dedup_against_index(b1, p, threshold=0.5)
        assert {(r.id_a, r.id_b) for r in pairs.collect()} == {(1, 2)}
        append_minhash_index(_docs(spark, [b1.collect()[0][:2]]), p)
        b2 = _docs(spark, [
            (3, "alpha beta gamma delta epsilon zeta eta theta!")
        ])
        got = dedup_against_index(b2, p, threshold=0.5)
        assert {(r.id_a, r.id_b) for r in got.collect()} == {(3, 1)}

    def test_empty_probe_batch(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        write_minhash_index(
            _docs(spark, [(1, "some corpus text here with words")]), p
        )
        assert dedup_against_index(_docs(spark, []), p).count() == 0

    def test_star_cc_empty_pairs(self, spark):
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        assert duplicate_clusters_star(pairs).count() == 0

    def test_shuffle_shards_empty(self, spark):
        out = shuffle_shards(_docs(spark, []), n_shards=4)
        assert out.count() == 0
        assert "shard_id" in out.columns


class TestDegenerateIvf:
    def test_fewer_vectors_than_centroids(self, spark, tmp_path):
        """n < n_centroids: the quantizer seeds from what exists; the
        probe still returns exact results."""
        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
            "vec_id long, embedding array<double>",
        )
        p = str(tmp_path / "ivf")
        write_ivf_index(vecs, p, n_centroids=8, n_iters=1)
        q = spark.createDataFrame(
            [(0, [1.0, 0.1])], "query_id long, query_vec array<double>"
        )
        got = ivf_search_index(q, p, nprobe=8, k=2).collect()
        assert [r["match_id"] for r in got] == [1, 3]
