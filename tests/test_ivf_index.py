"""Persisted IVF index: identical results to the in-session ivf_topk
(same deterministic quantizer), with the probe physically reading only
the probed centroid_id partitions."""

from __future__ import annotations

import glob
import os
import random

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.similarity import (
    ivf_search_index,
    ivf_topk,
    read_ivf_index_meta,
    write_ivf_index,
)

DIM = 16


def _vectors(spark, n=300, seed=11):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _queries(spark, n=6, seed=23):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "query_id long, query_vec array<double>"
    )


@pytest.fixture()
def index_path(spark, tmp_path):
    p = str(tmp_path / "ivf")
    write_ivf_index(_vectors(spark), p, n_centroids=8, n_iters=2)
    return p


class TestIvfIndex:
    def test_matches_in_session_ivf(self, spark, index_path):
        q = _queries(spark)
        got = ivf_search_index(q, index_path, nprobe=2, k=5)
        want = ivf_topk(
            _vectors(spark), q, n_centroids=8, nprobe=2, k=5, n_iters=2
        )
        cols = ["query_id", "match_id", "rank", "cosine_sim"]
        assert got.select(cols).exceptAll(want.select(cols)).count() == 0
        assert want.select(cols).exceptAll(got.select(cols)).count() == 0

    def test_probe_reads_only_probed_partitions(self, spark, index_path):
        """Execution-true pruning proof: the files actually read all
        belong to the probed centroid dirs, a strict subset of cells."""
        q = _queries(spark, n=2)
        meta = read_ivf_index_meta(spark, index_path)
        centroids = spark.read.parquet(index_path + "/centroids")
        from datawaves_etl_airflow_spark.operators.similarity import (
            dot,
            l2_normalize,
        )
        from pyspark.sql.window import Window

        qn = q.withColumn("_qv", l2_normalize(F.col("query_vec")))
        scored = qn.crossJoin(F.broadcast(centroids)).withColumn(
            "_sim", dot(F.col("_qv"), F.col("centroid"))
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("_sim").desc(), F.col("centroid_id").asc()
        )
        probe_ids = {
            r["centroid_id"]
            for r in scored.withColumn(
                "_pr", F.row_number().over(wq)
            )
            .filter(F.col("_pr") <= 2)
            .select("centroid_id")
            .distinct()
            .collect()
        }
        all_dirs = {
            int(os.path.basename(d).split("=")[1])
            for d in glob.glob(index_path + "/cells/centroid_id=*")
        }
        assert probe_ids < all_dirs  # strict subset: pruning possible

        cells = spark.read.parquet(index_path + "/cells").filter(
            F.col("centroid_id").isin(sorted(probe_ids))
        )
        read_files = {
            r["f"]
            for r in cells.select(
                F.input_file_name().alias("f")
            ).distinct().collect()
        }
        for f in read_files:
            cid = int(f.split("centroid_id=")[1].split("/")[0])
            assert cid in probe_ids
        assert meta["n_centroids"] == 8

    def test_missing_marker_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="no IVF index marker"):
            ivf_search_index(
                _queries(spark), str(tmp_path / "nope")
            )

    def test_rebuild_is_deterministic(self, spark, tmp_path, index_path):
        """Same corpus + params → bit-identical second index (the
        quantizer is hash-seeded, not rand-seeded)."""
        p2 = str(tmp_path / "ivf2")
        write_ivf_index(_vectors(spark), p2, n_centroids=8, n_iters=2)
        a = spark.read.parquet(index_path + "/cells").select(
            "vec_id", "centroid_id"
        )
        b = spark.read.parquet(p2 + "/cells").select(
            "vec_id", "centroid_id"
        )
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
