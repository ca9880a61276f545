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
    _resolve_ivf_index,
    ivf_search_index,
    ivf_topk,
    read_ivf_index_meta,
    vacuum_ivf_index,
    write_ivf_index,
)

DIM = 16


def _data_root(spark, index_path):
    """The manifest-resolved versions/ dir holding cells/centroids."""
    return _resolve_ivf_index(spark, index_path)[1]


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
        root = _data_root(spark, index_path)
        centroids = spark.read.parquet(root + "/centroids")
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
            for d in glob.glob(root + "/cells/batch=*/centroid_id=*")
        }
        assert probe_ids < all_dirs  # strict subset: pruning possible

        cells = spark.read.parquet(root + "/cells").filter(
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
        a = spark.read.parquet(_data_root(spark, index_path) + "/cells").select(
            "vec_id", "centroid_id"
        )
        b = spark.read.parquet(_data_root(spark, p2) + "/cells").select(
            "vec_id", "centroid_id"
        )
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


class TestPointerFlipRebuild:
    """IVF rebuilds commit by manifest pointer flip (round-4 ADVICE:
    the in-place cells-then-centroids overwrite had a torn window that
    scored new-quantizer cells against old centroids — silently wrong
    neighbors). A crash anywhere mid-rebuild now leaves the old index
    fully live."""

    def test_crash_before_publish_keeps_old_index_consistent(
        self, spark, index_path, monkeypatch
    ):
        from datawaves_etl_airflow_spark.sources import manifest as mf

        want = {
            (r["query_id"], r["match_id"], r["rank"])
            for r in ivf_search_index(
                _queries(spark), index_path, nprobe=2, k=5
            ).collect()
        }
        real = mf.create_text_exclusive
        state = {"armed": True}

        def crashing(spark_, path_, content):
            if state["armed"] and "manifest-" in path_:
                state["armed"] = False
                raise RuntimeError("injected crash before index commit")
            return real(spark_, path_, content)

        monkeypatch.setattr(mf, "create_text_exclusive", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            write_ivf_index(
                _vectors(spark, n=100, seed=99), index_path,
                n_centroids=4, n_iters=1,
            )
        # probes answer IDENTICALLY to before the crashed rebuild:
        # centroids and cells are still the same committed version
        got = {
            (r["query_id"], r["match_id"], r["rank"])
            for r in ivf_search_index(
                _queries(spark), index_path, nprobe=2, k=5
            ).collect()
        }
        assert got == want
        # the retry commits the new version
        write_ivf_index(
            _vectors(spark, n=100, seed=99), index_path,
            n_centroids=4, n_iters=1,
        )
        meta = read_ivf_index_meta(spark, index_path)
        assert meta["n_centroids"] == 4

    def test_rebuild_then_vacuum_drops_old_version(
        self, spark, index_path
    ):
        old_root = _data_root(spark, index_path)
        write_ivf_index(
            _vectors(spark, n=100, seed=99), index_path,
            n_centroids=4, n_iters=1,
        )
        assert os.path.isdir(old_root)
        deleted = vacuum_ivf_index(spark, index_path)
        assert any(old_root.rstrip("/") in p for p in deleted)
        assert not os.path.exists(old_root)
        got = ivf_search_index(_queries(spark), index_path, nprobe=2, k=5)
        assert got.count() > 0


class TestMultiProbeLsh:
    def test_multi_probe_recall_in_neardup_regime(self, spark):
        """Sign-LSH's honest domain is the near-dup regime (SCALE.md):
        queries are PLANTED perturbations of corpus vectors. There,
        multi-probe recall of the planted neighbor dominates
        single-bucket recall and covers every ≤1-bit signature
        disagreement; returned cosines are exact."""
        import random as _random

        from datawaves_etl_airflow_spark.operators.similarity import (
            lsh_topk,
        )

        rng = _random.Random(5)
        base = [
            [rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(300)
        ]
        vecs = spark.createDataFrame(
            list(enumerate(base)), "vec_id long, embedding array<double>"
        )
        # query q probes the perturbed copy of corpus vector q
        qs = spark.createDataFrame(
            [
                (i, [x + rng.uniform(-0.02, 0.02) for x in base[i]])
                for i in range(0, 40)
            ],
            "query_id long, query_vec array<double>",
        )

        def planted_recall(approx):
            hits = {
                r["query_id"]
                for r in approx.collect()
                if r["match_id"] == r["query_id"]
            }
            return len(hits) / 40

        single = lsh_topk(vecs, qs, dim=DIM, k=3, n_planes=8)
        multi = lsh_topk(
            vecs, qs, dim=DIM, k=3, n_planes=8, multi_probe=True
        )
        r_single, r_multi = planted_recall(single), planted_recall(multi)
        assert r_multi >= r_single
        assert r_multi > 0.9  # ≤1-bit flips covered by construction
        # cosines are exact true distances (rerank, not approximation)
        row = multi.filter(F.col("match_id") == F.col("query_id")).first()
        assert row["cosine_sim"] > 0.99

    def test_multi_probe_adds_no_extra_shuffle(self, spark):
        """The probe explode needs NO candidate dedup (probed buckets
        are pairwise distinct, a vector lives in exactly one) — so the
        multi-probe plan must have exactly the single-probe plan's
        exchanges, and the output must still be pair-unique."""
        from datawaves_etl_airflow_spark.operators.similarity import lsh_topk

        vecs = _vectors(spark, n=100, seed=2)
        qs = _queries(spark, n=4, seed=3)

        def exchanges(df):
            return df._jdf.queryExecution().executedPlan().toString().count(
                "Exchange"
            )

        single = lsh_topk(vecs, qs, dim=DIM, k=50, n_planes=4)
        multi = lsh_topk(
            vecs, qs, dim=DIM, k=50, n_planes=4, multi_probe=True
        )
        assert exchanges(multi) == exchanges(single)
        seen = [
            (r["query_id"], r["match_id"]) for r in multi.collect()
        ]
        assert len(seen) == len(set(seen))
