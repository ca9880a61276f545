"""Round-10 hardening pins — the r9 ADVICE findings:

1. train_pq_codebooks excludes NULL embeddings from seeding and
   assignment: one NULL seed used to yield a NULL codeword, and the
   PQ path's argMIN convention (array_min over struct(dist, cid))
   ranks a NULL-distance struct FIRST, silently collapsing every
   subspace to a single codeword (train_centroids' argMAX never picks
   a NULL-sim struct, which is why only the PQ path was exposed);
2. maintain_ivf_index's skew list sorts None-safely: NULL-vector rows
   live in a NULL centroid_id cell (hive default partition), and if
   that cell crossed the skew watermark alongside a numeric cell the
   naive tuple sort raised TypeError (None < int) and crashed the
   scheduled job;
3. semantic_decontaminate raises a clear ValueError up front for a
   non-numeric benchmark id column (the smaller-id tiebreak negates
   the id inside an argmax struct, which only type-checks for numeric
   ids) instead of an AnalysisException deep inside the plan;
4. append_bm25_index / make_bm25_ingest now document the append-only /
   new-docs-only contract (doc identity is unguardable across batch
   tokens — re-ingesting a doc_id double-counts postings/df/N/avgdl;
   updates require a rebuild). Doc-only: the replay guards themselves
   are pinned in test_bm25_index.py / test_stream_bm25.py.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.similarity import (
    maintain_ivf_index,
    semantic_decontaminate,
    train_pq_codebooks,
    write_ivf_index,
)

DIM = 16


def _vectors(spark, n=30, seed=11, offset=0):
    rng = random.Random(seed)
    rows = [
        (i + offset, [rng.uniform(-1, 1) for _ in range(DIM)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


class TestPqNullTraining:
    def test_null_vector_never_collapses_codebooks(self, spark):
        """pq_k >= corpus size forces EVERY row into the seed set —
        pre-fix the NULL row seeded a NULL codeword and the argmin
        collapsed all assignments onto it; post-fix training must be
        bit-identical to training on the valid rows alone, and every
        subspace must keep more than one codeword."""
        valid = _vectors(spark, n=30)
        nulls = spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<double>"
        )
        kw = dict(pq_m=8, pq_k=31, n_iters=2)
        with_null = train_pq_codebooks(valid.union(nulls), **kw)
        without = train_pq_codebooks(valid, **kw)
        got = sorted(
            (r["subspace_id"], r["code_id"], tuple(r["codeword"]))
            for r in with_null.collect()
        )
        want = sorted(
            (r["subspace_id"], r["code_id"], tuple(r["codeword"]))
            for r in without.collect()
        )
        assert got == want
        per_sub = {}
        for sub, _cid, cw in got:
            per_sub.setdefault(sub, set()).add(cw)
            assert all(x is not None for x in cw)  # no NULL codewords
        assert all(len(cws) > 1 for cws in per_sub.values())  # no collapse

    def test_pq_index_build_with_null_rows_probes_fine(
        self, spark, tmp_path
    ):
        """End-to-end: a pq index built over a corpus WITH a NULL row
        (the kept-singleton corpus state) still ranks correctly —
        the NULL row lands in the NULL cell, never in a codebook."""
        from datawaves_etl_airflow_spark.operators.similarity import (
            brute_force_topk,
            ivf_search_index,
        )

        valid = _vectors(spark, n=60)
        nulls = spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<double>"
        )
        p = str(tmp_path / "pqnull")
        write_ivf_index(
            valid.union(nulls), p, n_centroids=4, n_iters=1,
            cell_storage="pq", pq_m=8, pq_k=32,
        )
        q = valid.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got = ivf_search_index(q, p, nprobe=4, k=5, rerank=valid,
                               rerank_factor=12)
        want = brute_force_topk(valid, q, k=5)
        cols = ["query_id", "match_id", "rank", "cosine_sim"]
        assert got.select(cols).exceptAll(want.select(cols)).count() == 0
        assert want.select(cols).exceptAll(got.select(cols)).count() == 0


class TestMaintainNullCellSkew:
    def test_null_and_numeric_skewed_cells_sort_safely(
        self, spark, tmp_path
    ):
        """Both the NULL cell AND a numeric crowd cell cross the skew
        watermark: the report must come back (pre-fix: TypeError from
        sorted() on None < int) with the NULL cell listed LAST."""
        crowd = spark.range(0, 60).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(1.0) for _ in range(DIM)]).alias("embedding"),
        )
        nulls = spark.range(1000, 1100).select(
            F.col("id").alias("vec_id"),
            F.lit(None).cast("array<double>").alias("embedding"),
        )
        p = str(tmp_path / "ivfnullskew")
        write_ivf_index(crowd.union(nulls), p, n_centroids=4, n_iters=1)
        rep = maintain_ivf_index(spark, p, max_cell_ratio=1.2)
        # 160 rows / 4 cells = 40 balanced; crowd cell 60 and NULL cell
        # 100 both exceed 1.2 x 40
        flagged = rep["skewed_cells"]
        assert any(c is None for c, _n in flagged)
        assert any(c is not None for c, _n in flagged)
        assert flagged[-1][0] is None  # None-safe key sorts NULL last
        assert rep["rebuild_recommended"] is True


class TestDecontaminateIdTypeGuard:
    def test_non_numeric_bench_id_raises_value_error(self, spark):
        corpus = _vectors(spark, n=5)
        bench = spark.createDataFrame(
            [("b1", [1.0] * DIM)], "vec_id string, embedding array<double>"
        )
        with pytest.raises(ValueError, match="must be numeric"):
            semantic_decontaminate(corpus, bench)
