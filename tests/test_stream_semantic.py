"""Streaming EMBEDDING near-dup ingest (the semantic twin of
test_stream_neardup.py): each micro-batch assigns against the stored
IVF quantizer, dedups against the index cells AND everything accepted
before it, folds survivors back via append_ivf_index; replays no-op.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.similarity import (
    write_ivf_index,
)
from datawaves_etl_airflow_spark.streaming.ingest import (
    make_semantic_ingest,
    stream_semantic_ingest,
)

# corpus spans two orthogonal directions; batch vectors are either
# tiny perturbations of an existing direction (cos ≈ 0.995 → dup) or
# new orthogonal axes (cos 0 → novel)
CORPUS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
]
B1 = [
    # near-dup of corpus vec 1 → dropped vs the index
    (10, [0.995, 0.0998, 0.0, 0.0]),
    # novel within-batch near-dup pair → keep 11, drop 12 (greedy)
    (11, [0.0, 0.0, 1.0, 0.0]),
    (12, [0.0, 0.0, 0.995, 0.0998]),
    # orthogonal singleton → kept
    (13, [0.0, 0.0, 0.0, 1.0]),
]
B2 = [
    # near-dup of batch-1 SURVIVOR 11 → dropped (the index grew)
    (20, [0.0, 0.0, 0.99, 0.141]),
    # below threshold against everything accepted → kept
    (21, [0.6, 0.8, 0.0, 0.0]),
]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _accepted_ids(spark, accepted_path):
    return sorted(
        r["vec_id"]
        for r in spark.read.parquet(
            os.path.join(accepted_path, "docs")
        ).collect()
    )


@pytest.fixture()
def paths(spark, tmp_path):
    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    write_ivf_index(_df(spark, CORPUS), idx, n_centroids=2, n_iters=1)
    return idx, acc


class TestSemanticIngestBatches:
    def test_two_batches_dedup_against_growing_index(self, spark, paths):
        idx, acc = paths
        fn = make_semantic_ingest(idx, acc, threshold=0.9)
        fn(_df(spark, B1), 0)
        assert _accepted_ids(spark, acc) == [11, 13]
        fn(_df(spark, B2), 1)
        # 20 caught by batch-1 survivor 11 via the APPENDED index rows
        assert _accepted_ids(spark, acc) == [11, 13, 21]
        # the index holds corpus + every survivor, no duplicates
        from datawaves_etl_airflow_spark.operators.similarity import (
            _resolve_ivf_index,
        )

        root = _resolve_ivf_index(spark, idx)[1]
        stored = sorted(
            r["vec_id"]
            for r in spark.read.parquet(root + "/cells").collect()
        )
        assert stored == [1, 2, 11, 13, 21]

    def test_replayed_batch_is_noop(self, spark, paths):
        idx, acc = paths
        fn = make_semantic_ingest(idx, acc, threshold=0.9)
        fn(_df(spark, B1), 0)
        fn(_df(spark, B1), 0)  # foreachBatch at-least-once replay
        assert _accepted_ids(spark, acc) == [11, 13]

    def test_foreign_checkpoint_raises(self, spark, paths):
        idx, acc = paths
        fn = make_semantic_ingest(idx, acc, threshold=0.9, checkpoint="/a")
        fn(_df(spark, B1), 0)
        fn2 = make_semantic_ingest(
            idx, acc, threshold=0.9, checkpoint="/b"
        )
        with pytest.raises(ValueError, match="fresh checkpoint"):
            fn2(_df(spark, B2), 0)

    def test_null_vector_is_kept_singleton(self, spark, paths):
        idx, acc = paths
        fn = make_semantic_ingest(idx, acc, threshold=0.9)
        rows = _df(spark, [(40, [0.995, 0.0998, 0.0, 0.0])]).unionByName(
            spark.createDataFrame(
                [(41,)], "vec_id long"
            ).select("vec_id", F.lit(None).cast("array<double>").alias("embedding"))
        )
        fn(rows, 0)
        # 40 dups corpus vec 1 and drops; the NULL row is unscoreable
        # and passes through — semantic_dedup's kept-singleton contract
        assert _accepted_ids(spark, acc) == [41]

    def test_two_level_index_batch_assigns_hierarchically(
        self, spark, tmp_path
    ):
        """The stream probes a 2-level index with the index's own
        geometry: near-dups of corpus members still drop (assignment
        routes them to the member's fine cell), novel rows survive and
        fold."""
        idx = str(tmp_path / "idx2l")
        acc = str(tmp_path / "acc2l")
        corpus = _df(
            spark,
            [
                (1, [1.0, 0.0, 0.0, 0.0]),
                (2, [0.0, 1.0, 0.0, 0.0]),
                (3, [0.0, 0.0, 1.0, 0.0]),
                (4, [0.0, 0.0, 0.0, 1.0]),
            ],
        )
        write_ivf_index(corpus, idx, n_centroids=2, n_iters=1, n_fine=2)
        fn = make_semantic_ingest(idx, acc, threshold=0.9)
        batch = _df(
            spark,
            [
                (30, [0.995, 0.0998, 0.0, 0.0]),  # dups corpus vec 1
                (31, [0.5, 0.5, 0.5, 0.5]),  # cos 0.5 to all → novel
            ],
        )
        fn(batch, 0)
        assert _accepted_ids(spark, acc) == [31]


class TestSemanticIngestStreaming:
    def test_end_to_end_file_stream_matches_batch_path(
        self, spark, paths, tmp_path
    ):
        """Stream ≡ batch: the same rows through a real file-source
        stream produce exactly the ids the direct batch path accepts."""
        idx, acc = paths
        src = tmp_path / "src"
        src.mkdir()
        with open(src / "b.jsonl", "w") as f:
            for i, v in B1:
                f.write(json.dumps({"vec_id": i, "embedding": v}) + "\n")
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).json(str(src))
        q = stream_semantic_ingest(
            stream,
            idx,
            acc,
            checkpoint=str(tmp_path / "ckpt"),
            threshold=0.9,
            available_now=True,
        )
        q.awaitTermination(120)
        assert _accepted_ids(spark, acc) == [11, 13]

    def test_checkpoint_restart_replays_as_noop(
        self, spark, paths, tmp_path
    ):
        """Restarting the SAME checkpoint over the same source files
        re-delivers nothing new — accepted store and index unchanged
        (the exactly-once contract end-to-end, not just at the
        _apply seam)."""
        idx, acc = paths
        src = tmp_path / "src"
        src.mkdir()
        with open(src / "b.jsonl", "w") as f:
            for i, v in B1:
                f.write(json.dumps({"vec_id": i, "embedding": v}) + "\n")
        ckpt = str(tmp_path / "ckpt")
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).json(str(src))
        q = stream_semantic_ingest(
            stream, idx, acc, checkpoint=ckpt, threshold=0.9,
            available_now=True,
        )
        q.awaitTermination(120)
        before = _accepted_ids(spark, acc)
        stream2 = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).json(str(src))
        q2 = stream_semantic_ingest(
            stream2, idx, acc, checkpoint=ckpt, threshold=0.9,
            available_now=True,
        )
        q2.awaitTermination(120)
        assert _accepted_ids(spark, acc) == before == [11, 13]


class TestSemanticIngestInt8Index:
    def test_batch_dedups_against_int8_cells(self, spark, tmp_path):
        """The ingest scores batch-vs-corpus over the DEQUANTIZED int8
        cells: a 0.995-cosine near-dup of a corpus vector still drops
        (quantization moves cosine ≤ ~1 LSB/dim, far from the 0.9
        threshold), novel rows survive and fold back quantized."""
        idx = str(tmp_path / "idx8")
        acc = str(tmp_path / "acc8")
        write_ivf_index(
            _df(spark, CORPUS), idx, n_centroids=2, n_iters=1,
            cell_storage="int8",
        )
        fn = make_semantic_ingest(idx, acc, threshold=0.9)
        fn(_df(spark, B1), 0)
        assert _accepted_ids(spark, acc) == [11, 13]
        from datawaves_etl_airflow_spark.operators.similarity import (
            _resolve_ivf_index,
        )

        root = _resolve_ivf_index(spark, idx)[1]
        stored = spark.read.parquet(root + "/cells")
        assert set(stored.columns) >= {"q", "scale"}  # folds quantized
        fn(_df(spark, B2), 1)
        assert _accepted_ids(spark, acc) == [11, 13, 21]


class TestRetryCrashWindow:
    def test_retry_after_fold_before_marker_preserves_index(
        self, spark, paths
    ):
        """The review-found failure mode: a foreachBatch retry landing
        AFTER the index fold committed but BEFORE the replay marker.
        Without self-id exclusion the retry sees the previous
        attempt's survivors in the index, drops them as duplicates of
        THEMSELVES at cosine 1.0, and the same-token overwrite erases
        the fold — index and accepted store permanently diverge. With
        the exclusion the retry re-accepts the same survivors (docs
        re-appended — the documented crash window, reconcilable on
        vec_id) and the idempotent fold lands the same cells."""
        import shutil

        idx, acc = paths
        fn = make_semantic_ingest(idx, acc, threshold=0.9)
        fn(_df(spark, B1), 0)
        # simulate the crash strictly between the fold and the marker:
        # the fold is durable, the marker never landed
        shutil.rmtree(os.path.join(acc, "_manifests"))
        fn(_df(spark, B1), 0)  # the restart's redelivery
        from datawaves_etl_airflow_spark.operators.similarity import (
            _resolve_ivf_index,
        )

        root = _resolve_ivf_index(spark, idx)[1]
        stored = sorted(
            r["vec_id"]
            for r in spark.read.parquet(root + "/cells").collect()
        )
        assert stored == [1, 2, 11, 13]  # fold intact, no duplicates
        # docs: same survivor set (the documented re-append window
        # may duplicate rows; ids reconcile)
        assert sorted(set(_accepted_ids(spark, acc))) == [11, 13]

    def test_retry_crash_window_int8_storage(self, spark, tmp_path):
        """The same crash window over an int8 index (second review
        pass): the retry's corpus leg anti-joins out the ENTIRE batch
        id set, so batch rows are never scored against their own
        dequantized fold copies — the refolded survivor set is
        bit-identical to the first attempt's on every storage tier."""
        import shutil

        idx = str(tmp_path / "idx8r")
        acc = str(tmp_path / "acc8r")
        write_ivf_index(
            _df(spark, CORPUS), idx, n_centroids=2, n_iters=1,
            cell_storage="int8",
        )
        fn = make_semantic_ingest(idx, acc, threshold=0.9)
        fn(_df(spark, B1), 0)
        shutil.rmtree(os.path.join(acc, "_manifests"))
        fn(_df(spark, B1), 0)
        from datawaves_etl_airflow_spark.operators.similarity import (
            _resolve_ivf_index,
        )

        root = _resolve_ivf_index(spark, idx)[1]
        stored = sorted(
            r["vec_id"]
            for r in spark.read.parquet(root + "/cells").collect()
        )
        assert stored == [1, 2, 11, 13]
        assert sorted(set(_accepted_ids(spark, acc))) == [11, 13]


class TestSemanticIngestPqIndex:
    def test_batch_dedups_against_pq_cells(self, spark, tmp_path):
        """The ingest scores batch-vs-corpus over the RECONSTRUCTED pq
        cells (the r9 tier): with codebooks trained on this tiny
        corpus the corpus rows reconstruct exactly (k-means with one
        cluster per point), so the near-dup of a corpus vector drops
        and novel rows survive and fold back AS CODES.

        Deliberately NOT asserted: batch-2-vs-batch-1-survivor catches
        (the raw/int8 pin). A folded vector outside the codebooks'
        training distribution reconstructs at codebook granularity, so
        that recall is codebook-coverage-dependent — the PQ form of
        the quantizer-doesn't-adapt contract (schedule a rebuild on
        drift; exactness-critical dedup uses raw/int8 cells or the
        rerank probe)."""
        idx = str(tmp_path / "idxpq")
        acc = str(tmp_path / "accpq")
        write_ivf_index(
            _df(spark, CORPUS), idx, n_centroids=2, n_iters=1,
            cell_storage="pq", pq_m=2, pq_k=4,
        )
        fn = make_semantic_ingest(idx, acc, threshold=0.9)
        fn(_df(spark, B1), 0)
        # near-dup of corpus vec 1 dropped over the reconstruction;
        # within-batch pair (11, 12) resolved on RAW vectors (keep 11)
        assert _accepted_ids(spark, acc) == [11, 13]
        from datawaves_etl_airflow_spark.operators.similarity import (
            _resolve_ivf_index,
        )

        root = _resolve_ivf_index(spark, idx)[1]
        stored = spark.read.parquet(root + "/cells")
        assert "codes" in stored.columns  # folds as codes
        # batch 2: vec 21 is below threshold against every corpus
        # reconstruction and every raw within-batch peer -> survives
        fn(_df(spark, [B2[1]]), 1)
        assert _accepted_ids(spark, acc) == [11, 13, 21]
