"""Streaming index retraction: a CDC delete feed / takedown queue
tombstones ids in a persisted index per micro-batch under the shared
replay contract — a retracted doc stops being retrievable at the
trigger after its event, not at the next rebuild."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.streaming.ingest import (
    make_retraction_ingest,
    stream_retraction_ingest,
)

DIM = 8


def _vecs(spark, n=120, seed=5):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _queries(spark):
    rng = random.Random(41)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(4)]
    return spark.createDataFrame(
        rows, "query_id long, query_vec array<double>"
    )


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "vec_id long")


@pytest.fixture()
def ivf_paths(spark, tmp_path):
    from datawaves_etl_airflow_spark.operators.similarity import (
        write_ivf_index,
    )

    idx = str(tmp_path / "rividx")
    st = str(tmp_path / "rivstate")
    write_ivf_index(_vecs(spark), idx, n_centroids=4, n_iters=1)
    return idx, st


def _search(spark, idx):
    from datawaves_etl_airflow_spark.operators.similarity import (
        ivf_search_index,
    )

    return sorted(
        map(
            tuple,
            ivf_search_index(_queries(spark), idx, nprobe=4, k=5).collect(),
        )
    )


class TestRetractionBatches:
    def test_ivf_batches_match_brute_force_over_survivors(
        self, spark, ivf_paths
    ):
        from datawaves_etl_airflow_spark.operators.similarity import (
            brute_force_topk,
        )

        idx, st = ivf_paths
        fn = make_retraction_ingest(idx, st, "ivf")
        fn(_ids(spark, range(0, 20)), 0)
        fn(_ids(spark, range(20, 40)), 1)
        got = _search(spark, idx)
        want = sorted(
            map(
                tuple,
                brute_force_topk(
                    _vecs(spark).filter(F.col("vec_id") >= 40),
                    _queries(spark),
                    k=5,
                ).collect(),
            )
        )
        assert got == want

    def test_replayed_batch_is_noop_and_rewind_raises(
        self, spark, ivf_paths
    ):
        idx, st = ivf_paths
        fn = make_retraction_ingest(idx, st, "ivf")
        fn(_ids(spark, [1, 2]), 0)
        before = _search(spark, idx)
        fn(_ids(spark, [1, 2]), 0)  # foreachBatch boundary replay
        assert _search(spark, idx) == before
        fn(_ids(spark, [3]), 1)
        with pytest.raises(ValueError, match="rewound|behind|batch"):
            fn(_ids(spark, [4]), 0)

    def test_foreign_checkpoint_raises(self, spark, ivf_paths):
        idx, st = ivf_paths
        make_retraction_ingest(idx, st, "ivf", checkpoint="ck-a")(
            _ids(spark, [1]), 0
        )
        with pytest.raises(ValueError, match="checkpoint"):
            make_retraction_ingest(idx, st, "ivf", checkpoint="ck-b")(
                _ids(spark, [2]), 0
            )

    def test_replay_after_compaction_noops(self, spark, ivf_paths):
        """Crash window × compaction: tombstone committed, marker
        lost, compaction applies + folds the token, THEN the replay
        arrives with the marker wiped — the folded list must absorb
        it (re-tombstoning could kill a legitimately re-added id)."""
        import glob
        import os
        import shutil

        from datawaves_etl_airflow_spark.operators.similarity import (
            _resolve_ivf_index,
            compact_ivf_index,
        )

        idx, st = ivf_paths
        fn = make_retraction_ingest(idx, st, "ivf")
        fn(_ids(spark, [7, 8]), 0)
        assert compact_ivf_index(spark, idx) is True
        before = _search(spark, idx)
        shutil.rmtree(st)  # the guard CANNOT catch the replay now
        fn(_ids(spark, [7, 8]), 0)
        assert _search(spark, idx) == before
        root = _resolve_ivf_index(spark, idx)[1]
        assert not glob.glob(os.path.join(root, "tombstones", "*"))

    def test_bm25_kind(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_search_index,
            write_bm25_index,
        )

        docs = spark.createDataFrame(
            [
                (i, f"doc number {i} about spark shuffles topic{i % 3}")
                for i in range(12)
            ],
            "doc_id long, text string",
        )
        qs = spark.createDataFrame(
            [(1, "spark shuffles")], "query_id long, query_text string"
        )
        idx = str(tmp_path / "rbidx")
        write_bm25_index(docs, idx, n_buckets=8)
        fn = make_retraction_ingest(idx, str(tmp_path / "rbstate"), "bm25")
        fn(
            spark.createDataFrame([(i,) for i in range(6)], "doc_id long"),
            0,
        )
        got = bm25_search_index(qs, idx, k=12).collect()
        assert all(r["doc_id"] >= 6 for r in got)
        assert len(got) == 6

    def test_minhash_kind(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            dedup_against_index,
            write_minhash_index,
        )

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "an entirely different sentence about spark planning"),
            ],
            "doc_id long, text string",
        )
        idx = str(tmp_path / "rmidx")
        write_minhash_index(docs, idx)
        batch = spark.createDataFrame(
            [(10, "the quick brown fox jumps over the lazy dog today!")],
            "doc_id long, text string",
        )
        assert (
            dedup_against_index(batch, idx, threshold=0.5).count() == 1
        )
        fn = make_retraction_ingest(idx, str(tmp_path / "rmstate"), "minhash")
        fn(spark.createDataFrame([(1,)], "id long"), 0)
        assert (
            dedup_against_index(batch, idx, threshold=0.5).count() == 0
        )

    def test_unknown_kind_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="retraction kind"):
            make_retraction_ingest(
                str(tmp_path / "x"), str(tmp_path / "y"), "faiss"
            )


class TestRetractionStreaming:
    def test_end_to_end_file_stream(self, spark, ivf_paths, tmp_path):
        idx, st = ivf_paths
        src = tmp_path / "src"
        src.mkdir()
        with open(src / "dels.jsonl", "w") as f:
            for i in range(0, 30):
                f.write(json.dumps({"vec_id": i}) + "\n")
        stream = spark.readStream.schema("vec_id long").json(str(src))
        q = stream_retraction_ingest(
            stream,
            idx,
            st,
            checkpoint=str(tmp_path / "ckpt"),
            kind="ivf",
            available_now=True,
        )
        q.awaitTermination(120)
        got = _search(spark, idx)
        from datawaves_etl_airflow_spark.operators.similarity import (
            brute_force_topk,
        )

        want = sorted(
            map(
                tuple,
                brute_force_topk(
                    _vecs(spark).filter(F.col("vec_id") >= 30),
                    _queries(spark),
                    k=5,
                ).collect(),
            )
        )
        assert got == want


class TestSuppressedAddObservability:
    """The ADD/RETRACT ordering-inversion hook: an add whose id
    already carries a live tombstone fires ``on_suppressed`` instead
    of folding silently into suppression (observe-only — the fold
    still proceeds; takedown-wins is the documented semantics)."""

    def _docs(self, spark, ids):
        return spark.createDataFrame(
            [(i, f"doc {i} about spark topic{i % 3}") for i in ids],
            "doc_id long, text string",
        )

    def test_minhash_add_after_retract_fires_hook(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            delete_from_minhash_index,
            write_minhash_index,
        )
        from datawaves_etl_airflow_spark.streaming.ingest import (
            make_neardup_ingest,
        )

        idx = str(tmp_path / "midx")
        acc = str(tmp_path / "macc")
        write_minhash_index(
            self._docs(spark, range(10)), idx, n_hashes=32, n_bands=16
        )
        # the retraction lands FIRST (the inversion)
        delete_from_minhash_index(
            self._docs(spark, [3]).select("doc_id"), idx,
            delete_token="t1",
        )
        seen = []
        fn = make_neardup_ingest(
            idx, acc, checkpoint="ck", on_suppressed=seen.append
        )
        fn(self._docs(spark, [3, 100]), 0)
        assert len(seen) == 1
        assert seen[0]["kind"] == "minhash"
        assert seen[0]["n_suppressed"] == 1
        assert seen[0]["sample"] == [3]
        assert seen[0]["batch_id"] == 0
        # a clean batch fires nothing
        fn(self._docs(spark, [101, 102]), 1)
        assert len(seen) == 1

    def test_bm25_add_after_retract_fires_hook(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_search_index,
            delete_from_bm25_index,
            write_bm25_index,
        )
        from datawaves_etl_airflow_spark.streaming.ingest import (
            make_bm25_ingest,
        )

        idx = str(tmp_path / "bidx")
        write_bm25_index(
            self._docs(spark, range(10)), idx, n_buckets=8
        )
        delete_from_bm25_index(
            self._docs(spark, [4]).select("doc_id"), idx,
            delete_token="t1",
        )
        seen = []
        fn = make_bm25_ingest(
            idx, str(tmp_path / "bstate"), checkpoint="ck",
            on_suppressed=seen.append,
        )
        fn(self._docs(spark, [4, 200]), 0)
        assert [r["sample"] for r in seen] == [[4]]
        # observe-only: the fold proceeded, and the tombstone still
        # suppresses the re-added doc at probe time (RE-ADD contract)
        qs = spark.createDataFrame(
            [(1, "doc topic1")], "query_id long, query_text string"
        )
        hits = bm25_search_index(qs, idx, k=50)
        assert hits.filter(F.col("doc_id") == 4).count() == 0
        assert hits.filter(F.col("doc_id") == 200).count() == 1

    def test_probe_reports_zero_without_tombstones(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            write_minhash_index,
        )
        from datawaves_etl_airflow_spark.streaming.ingest import (
            suppressed_add_ids,
        )

        idx = str(tmp_path / "cleanidx")
        write_minhash_index(
            self._docs(spark, range(5)), idx, n_hashes=32, n_bands=16
        )
        rep = suppressed_add_ids(
            spark, idx, "minhash",
            self._docs(spark, [1, 2]).select("doc_id"),
        )
        assert rep == {"n_suppressed": 0, "sample": []}

    def test_unknown_kind_raises(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.streaming.ingest import (
            suppressed_add_ids,
        )

        with pytest.raises(ValueError, match="unknown index kind"):
            suppressed_add_ids(
                spark, str(tmp_path), "hnsw",
                self._docs(spark, [1]).select("doc_id"),
            )
