"""Streaming BM25 index maintenance: each micro-batch folds into the
persisted inverted index under the shared replay contract; probes after
the stream equal an in-session rank over the full corpus."""

from __future__ import annotations

import json

import pytest

from datawaves_etl_airflow_spark.operators.text import (
    bm25_search_index,
    bm25_topk,
    write_bm25_index,
)
from datawaves_etl_airflow_spark.streaming.ingest import (
    make_bm25_ingest,
    stream_bm25_ingest,
)

BASE = [
    (i, f"base doc {i} about spark shuffles and data topic{i % 3}")
    for i in range(10)
]
B1 = [
    (100 + i, f"streamed doc {i} about spark joins and topic{i % 3}")
    for i in range(5)
]
B2 = [(200, "late arriving doc about shuffles"), (201, "another one entirely")]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(1, "spark shuffles"), (2, "topic1 joins")],
        "query_id long, query_text string",
    )


@pytest.fixture()
def paths(spark, tmp_path):
    idx = str(tmp_path / "bmidx")
    st = str(tmp_path / "bmstate")
    write_bm25_index(_df(spark, BASE), idx, n_buckets=16)
    return idx, st


def _probe(spark, idx):
    return sorted(
        map(tuple, bm25_search_index(_queries(spark), idx, k=5).collect())
    )


class TestBm25IngestBatches:
    def test_folds_match_in_session_ranking(self, spark, paths):
        idx, st = paths
        fn = make_bm25_ingest(idx, st)
        fn(_df(spark, B1), 0)
        fn(_df(spark, B2), 1)
        got = _probe(spark, idx)
        want = sorted(
            map(
                tuple,
                bm25_topk(
                    _df(spark, BASE + B1 + B2), _queries(spark), k=5
                ).collect(),
            )
        )
        assert got == want

    def test_replayed_batch_is_noop(self, spark, paths):
        idx, st = paths
        fn = make_bm25_ingest(idx, st)
        fn(_df(spark, B1), 0)
        before = _probe(spark, idx)
        fn(_df(spark, B1), 0)  # foreachBatch boundary replay
        assert _probe(spark, idx) == before

    def test_foreign_checkpoint_raises(self, spark, paths):
        idx, st = paths
        make_bm25_ingest(idx, st, checkpoint="ck-a")(_df(spark, B1), 0)
        with pytest.raises(ValueError, match="checkpoint"):
            make_bm25_ingest(idx, st, checkpoint="ck-b")(_df(spark, B2), 0)

    def test_replay_after_compaction_noops(self, spark, paths):
        """Crash window × compaction: the fold commits, the marker
        does not, a compaction folds the token into base, THEN the
        replay arrives — the folded list must absorb it (no
        double-counted postings or meta row)."""
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_index_stats,
            compact_bm25_index,
        )

        idx, st = paths
        fn = make_bm25_ingest(idx, st)
        fn(_df(spark, B1), 0)
        assert compact_bm25_index(spark, idx) is True
        before = _probe(spark, idx)
        fn(_df(spark, B1), 0)  # marker says replayed -> guard no-op
        # harsher: wipe the marker so the guard CANNOT catch it — the
        # folded-token list is the last line of defense
        import shutil as _sh

        _sh.rmtree(st)
        fn(_df(spark, B1), 0)
        assert _probe(spark, idx) == before
        assert bm25_index_stats(spark, idx).first()["n_docs"] == 15


class TestBm25IngestStreaming:
    def test_end_to_end_file_stream(self, spark, paths, tmp_path):
        idx, st = paths
        src = tmp_path / "src"
        src.mkdir()
        with open(src / "b.jsonl", "w") as f:
            for i, t in B1:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(src))
        )
        q = stream_bm25_ingest(
            stream,
            idx,
            st,
            checkpoint=str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(120)
        got = _probe(spark, idx)
        want = sorted(
            map(
                tuple,
                bm25_topk(_df(spark, BASE + B1), _queries(spark), k=5).collect(),
            )
        )
        assert got == want
