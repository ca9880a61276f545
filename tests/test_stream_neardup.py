"""Streaming near-dup ingest: each micro-batch dedups against the
persisted index AND everything accepted before it; replays are
no-ops."""

from __future__ import annotations

import json
import os

import pytest

from datawaves_etl_airflow_spark.operators.dedup import write_minhash_index
from datawaves_etl_airflow_spark.streaming.ingest import (
    make_neardup_ingest,
    stream_neardup_ingest,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs before noon today ok"),
]
B1 = [
    # near-dup of corpus doc 1 → dropped
    (10, "the quick brown fox jumps over the lazy dog again and again!"),
    # novel within-batch near-dup pair → keep 11, drop 12
    (11, "entirely novel text streaming through watermarked windows now"),
    (12, "entirely novel text streaming through watermarked windows then"),
    (13, "nothing here resembles anything else in corpus or batch one"),
]
B2 = [
    # near-dup of batch-1 SURVIVOR 11 → dropped (index grew)
    (20, "entirely novel text streaming through watermarked windows soon"),
    (21, "completely fresh second batch content with no duplicate peer"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _accepted_ids(spark, accepted_path):
    return sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(accepted_path, "docs")
        ).collect()
    )


@pytest.fixture()
def paths(spark, tmp_path):
    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    write_minhash_index(_df(spark, CORPUS), idx)
    return idx, acc


class TestNeardupIngestBatches:
    def test_two_batches_dedup_against_growing_index(self, spark, paths):
        idx, acc = paths
        fn = make_neardup_ingest(idx, acc, threshold=0.5)
        fn(_df(spark, B1), 0)
        assert _accepted_ids(spark, acc) == [11, 13]
        fn(_df(spark, B2), 1)
        # 20 caught by batch-1 survivor 11 via the APPENDED index rows
        assert _accepted_ids(spark, acc) == [11, 13, 21]

    def test_replayed_batch_is_noop(self, spark, paths):
        idx, acc = paths
        fn = make_neardup_ingest(idx, acc, threshold=0.5)
        fn(_df(spark, B1), 0)
        fn(_df(spark, B1), 0)  # foreachBatch at-least-once replay
        assert _accepted_ids(spark, acc) == [11, 13]

    def test_corrupt_marker_stops_ingest(self, spark, paths):
        idx, acc = paths
        fn = make_neardup_ingest(idx, acc, threshold=0.5)
        fn(_df(spark, B1), 0)
        from datawaves_etl_airflow_spark.sources.fs import write_text

        write_text(spark, os.path.join(acc, "_last_batch_id"), "zz")
        with pytest.raises(ValueError, match="corrupt replay marker"):
            fn(_df(spark, B2), 1)


class TestNeardupIngestStreaming:
    def test_end_to_end_file_stream(self, spark, paths, tmp_path):
        idx, acc = paths
        src = tmp_path / "src"
        src.mkdir()
        with open(src / "b.jsonl", "w") as f:
            for i, t in B1:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(src))
        )
        q = stream_neardup_ingest(
            stream,
            idx,
            acc,
            checkpoint=str(tmp_path / "ckpt"),
            threshold=0.5,
            available_now=True,
        )
        q.awaitTermination(120)
        assert _accepted_ids(spark, acc) == [11, 13]
