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

    def test_corrupt_legacy_marker_stops_ingest(self, spark, paths):
        """A PRE-MANIFEST store whose _last_batch_id file is garbage
        must refuse loudly (treating it as absent could re-append a
        batch). Once a manifest exists it wins and the legacy file is
        ignored — see test_legacy_marker_migrates_to_manifest."""
        idx, acc = paths
        from datawaves_etl_airflow_spark.sources.fs import write_text

        write_text(spark, os.path.join(acc, "_last_batch_id"), "zz")
        fn = make_neardup_ingest(idx, acc, threshold=0.5)
        with pytest.raises(ValueError, match="corrupt replay marker"):
            fn(_df(spark, B1), 0)

    def test_legacy_marker_migrates_to_manifest(self, spark, paths):
        """A bare-integer pre-manifest marker is honored (replay of its
        batch no-ops), then the next commit moves the marker into the
        versioned manifest and removes the legacy file — the update
        path with the delete→rename lost-marker window is gone."""
        idx, acc = paths
        from datawaves_etl_airflow_spark.sources.fs import (
            path_exists,
            write_text,
        )
        from datawaves_etl_airflow_spark.sources.manifest import (
            VersionedManifest,
        )

        fn = make_neardup_ingest(idx, acc, threshold=0.5)
        fn(_df(spark, B1), 0)
        # simulate a store written by the pre-manifest engine: strip
        # the manifest, plant the old-style bare-integer marker
        import shutil

        shutil.rmtree(os.path.join(acc, "_manifests"))
        legacy = os.path.join(acc, "_last_batch_id")
        write_text(spark, legacy, "0")
        fn(_df(spark, B1), 0)  # replay honored via the legacy fallback
        assert _accepted_ids(spark, acc) == [11, 13]
        fn(_df(spark, B2), 1)  # first post-migration commit
        assert _accepted_ids(spark, acc) == [11, 13, 21]
        assert not path_exists(spark, legacy)
        _, payload = VersionedManifest(acc).resolve(spark)
        assert payload["last_batch_id"] == 1


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
