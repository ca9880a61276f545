"""Round-4 ADVICE regressions.

1. similarity.lsh_topk multi-probe flip masks must be JVM-side long
   shifts: ``F.lit(1 << 63)`` overflows LongType, so n_planes=64 (which
   plane_signature itself supports) previously produced an invalid
   literal / null bucket that silently dropped the sign-bit probe.
2. streaming.ingest replay guard must not key solely on the numeric
   batch id: a fresh checkpointLocation restarts ids at 0, which the
   old guard misread as replays and silently dropped every batch. The
   marker now records the checkpoint identity and a mismatch raises.
"""

from __future__ import annotations

import os

import pytest

from datawaves_etl_airflow_spark.operators.dedup import write_minhash_index
from datawaves_etl_airflow_spark.operators.similarity import lsh_topk
from datawaves_etl_airflow_spark.streaming.ingest import make_neardup_ingest


class TestMultiProbe64Planes:
    def test_n_planes_64_probes_all_flip_neighbors(self, spark):
        # 64 planes exercises the i=63 sign-bit mask the F.lit overflow
        # used to corrupt. With multi_probe the query must at minimum
        # recover its own identical corpus vector (same bucket, probe 0)
        # and the plan must build without an overflow error.
        vecs = spark.createDataFrame(
            [(i, [float(i), 1.0, -0.5, float(i % 3)]) for i in range(20)],
            "vec_id long, embedding array<float>",
        )
        qs = spark.createDataFrame(
            [(100, [5.0, 1.0, -0.5, 2.0])], "query_id long, query_vec array<float>"
        )
        out = lsh_topk(
            vecs, qs, dim=4, k=3, n_planes=64, multi_probe=True
        ).collect()
        assert out, "multi-probe with 64 planes returned no candidates"
        best = min(out, key=lambda r: r["rank"])
        assert best["match_id"] == 5 and best["cosine_sim"] == 1.0

    def test_multi_probe_beats_or_equals_single_bucket(self, spark):
        vecs = spark.createDataFrame(
            [(i, [float((i * 7) % 13), float((i * 3) % 5), 1.0]) for i in range(30)],
            "vec_id long, embedding array<float>",
        )
        qs = spark.createDataFrame(
            [(1, [2.0, 1.0, 1.0]), (2, [11.0, 4.0, 1.0])],
            "query_id long, query_vec array<float>",
        )
        single = lsh_topk(vecs, qs, dim=3, k=5, n_planes=6).count()
        multi = lsh_topk(
            vecs, qs, dim=3, k=5, n_planes=6, multi_probe=True
        ).count()
        assert multi >= single


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs before noon today ok"),
]
BATCH = [
    (11, "entirely novel text streaming through watermarked windows now"),
    (13, "nothing here resembles anything else in corpus or batch one"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _accepted_ids(spark, acc):
    return sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(acc, "docs")).collect()
    )


class TestReplayGuardCheckpointIdentity:
    @pytest.fixture()
    def paths(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        acc = str(tmp_path / "acc")
        write_minhash_index(_df(spark, CORPUS), idx)
        return idx, acc

    def test_fresh_checkpoint_raises_instead_of_silent_drop(
        self, spark, paths
    ):
        idx, acc = paths
        fn = make_neardup_ingest(idx, acc, threshold=0.5, checkpoint="ckptA")
        fn(_df(spark, BATCH), 5)
        assert _accepted_ids(spark, acc) == [11, 13]
        # same accepted_path, NEW checkpoint: ids restart at 0 — the old
        # guard would return silently on batch 0 <= 5; now it raises
        fn2 = make_neardup_ingest(idx, acc, threshold=0.5, checkpoint="ckptB")
        with pytest.raises(ValueError, match="checkpoint"):
            fn2(_df(spark, [(21, "completely fresh second batch text")]), 0)

    def test_same_checkpoint_replay_still_noop(self, spark, paths):
        idx, acc = paths
        fn = make_neardup_ingest(idx, acc, threshold=0.5, checkpoint="ckptA")
        fn(_df(spark, BATCH), 0)
        fn(_df(spark, BATCH), 0)
        assert _accepted_ids(spark, acc) == [11, 13]

    def test_legacy_bare_int_marker_still_honored(self, spark, paths):
        # round 6 moved the marker onto VersionedManifest: the committed
        # payload lives in _manifests/ (no loose _last_batch_id file),
        # and a PRE-MANIFEST store's bare-int marker is honored as a
        # fallback, then migrated away on the next real commit.
        idx, acc = paths
        fn = make_neardup_ingest(idx, acc, threshold=0.5, checkpoint="ckptA")
        fn(_df(spark, BATCH), 3)
        from datawaves_etl_airflow_spark.sources.fs import (
            delete_path,
            path_exists,
            read_text,
            write_text,
        )
        from datawaves_etl_airflow_spark.sources.manifest import (
            VersionedManifest,
        )

        vm = VersionedManifest(acc)
        _, payload = vm.resolve(spark)
        assert payload["checkpoint"] == "ckptA"
        assert payload["last_batch_id"] == 3
        marker = os.path.join(acc, "_last_batch_id")
        assert read_text(spark, marker) is None
        # strip back to the pre-manifest layout: bare-int marker only
        delete_path(spark, vm.manifest_dir())
        write_text(spark, marker, "3")  # pre-identity marker format
        fn(_df(spark, BATCH), 3)  # replay by id alone — still a no-op
        assert _accepted_ids(spark, acc) == [11, 13]
        # next REAL commit migrates: manifest back, legacy file gone
        fn(_df(spark, [(17, "a genuinely new post-migration doc")]), 4)
        _, migrated = vm.resolve(spark)
        assert migrated["last_batch_id"] == 4
        assert migrated["checkpoint"] == "ckptA"
        assert not path_exists(spark, marker)


class TestIdentitylessMarkerGuard:
    """Review hardening: a pre-identity (bare-int) marker cannot prove
    checkpoint continuity, so a batch id STRICTLY below the marker —
    impossible for a same-checkpoint replay, which only re-runs the
    last committed id — must raise rather than silently drop."""

    def test_strictly_lower_id_with_legacy_marker_raises(
        self, spark, tmp_path
    ):
        idx = str(tmp_path / "idx")
        acc = str(tmp_path / "acc")
        write_minhash_index(_df(spark, CORPUS), idx)
        fn = make_neardup_ingest(idx, acc, threshold=0.5, checkpoint="ckA")
        fn(_df(spark, BATCH), 5)
        from datawaves_etl_airflow_spark.sources.fs import (
            delete_path,
            write_text,
        )
        from datawaves_etl_airflow_spark.sources.manifest import (
            VersionedManifest,
        )

        # strip to the PRE-MANIFEST layout (bare-int marker only) so the
        # guard sees an identity-less marker, not the committed manifest
        delete_path(spark, VersionedManifest(acc).manifest_dir())
        write_text(spark, os.path.join(acc, "_last_batch_id"), "5")
        # fresh checkpoint restarting at 0 against the legacy marker
        fn2 = make_neardup_ingest(idx, acc, threshold=0.5, checkpoint="ckB")
        with pytest.raises(ValueError, match="checkpoint identity"):
            fn2(_df(spark, [(31, "brand new doc for the restart case")]), 0)
        # boundary replay (== marker id) stays a silent no-op
        fn2(_df(spark, BATCH), 5)
        assert _accepted_ids(spark, acc) == [11, 13]
