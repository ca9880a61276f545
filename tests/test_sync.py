"""Incremental index sync: diff → delete → compact → append must be
value-identical to a fresh build over the new snapshot."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.sync import (
    sync_bm25_index_to_snapshot,
    sync_ivf_index_to_snapshot,
    sync_minhash_index_to_snapshot,
)

DIM = 8


def _old_new_docs(spark):
    new = spark.createDataFrame(
        [
            (i, f"doc {i} about spark shuffles topic{i % 4}")
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    old = (
        new.filter(F.col("doc_id") % 11 != 0)  # v2 adds these back
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" old")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            new.filter(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + F.lit(100_000)).alias("doc_id"),
                "text",
            )
        )
    )
    return old, new


def _probe_bm25(spark, idx):
    from datawaves_etl_airflow_spark.operators.text import (
        bm25_search_index,
    )

    qs = spark.createDataFrame(
        [(1, "spark topic1"), (2, "doc shuffles")],
        "query_id long, query_text string",
    )
    return sorted(map(tuple, bm25_search_index(qs, idx, k=8).collect()))


class TestBm25Sync:
    def test_sync_equals_fresh_build(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_index_stats,
            write_bm25_index,
        )

        old, new = _old_new_docs(spark)
        synced = str(tmp_path / "synced")
        write_bm25_index(old, synced, n_buckets=8)
        rep = sync_bm25_index_to_snapshot(
            old, new, synced, sync_token="s1"
        )
        assert rep["n_removed"] == 4  # the shifted 100_000+ copies
        assert rep["n_added"] == 4    # doc_id % 11 == 0: 0,11,22,33
        assert rep["n_changed"] == 5  # % 7 == 0 minus % 11 overlap (0)
        assert rep["deleted"] and rep["compacted"] and rep["appended"]
        fresh = str(tmp_path / "fresh")
        write_bm25_index(new, fresh, n_buckets=8)
        assert _probe_bm25(spark, synced) == _probe_bm25(spark, fresh)
        # stats corrected exactly too
        assert (
            bm25_index_stats(spark, synced).first()["n_docs"]
            == new.count()
        )

    def test_same_token_rerun_is_replay_safe(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            write_bm25_index,
        )

        old, new = _old_new_docs(spark)
        idx = str(tmp_path / "resync")
        write_bm25_index(old, idx, n_buckets=8)
        sync_bm25_index_to_snapshot(old, new, idx, sync_token="s1")
        before = _probe_bm25(spark, idx)
        # crash-retry of the WHOLE sync under the same token: the
        # delete no-ops via folded_deletes, the append via folded
        sync_bm25_index_to_snapshot(old, new, idx, sync_token="s1")
        assert _probe_bm25(spark, idx) == before

    def test_noop_sync(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            write_bm25_index,
        )

        _, new = _old_new_docs(spark)
        idx = str(tmp_path / "noop")
        write_bm25_index(new, idx, n_buckets=8)
        before = _probe_bm25(spark, idx)
        rep = sync_bm25_index_to_snapshot(new, new, idx)
        assert not rep["deleted"] and not rep["appended"]
        assert rep["n_unchanged"] == new.count()
        assert _probe_bm25(spark, idx) == before


class TestIvfSync:
    def _vecs(self, spark, n=120, seed=9):
        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(DIM)])
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_sync_equals_full_probe_over_new_snapshot(
        self, spark, tmp_path
    ):
        from datawaves_etl_airflow_spark.operators.similarity import (
            brute_force_topk,
            delete_from_ivf_index,  # noqa: F401 (family import sanity)
            ivf_search_index,
            write_ivf_index,
        )

        new = self._vecs(spark)
        old = (
            new.filter(F.col("vec_id") % 11 != 0)
            .withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 7 == 0,
                    F.transform(F.col("embedding"), lambda x: -x),
                ).otherwise(F.col("embedding")),
            )
            .unionByName(
                new.filter(F.col("vec_id") % 13 == 0).select(
                    (F.col("vec_id") + F.lit(100_000)).alias("vec_id"),
                    "embedding",
                )
            )
        )
        idx = str(tmp_path / "ivfsync")
        write_ivf_index(old, idx, n_centroids=8, n_iters=1)
        rep = sync_ivf_index_to_snapshot(old, new, idx, sync_token="s1")
        assert rep["deleted"] and rep["compacted"] and rep["appended"]
        qs = self._vecs(spark, n=5, seed=77).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got = sorted(
            map(
                tuple,
                ivf_search_index(qs, idx, nprobe=8, k=5).collect(),
            )
        )
        want = sorted(
            map(tuple, brute_force_topk(new, qs, k=5).collect())
        )
        assert got == want


class TestMinhashSync:
    """The dedup-index leg (r10's one estate asymmetry): synced bands
    AND sets must probe exactly like a fresh build — banding is
    deterministic per (text, params), so equality is value-for-value,
    not just same-candidates."""

    def _docs(self, spark):
        # near-dup-rich corpus: doc 2i+1 shares most words with 2i
        base = [
            f"alpha bravo charlie delta echo foxtrot golf hotel "
            f"india juliet kilo topic{i % 5} filler{i}"
            for i in range(20)
        ]
        rows = []
        for i, t in enumerate(base):
            rows.append((2 * i, t))
            rows.append((2 * i + 1, t + " extra"))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _probe(self, spark, idx, batch):
        from datawaves_etl_airflow_spark.operators.dedup import (
            dedup_against_index,
        )

        return sorted(
            map(
                tuple,
                dedup_against_index(
                    batch, idx, threshold=0.5
                ).collect(),
            )
        )

    def test_sync_equals_fresh_build(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            minhash_index_stats,
            write_minhash_index,
        )

        new = self._docs(spark)
        old = (
            new.filter(F.col("doc_id") % 11 != 0)
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(F.col("text"), F.lit(" drifted words")),
                ).otherwise(F.col("text")),
            )
            .unionByName(
                new.filter(F.col("doc_id") % 13 == 0).select(
                    (F.col("doc_id") + F.lit(100_000)).alias(
                        "doc_id"
                    ),
                    "text",
                )
            )
        )
        synced = str(tmp_path / "synced")
        write_minhash_index(old, synced, n_hashes=64, n_bands=32)
        rep = sync_minhash_index_to_snapshot(
            old, new, synced, sync_token="s1"
        )
        assert rep["deleted"] and rep["compacted"] and rep["appended"]
        fresh = str(tmp_path / "fresh")
        write_minhash_index(new, fresh, n_hashes=64, n_bands=32)
        batch = spark.createDataFrame(
            [(500, self._docs(spark).collect()[0]["text"])],
            "doc_id long, text string",
        )
        got = self._probe(spark, synced, batch)
        assert got == self._probe(spark, fresh, batch)
        assert len(got) >= 1  # the probe actually matches something
        stats = minhash_index_stats(spark, synced).first()
        assert stats["n_docs"] == new.count()

    def test_same_token_rerun_is_replay_safe(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            write_minhash_index,
        )

        new = self._docs(spark)
        old = new.filter(F.col("doc_id") % 5 != 0)
        idx = str(tmp_path / "resync")
        write_minhash_index(old, idx, n_hashes=64, n_bands=32)
        sync_minhash_index_to_snapshot(old, new, idx, sync_token="s1")
        batch = new.limit(4).select(
            (F.col("doc_id") + F.lit(900)).alias("doc_id"), "text"
        )
        before = self._probe(spark, idx, batch)
        sync_minhash_index_to_snapshot(old, new, idx, sync_token="s1")
        assert self._probe(spark, idx, batch) == before

    def test_noop_sync(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            write_minhash_index,
        )

        new = self._docs(spark)
        idx = str(tmp_path / "noop")
        write_minhash_index(new, idx, n_hashes=64, n_bands=32)
        rep = sync_minhash_index_to_snapshot(new, new, idx)
        assert not rep["deleted"] and not rep["appended"]
        assert rep["n_unchanged"] == new.count()


class TestSyncCrashRetry:
    """A re-run under the same sync_token must heal a crash INSIDE the
    append's job commit: the sync discards its OWN torn batch dirs
    before compacting, so the torn-commit refusal stays reserved for
    foreign crashes."""

    def test_retry_heals_torn_own_append(self, spark, tmp_path):
        import os

        from datawaves_etl_airflow_spark.operators.text import (
            _resolve_bm25_index,
            append_bm25_index,
            compact_bm25_index,
            delete_from_bm25_index,
            write_bm25_index,
        )

        old, new = _old_new_docs(spark)
        idx = str(tmp_path / "crash")
        write_bm25_index(old, idx, n_buckets=8)
        # reproduce the first run up to a crash inside the append's
        # job commit: delete + compact committed, append dir torn
        dels = old.select("doc_id").exceptAll(
            old.join(new, ["doc_id", "text"], "left_semi").select(
                "doc_id"
            )
        )
        delete_from_bm25_index(dels, idx, delete_token="s1-del")
        assert compact_bm25_index(spark, idx) is True
        adds = new.join(old, ["doc_id", "text"], "left_anti")
        append_bm25_index(adds, idx, batch_token="s1-add")
        root = _resolve_bm25_index(spark, idx)[1]
        for side in ("postings", "meta"):
            os.remove(
                os.path.join(root, side, "batch=s1-add", "_SUCCESS")
            )
        # the retry (same token) must succeed, not wedge on its own
        # debris — and end value-identical to a fresh build
        rep = sync_bm25_index_to_snapshot(
            old, new, idx, sync_token="s1"
        )
        assert rep["appended"] is True
        fresh = str(tmp_path / "fresh")
        write_bm25_index(new, fresh, n_buckets=8)
        assert _probe_bm25(spark, idx) == _probe_bm25(spark, fresh)

    def test_foreign_torn_batch_still_refuses(self, spark, tmp_path):
        import os

        import pytest

        from datawaves_etl_airflow_spark.operators.text import (
            _resolve_bm25_index,
            append_bm25_index,
            write_bm25_index,
        )

        old, new = _old_new_docs(spark)
        idx = str(tmp_path / "foreign")
        write_bm25_index(old, idx, n_buckets=8)
        # someone ELSE's crashed ingest left a torn batch — the sync
        # must refuse loudly, never discard data it does not own
        append_bm25_index(
            new.limit(3), idx, batch_token="other-ingest"
        )
        root = _resolve_bm25_index(spark, idx)[1]
        os.remove(
            os.path.join(
                root, "postings", "batch=other-ingest", "_SUCCESS"
            )
        )
        with pytest.raises(RuntimeError, match="torn job commit"):
            sync_bm25_index_to_snapshot(old, new, idx, sync_token="s1")
