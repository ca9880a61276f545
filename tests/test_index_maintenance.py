"""Round-5 index maintenance surfaces: manifest-committed compaction
for the MinHash index and incremental append + compaction for the IVF
index — the operations that keep daily probe cost flat on a growing
persisted corpus."""

from __future__ import annotations

import glob
import os
import random

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.dedup import (
    _resolve_minhash_index,
    append_minhash_index,
    compact_minhash_index,
    dedup_against_index,
    vacuum_minhash_index,
    write_minhash_index,
)
from datawaves_etl_airflow_spark.operators.similarity import (
    _resolve_ivf_index,
    append_ivf_index,
    compact_ivf_index,
    ivf_search_index,
    vacuum_ivf_index,
    write_ivf_index,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs before noon today ok"),
]
DAY1 = [(11, "entirely novel text streaming through watermarked windows")]
DAY2 = [(21, "completely fresh second day content with no duplicate peer")]


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _probe_pairs(spark, path, text):
    probe = _docs_df(spark, [(99, text)])
    return {
        (r["id_a"], r["id_b"])
        for r in dedup_against_index(probe, path, threshold=0.5).collect()
    }


class TestMinhashCompaction:
    def test_compact_folds_batches_probe_identical(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        write_minhash_index(_docs_df(spark, DOCS), p)
        append_minhash_index(_docs_df(spark, DAY1), p, batch_token="d1")
        append_minhash_index(_docs_df(spark, DAY2), p, batch_token="d2")
        before = {
            t: _probe_pairs(spark, p, t)
            for t in (DOCS[0][1] + "!", DAY1[0][1] + "!", DAY2[0][1] + "!")
        }
        assert before[DAY1[0][1] + "!"] == {(99, 11)}  # appended visible
        assert compact_minhash_index(spark, p) is True
        vacuum_minhash_index(spark, p)
        root = _resolve_minhash_index(spark, p)[1]
        # one batch dir per side after compact+vacuum
        assert glob.glob(os.path.join(root, "bands", "batch=*")) == [
            os.path.join(root, "bands", "batch=base")
        ]
        assert glob.glob(os.path.join(root, "sets", "batch=*")) == [
            os.path.join(root, "sets", "batch=base")
        ]
        after = {
            t: _probe_pairs(spark, p, t)
            for t in (DOCS[0][1] + "!", DAY1[0][1] + "!", DAY2[0][1] + "!")
        }
        assert after == before
        # appends keep working on the compacted version
        append_minhash_index(
            _docs_df(spark, [(31, "post compact day three text here")]),
            p,
            batch_token="d3",
        )
        assert _probe_pairs(
            spark, p, "post compact day three text here!"
        ) == {(99, 31)}

    def test_compact_crash_keeps_old_version_live(
        self, spark, tmp_path, monkeypatch
    ):
        from datawaves_etl_airflow_spark.sources import manifest as mf

        p = str(tmp_path / "idx")
        write_minhash_index(_docs_df(spark, DOCS), p)
        append_minhash_index(_docs_df(spark, DAY1), p, batch_token="d1")
        real = mf.create_text_exclusive
        state = {"armed": True}

        def crashing(spark_, path_, content):
            if state["armed"] and "manifest-" in path_:
                state["armed"] = False
                raise RuntimeError("injected crash mid-compact")
            return real(spark_, path_, content)

        monkeypatch.setattr(mf, "create_text_exclusive", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            compact_minhash_index(spark, p)
        assert _probe_pairs(spark, p, DAY1[0][1] + "!") == {(99, 11)}
        assert compact_minhash_index(spark, p) is True  # retry commits
        assert _probe_pairs(spark, p, DAY1[0][1] + "!") == {(99, 11)}

    def test_compact_on_legacy_index_returns_false(self, spark, tmp_path):
        assert compact_minhash_index(spark, str(tmp_path / "none")) is False


DIM = 8


def _vecs(spark, ids, seed=3):
    rng = random.Random(seed)
    return spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in ids],
        "vec_id long, embedding array<double>",
    )


def _query_for(spark, vec_row):
    return spark.createDataFrame(
        [(0, vec_row)], "query_id long, query_vec array<double>"
    )


class TestIvfAppend:
    @pytest.fixture()
    def index_path(self, spark, tmp_path):
        p = str(tmp_path / "ivf")
        write_ivf_index(_vecs(spark, range(100)), p, n_centroids=4, n_iters=1)
        return p

    def test_appended_vectors_found_by_probe(self, spark, index_path):
        new = _vecs(spark, range(1000, 1010), seed=7)
        append_ivf_index(new, index_path, batch_token="d1")
        target = new.filter("vec_id = 1005").first()["embedding"]
        got = ivf_search_index(
            _query_for(spark, target), index_path, nprobe=1, k=1
        ).first()
        assert got["match_id"] == 1005 and got["cosine_sim"] == 1.0

    def test_same_token_retry_no_duplicates(self, spark, index_path):
        new = _vecs(spark, range(1000, 1005), seed=7)
        append_ivf_index(new, index_path, batch_token="d1")
        append_ivf_index(new, index_path, batch_token="d1")
        root = _resolve_ivf_index(spark, index_path)[1]
        ids = [
            r["vec_id"]
            for r in spark.read.parquet(os.path.join(root, "cells"))
            .select("vec_id")
            .collect()
        ]
        assert len(ids) == len(set(ids))

    def test_append_to_missing_index_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="no IVF index marker"):
            append_ivf_index(
                _vecs(spark, range(3)), str(tmp_path / "nope")
            )

    def test_compact_folds_batches_probe_identical(
        self, spark, index_path
    ):
        append_ivf_index(
            _vecs(spark, range(1000, 1010), seed=7), index_path,
            batch_token="d1",
        )
        append_ivf_index(
            _vecs(spark, range(2000, 2010), seed=9), index_path,
            batch_token="d2",
        )
        q = _query_for(
            spark, _vecs(spark, range(1000, 1010), seed=7)
            .filter("vec_id = 1003").first()["embedding"]
        ).localCheckpoint()
        before = [
            (r["match_id"], r["rank"], r["cosine_sim"])
            for r in ivf_search_index(
                q, index_path, nprobe=2, k=5
            ).collect()
        ]
        assert compact_ivf_index(spark, index_path) is True
        vacuum_ivf_index(spark, index_path)
        root = _resolve_ivf_index(spark, index_path)[1]
        assert glob.glob(os.path.join(root, "cells", "batch=*")) == [
            os.path.join(root, "cells", "batch=base")
        ]
        after = [
            (r["match_id"], r["rank"], r["cosine_sim"])
            for r in ivf_search_index(
                q, index_path, nprobe=2, k=5
            ).collect()
        ]
        assert after == before


class TestIngestCompactIntegration:
    """The round-5 surfaces composed: online near-dup ingest grows the
    index batch-by-batch, compaction folds it mid-stream (between
    triggers — the single-writer window), and subsequent batches still
    dedup against everything accepted before."""

    def test_ingest_compact_ingest(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.streaming.ingest import (
            make_neardup_ingest,
        )

        idx = str(tmp_path / "idx")
        acc = str(tmp_path / "acc")
        write_minhash_index(_docs_df(spark, DOCS), idx)
        fn = make_neardup_ingest(idx, acc, threshold=0.5, checkpoint="ck")
        fn(_docs_df(spark, DAY1), 0)
        # maintenance window between triggers: fold + vacuum
        assert compact_minhash_index(spark, idx) is True
        vacuum_minhash_index(spark, idx)
        # next batch: a near-dup of the DAY1 survivor must still drop
        dup_of_day1 = [(50, DAY1[0][1] + " ok")]
        fresh = [(51, "nothing in common with anything ingested before")]
        fn(_docs_df(spark, dup_of_day1 + fresh), 1)
        import os as _os

        got = sorted(
            r["doc_id"]
            for r in spark.read.parquet(
                _os.path.join(acc, "docs")
            ).collect()
        )
        assert got == [11, 51]  # 50 dropped against the compacted index


class TestCompactSkipsIncompleteFolds:
    """Folding a half-written batch would bake partial rows into
    batch=base permanently, and the same-token replay would then
    duplicate them. Completeness is the _SUCCESS marker (the one
    signal written strictly after every commitJob rename): a side
    missing entirely is skipped (the replay re-folds it whole against
    the compacted version — no duplicates, no loss), while data files
    WITHOUT a marker are a torn commit and make compaction refuse
    loudly (see test_torn_commit_refuses below)."""

    def test_minhash_compact_skips_then_replay_heals(
        self, spark, tmp_path
    ):
        from datawaves_etl_airflow_spark.operators.dedup import (
            word_shingle_hash_sets,
        )

        p = str(tmp_path / "idx")
        write_minhash_index(_docs_df(spark, DOCS), p)
        root = _resolve_minhash_index(spark, p)[1]
        # crash simulation: ONLY the sets side of batch d1 lands
        half = word_shingle_hash_sets(_docs_df(spark, DAY1), k=3)
        half.write.mode("overwrite").parquet(root + "/sets/batch=d1")
        assert compact_minhash_index(spark, p) is True
        vacuum_minhash_index(spark, p)
        # the half fold is gone with the old version, not baked in
        new_root = _resolve_minhash_index(spark, p)[1]
        sets = spark.read.parquet(new_root + "/sets")
        assert sorted(r["id"] for r in sets.select("id").collect()) == [1, 2]
        # replay of the crashed fold, same token, against the new version
        append_minhash_index(_docs_df(spark, DAY1), p, batch_token="d1")
        ids = [r["id"] for r in spark.read.parquet(
            new_root + "/sets").select("id").collect()]
        assert sorted(ids) == [1, 2, 11]  # folded once, no duplicates
        assert _probe_pairs(spark, p, DAY1[0][1] + "!") == {(99, 11)}


class TestBandCrowdCap:
    """max_docs_per_band: the boilerplate-skew valve on the MinHash
    band join — Σbucket² candidate volume is capped by dropping
    mega-buckets, while pairs sharing any quieter band are still
    found and everything that survives is still exact-verified."""

    def test_cap_disabled_is_bitwise_default(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            minhash_dedup_pairs,
        )

        docs = _docs_df(
            spark,
            [(i, f"shared prefix words here and tail number {i}")
             for i in range(12)],
        )
        a = {
            (r["id_a"], r["id_b"])
            for r in minhash_dedup_pairs(docs, threshold=0.5).collect()
        }
        b = {
            (r["id_a"], r["id_b"])
            for r in minhash_dedup_pairs(
                docs, threshold=0.5, max_docs_per_band=10**9
            ).collect()
        }
        assert a == b

    def test_cap_bounds_crowd_but_quieter_bands_still_pair(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            minhash_band_rows_np,
            minhash_dedup_pairs,
            word_shingle_hash_sets,
        )

        # 30 exact copies of one template (a mega-crowd: every band
        # bucket holds all 30) + one near-dup pair of distinct docs
        template = "identical boilerplate template text repeated many times"
        docs = _docs_df(
            spark,
            [(i, template) for i in range(30)]
            + [(100, "a genuinely distinct document about spark plans"),
               (101, "a genuinely distinct document about spark plans!")],
        )
        capped = minhash_dedup_pairs(
            docs, threshold=0.5, max_docs_per_band=8
        )
        got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
        # the template crowd exceeds every band's cap -> contributes
        # no candidates; the quiet near-dup pair is still found
        assert got == {(100, 101)}
        # and the cap genuinely binds: the template crowd fills band
        # buckets far beyond the cap of 8
        sets = word_shingle_hash_sets(docs)
        bucket_sizes = (
            minhash_band_rows_np(sets, 64, 16)
            .groupBy("band_id", "band_hash")
            .count()
        )
        assert bucket_sizes.agg({"count": "max"}).first()[0] > 8


class TestTornCommitRefusal:
    """Data files without a _SUCCESS marker are a torn job commit
    (v1 commitJob merges task files sequentially; a crash mid-merge
    leaves a subset of final-named part files). Folding them would
    bake partial rows in; skipping them silently would lose durable
    marker-less batches. Compaction refuses loudly instead."""

    def test_minhash_compact_refuses_on_torn_batch(self, spark, tmp_path):
        import glob as _glob
        import os as _os

        p = str(tmp_path / "idx")
        write_minhash_index(_docs_df(spark, DOCS), p)
        append_minhash_index(_docs_df(spark, DAY1), p, batch_token="d1")
        root = _resolve_minhash_index(spark, p)[1]
        # simulate the torn commit: marker gone, part files remain
        _os.remove(_os.path.join(root, "bands", "batch=d1", "_SUCCESS"))
        assert _glob.glob(_os.path.join(root, "bands", "batch=d1", "part-*"))
        with pytest.raises(RuntimeError, match="torn job commit"):
            compact_minhash_index(spark, p)
        # replay completes the fold (same token rewrites both sides),
        # after which compaction proceeds
        append_minhash_index(_docs_df(spark, DAY1), p, batch_token="d1")
        assert compact_minhash_index(spark, p) is True
        assert _probe_pairs(spark, p, DAY1[0][1] + "!") == {(99, 11)}

    def test_ivf_compact_refuses_on_torn_batch(self, spark, tmp_path):
        import glob as _glob
        import os as _os

        p = str(tmp_path / "ivf")
        write_ivf_index(_vecs(spark, range(60)), p, n_centroids=4, n_iters=1)
        new = _vecs(spark, range(1000, 1005), seed=7)
        append_ivf_index(new, p, batch_token="d1")
        root = _resolve_ivf_index(spark, p)[1]
        _os.remove(_os.path.join(root, "cells", "batch=d1", "_SUCCESS"))
        assert _glob.glob(
            _os.path.join(root, "cells", "batch=d1", "centroid_id=*", "part-*")
        )
        with pytest.raises(RuntimeError, match="torn job commit"):
            compact_ivf_index(spark, p)
        append_ivf_index(new, p, batch_token="d1")  # replay heals
        assert compact_ivf_index(spark, p) is True


class TestMaintenancePipeline:
    """pipeline.runner.maintenance_pipeline: the maintain jobs as
    declared tasks — one per index, all feeding maintain_report —
    runnable as one scheduled tick (r9 verdict task 7)."""

    def _indexes(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            append_bm25_index,
            write_bm25_index,
        )

        ivf = str(tmp_path / "ivf_idx")
        write_ivf_index(_vecs(spark, range(40)), ivf, n_centroids=2,
                        n_iters=1)
        for j in range(3):
            append_ivf_index(
                _vecs(spark, range(50 + 10 * j, 60 + 10 * j)), ivf,
                batch_token=f"d{j}",
            )
        mh = str(tmp_path / "mh_idx")
        write_minhash_index(_docs_df(spark, DOCS), mh)
        append_minhash_index(_docs_df(spark, DAY1), mh, batch_token="d1")
        bm = str(tmp_path / "bm_idx")
        write_bm25_index(
            _docs_df(spark, DOCS + DAY1 + DAY2), bm, n_buckets=8
        )
        return ivf, mh, bm

    def test_one_tick_compacts_and_reports(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.similarity import (
            ivf_index_stats,
        )
        from datawaves_etl_airflow_spark.pipeline.runner import (
            maintenance_pipeline,
        )

        ivf, mh, bm = self._indexes(spark, tmp_path)
        p = maintenance_pipeline(
            spark,
            ivf_indexes=[(ivf, {"max_batches": 2, "vacuum": True})],
            minhash_indexes=[mh],
            bm25_indexes=[(bm, {"max_batches": 4})],
        )
        order = p.order()
        assert order[-1] == "maintain_report"  # deps declared
        assert len(order) == 4
        ctx = p.run()
        rep = ctx["maintain_report"]
        assert set(rep) == {
            "maintain_ivf_ivf_idx",
            "maintain_minhash_mh_idx",
            "maintain_bm25_bm_idx",
        }
        # the ivf index was past its watermark: the tick compacted it
        assert rep["maintain_ivf_ivf_idx"]["compacted"] is True
        assert "vacuumed" in rep["maintain_ivf_ivf_idx"]
        assert rep["maintain_bm25_bm_idx"]["compacted"] is False
        stats = ivf_index_stats(spark, ivf).collect()
        assert max(r["n_batches"] for r in stats) == 1
        # probes keep answering post-tick
        assert ivf_search_index(
            _vecs(spark, range(2)).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ),
            ivf, nprobe=2, k=3,
        ).count() > 0

    def test_duplicate_basenames_get_unique_tasks(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.pipeline.runner import (
            maintenance_pipeline,
        )

        a = str(tmp_path / "a" / "idx")
        b = str(tmp_path / "b" / "idx")
        for path in (a, b):
            write_ivf_index(_vecs(spark, range(10)), path, n_centroids=2,
                            n_iters=1)
        p = maintenance_pipeline(spark, ivf_indexes=[a, b])
        names = [n for n in p.tasks if n != "maintain_report"]
        assert len(names) == 2 and len(set(names)) == 2
        ctx = p.run()
        assert len(ctx["maintain_report"]) == 2


class TestSyncPipeline:
    """sync_pipeline: the release tick as declared tasks — one sync
    per index + a report barrier."""

    def test_one_tick_syncs_both_kinds(self, spark, tmp_path):
        import random

        from pyspark.sql import functions as F

        from datawaves_etl_airflow_spark.operators.similarity import (
            brute_force_topk,
            ivf_search_index,
            write_ivf_index,
        )
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_search_index,
            bm25_topk,
            write_bm25_index,
        )
        from datawaves_etl_airflow_spark.pipeline.runner import (
            sync_pipeline,
        )

        new_docs = spark.createDataFrame(
            [
                (i, f"doc {i} about spark shuffles topic{i % 3}")
                for i in range(30)
            ],
            "doc_id long, text string",
        )
        old_docs = new_docs.filter(F.col("doc_id") % 5 != 0)
        rng = random.Random(3)
        new_vecs = spark.createDataFrame(
            [
                (i, [rng.uniform(-1, 1) for _ in range(8)])
                for i in range(60)
            ],
            "vec_id long, embedding array<double>",
        )
        old_vecs = new_vecs.filter(F.col("vec_id") % 5 != 0)
        from datawaves_etl_airflow_spark.operators.dedup import (
            write_minhash_index,
        )

        bidx = str(tmp_path / "b")
        vidx = str(tmp_path / "v")
        midx = str(tmp_path / "m")
        write_bm25_index(old_docs, bidx, n_buckets=8)
        write_ivf_index(old_vecs, vidx, n_centroids=4, n_iters=1)
        write_minhash_index(old_docs, midx, n_hashes=32, n_bands=16)
        ctx = sync_pipeline(
            bm25_syncs=[(bidx, old_docs, new_docs,
                         {"sync_token": "rel1"})],
            ivf_syncs=[(vidx, old_vecs, new_vecs,
                        {"sync_token": "rel1"})],
            minhash_syncs=[(midx, old_docs, new_docs,
                            {"sync_token": "rel1"})],
        ).run()
        rep = ctx["sync_report"]
        assert set(rep) == {"sync_bm25_b", "sync_ivf_v",
                            "sync_minhash_m"}
        assert rep["sync_bm25_b"]["n_added"] == 6
        assert rep["sync_ivf_v"]["n_added"] == 12
        assert rep["sync_minhash_m"]["n_added"] == 6
        # both indexes now answer as a fresh build over the snapshot
        qs = spark.createDataFrame(
            [(1, "spark topic1")], "query_id long, query_text string"
        )
        got = sorted(
            map(tuple, bm25_search_index(qs, bidx, k=5).collect())
        )
        want = sorted(
            map(tuple, bm25_topk(new_docs, qs, k=5).collect())
        )
        assert got == want
        vq = new_vecs.limit(3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got_v = sorted(
            map(
                tuple,
                ivf_search_index(vq, vidx, nprobe=4, k=5).collect(),
            )
        )
        want_v = sorted(
            map(tuple, brute_force_topk(new_vecs, vq, k=5).collect())
        )
        assert got_v == want_v


    def test_bare_path_entry_fails_fast(self, spark):
        import pytest

        from datawaves_etl_airflow_spark.pipeline.runner import (
            sync_pipeline,
        )

        # the maintenance entry shape (a bare path) must not be
        # silently character-sliced into (path[0], path[1], path[2])
        with pytest.raises(ValueError, match="sync entry"):
            sync_pipeline(bm25_syncs=["/data/idx"])
