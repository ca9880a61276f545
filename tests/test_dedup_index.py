"""Incremental MinHash dedup index: batch-vs-corpus pairs equal a
full recompute restricted to the batch; parameter contract travels
with the data."""

from __future__ import annotations

import pytest

from datawaves_etl_airflow_spark.operators.dedup import (
    _resolve_minhash_index,
    append_minhash_index,
    dedup_against_index,
    minhash_dedup_pairs,
    read_minhash_index_meta,
    vacuum_minhash_index,
    write_minhash_index,
)


def _data_root(spark, index_path):
    """The manifest-resolved versions/ dir holding bands/ and sets/."""
    return _resolve_minhash_index(spark, index_path)[1]


def _write_legacy_index(spark, docs, path, layout_key=True):
    """A PRE-MANIFEST index (bands/sets at the root + marker file) —
    what write_minhash_index produced before the pointer-flip commit;
    kept constructible so the legacy read fallback stays tested."""
    import json

    from datawaves_etl_airflow_spark.operators.dedup import (
        minhash_band_rows_np,
        word_shingle_hash_sets,
    )
    from datawaves_etl_airflow_spark.sources.fs import write_text

    sets = word_shingle_hash_sets(docs, k=3).persist()
    bands = minhash_band_rows_np(sets, 64, 16)
    bands.write.mode("overwrite").parquet(path + "/bands/batch=base")
    sets.write.mode("overwrite").parquet(path + "/sets/batch=base")
    sets.unpersist()
    marker = {"k": 3, "n_hashes": 64, "n_bands": 16}
    if layout_key:
        marker["layout"] = "batch-v1"
    write_text(spark, path + "/_minhash_index.json", json.dumps(marker))

BASE = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs before noon today ok"),
    (3, "a completely unrelated sentence about spark physical planning"),
    (4, "rows columns partitions shuffles and the optimizer that rules"),
]
# near-dup of corpus doc 1, near-dup pair within the batch (11, 12),
# and a clean doc
BATCH = [
    (10, "the quick brown fox jumps over the lazy dog again and again!"),
    (11, "entirely novel text streaming through watermarked windows now"),
    (12, "entirely novel text streaming through watermarked windows then"),
    (13, "nothing here resembles anything else in corpus or batch at all"),
]


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


@pytest.fixture()
def index_path(spark, tmp_path):
    docs = spark.createDataFrame(BASE, "doc_id long, text string")
    p = str(tmp_path / "mh_index")
    write_minhash_index(docs, p)
    return p


class TestIncrementalDedup:
    def test_matches_full_recompute_restricted_to_batch(
        self, spark, index_path
    ):
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        got = _pairs(dedup_against_index(batch, index_path, threshold=0.5))

        full = minhash_dedup_pairs(
            spark.createDataFrame(
                BASE + BATCH, "doc_id long, text string"
            ),
            threshold=0.5,
        )
        batch_ids = {r[0] for r in BATCH}
        want = set()
        for a, b in _pairs(full):
            if a in batch_ids or b in batch_ids:
                # index probe orients new-vs-corpus as (new, corpus)
                if a in batch_ids and b not in batch_ids:
                    want.add((a, b))
                elif b in batch_ids and a not in batch_ids:
                    want.add((b, a))
                else:
                    want.add((min(a, b), max(a, b)))
        assert got == want
        assert (10, 1) in got  # batch-vs-corpus near-dup found
        assert (11, 12) in got  # within-batch near-dup found
        assert not any(13 in p for p in got)  # clean doc stays clean

    def test_append_then_probe_sees_new_corpus(self, spark, index_path):
        first = spark.createDataFrame(BATCH, "doc_id long, text string")
        append_minhash_index(first, index_path)
        probe = spark.createDataFrame(
            [(20, "entirely novel text streaming through watermarked "
                  "windows soon")],
            "doc_id long, text string",
        )
        got = _pairs(dedup_against_index(probe, index_path, threshold=0.5))
        # matches the APPENDED docs 11/12, not just the original corpus
        assert got == {(20, 11), (20, 12)}

    def test_meta_contract(self, spark, index_path):
        meta = read_minhash_index_meta(spark, index_path)
        assert meta == {"k": 3, "n_hashes": 64, "n_bands": 16}

    def test_missing_marker_raises(self, spark, tmp_path):
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        with pytest.raises(ValueError, match="no MinHash index marker"):
            dedup_against_index(batch, str(tmp_path / "nope"))

    def test_corrupt_manifest_raises(self, spark, tmp_path, index_path):
        import glob
        import os

        from datawaves_etl_airflow_spark.sources.fs import write_text

        manifests = glob.glob(
            os.path.join(index_path, "_manifests", "manifest-*.json")
        )
        assert manifests
        # write_text, not open(): the local Hadoop FS is checksummed,
        # and a raw python overwrite corrupts the .crc instead of the
        # payload
        write_text(spark, manifests[0], "{not json")
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        with pytest.raises(ValueError, match="corrupt manifest"):
            dedup_against_index(batch, index_path)

    def test_corrupt_legacy_marker_raises(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.sources.fs import write_text

        p = str(tmp_path / "legacy")
        docs = spark.createDataFrame(BASE, "doc_id long, text string")
        _write_legacy_index(spark, docs, p)
        write_text(spark, p + "/_minhash_index.json", "{not json")
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        with pytest.raises(ValueError, match="corrupt MinHash index"):
            dedup_against_index(batch, p)

    def test_legacy_index_probe_and_append(self, spark, tmp_path):
        """Pre-manifest indexes stay fully usable through the fallback
        — probes AND idempotent folds."""
        p = str(tmp_path / "legacy")
        docs = spark.createDataFrame(BASE, "doc_id long, text string")
        _write_legacy_index(spark, docs, p)
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        got = _pairs(dedup_against_index(batch, p, threshold=0.5))
        assert (10, 1) in got and (11, 12) in got
        append_minhash_index(batch, p, batch_token="day1")
        probe = spark.createDataFrame(
            [(20, BATCH[1][1] + "!")], "doc_id long, text string"
        )
        got2 = _pairs(dedup_against_index(probe, p, threshold=0.5))
        assert got2 == {(20, 11), (20, 12)}

    def test_reingested_id_not_self_paired(self, spark, index_path):
        """A batch doc whose id already exists in the index must not
        pair with itself."""
        batch = spark.createDataFrame(
            [BASE[0]], "doc_id long, text string"
        )
        got = _pairs(dedup_against_index(batch, index_path, threshold=0.5))
        assert (1, 1) not in got


class TestCrashSafeFolds:
    """The batch=<token> fold layout: same-token retries overwrite
    (never duplicate), and a crash between the two writes leaves the
    batch merely unindexed — fail-safe, not wrong."""

    def test_same_token_retry_no_duplicates(self, spark, index_path):
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        append_minhash_index(batch, index_path, batch_token="day1")
        append_minhash_index(batch, index_path, batch_token="day1")
        sets = spark.read.parquet(_data_root(spark, index_path) + "/sets")
        ids = [r["id"] for r in sets.select("id").collect()]
        assert len(ids) == len(set(ids))  # one set row per doc

    def test_crash_between_writes_is_failsafe_then_retry_completes(
        self, spark, index_path
    ):
        """Simulate the crash window: sets written, bands not. The
        probe must form NO candidates against the half-folded batch
        (missing, never wrong); the same-token retry completes it."""
        from datawaves_etl_airflow_spark.operators.dedup import (
            minhash_band_rows_np,
            read_minhash_index_meta,
            word_shingle_hash_sets,
        )

        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        meta = read_minhash_index_meta(spark, index_path)
        half = word_shingle_hash_sets(batch, k=meta["k"])
        # crash simulation: ONLY the sets write of batch 'day1' lands
        half.write.mode("overwrite").parquet(
            _data_root(spark, index_path) + "/sets/batch=day1"
        )
        probe = spark.createDataFrame(
            [(30, BATCH[1][1] + "!")], "doc_id long, text string"
        )
        got = dedup_against_index(probe, index_path, threshold=0.5)
        assert got.count() == 0  # unindexed, not wrong
        # retry with the same token completes the fold idempotently
        append_minhash_index(batch, index_path, batch_token="day1")
        got2 = {
            (r["id_a"], r["id_b"])
            for r in dedup_against_index(
                probe, index_path, threshold=0.5
            ).collect()
        }
        assert got2 == {(30, 11), (30, 12)}  # 11 and 12 are near-dups

    def test_rebuild_clears_stale_batches(self, spark, index_path):
        """write_minhash_index over a used path must wipe previously
        folded batches — stale appends must not report duplicates
        against docs no longer in the corpus."""
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        append_minhash_index(batch, index_path, batch_token="day1")
        # rebuild with a corpus that does NOT contain doc 11
        rebuilt = spark.createDataFrame(BASE, "doc_id long, text string")
        write_minhash_index(rebuilt, index_path)
        probe = spark.createDataFrame(
            [(20, BATCH[1][1] + "!")], "doc_id long, text string"
        )
        got = _pairs(dedup_against_index(probe, index_path, threshold=0.5))
        assert got == set()  # 11/12 are gone with the rebuild

    def test_retry_after_complete_fold_never_deletes(
        self, spark, index_path, tmp_path
    ):
        """A same-token retry of a COMPLETE fold is a no-op: the sets
        dir keeps its exact files (mtime-stable), so no crash window
        can re-open on the retry path."""
        import glob
        import os

        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        append_minhash_index(batch, index_path, batch_token="day1")
        sets_day1 = _data_root(spark, index_path) + "/sets/batch=day1/*"
        files_before = {
            f: os.path.getmtime(f) for f in glob.glob(sets_day1)
        }
        assert files_before
        append_minhash_index(batch, index_path, batch_token="day1")
        files_after = {
            f: os.path.getmtime(f) for f in glob.glob(sets_day1)
        }
        assert files_before == files_after

    def test_pre_batch_flat_layout_rejected_loudly(self, spark, tmp_path):
        """A layoutless marker over FLAT part files (the truly old
        layout) is rejected with the rebuild message — while a
        layoutless marker over batch= dirs is accepted (see
        test_pre_versioning_batch_marker_accepted)."""
        from datawaves_etl_airflow_spark.operators.dedup import (
            minhash_band_rows_np,
            word_shingle_hash_sets,
        )
        from datawaves_etl_airflow_spark.sources.fs import write_text

        p = str(tmp_path / "flat")
        docs = spark.createDataFrame(BASE, "doc_id long, text string")
        sets = word_shingle_hash_sets(docs, k=3)
        minhash_band_rows_np(sets, 64, 16).write.parquet(p + "/bands")
        sets.write.parquet(p + "/sets")
        write_text(
            spark,
            p + "/_minhash_index.json",
            '{"k": 3, "n_hashes": 64, "n_bands": 16}',  # no layout key
        )
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        with pytest.raises(ValueError, match="batch-v1"):
            dedup_against_index(batch, p)

    def test_pre_versioning_batch_marker_accepted(self, spark, tmp_path):
        """A marker without the layout key over a batch=-dir index (two
        code versions back) stays readable."""
        p = str(tmp_path / "noversion")
        docs = spark.createDataFrame(BASE, "doc_id long, text string")
        _write_legacy_index(spark, docs, p, layout_key=False)
        batch = spark.createDataFrame(
            [BATCH[0]], "doc_id long, text string"
        )
        got = _pairs(dedup_against_index(batch, p, threshold=0.5))
        assert got == {(10, 1)}


class TestPointerFlipRebuild:
    """Rebuilds commit by manifest pointer flip: a crash ANYWHERE
    mid-rebuild leaves the old index live and probes answering — at
    100 TB a rebuild is days of compute and must never destroy the
    state it replaces (round-4 verdict task #2 / ADVICE on the old
    marker-first in-place rebuild)."""

    def _probe_finds_corpus_dup(self, spark, path):
        probe = spark.createDataFrame(
            [(10, BASE[0][1] + "!")], "doc_id long, text string"
        )
        return _pairs(dedup_against_index(probe, path, threshold=0.5))

    def test_crash_before_manifest_publish_keeps_old_live(
        self, spark, index_path, monkeypatch
    ):
        from datawaves_etl_airflow_spark.sources import manifest as mf

        real = mf.create_text_exclusive
        state = {"armed": True}

        def crashing(spark_, path_, content):
            if state["armed"] and "manifest-" in path_:
                state["armed"] = False
                raise RuntimeError("injected crash before index commit")
            return real(spark_, path_, content)

        monkeypatch.setattr(mf, "create_text_exclusive", crashing)
        other = spark.createDataFrame(
            [(99, "totally different corpus after the rebuild attempt")],
            "doc_id long, text string",
        )
        with pytest.raises(RuntimeError, match="injected crash"):
            write_minhash_index(other, index_path)
        # the old index is STILL live: probes answer with old corpus
        assert self._probe_finds_corpus_dup(spark, index_path) == {(10, 1)}
        # retry commits; the orphaned attempt is vacuumable garbage
        write_minhash_index(other, index_path)
        assert self._probe_finds_corpus_dup(spark, index_path) == set()

    def test_partial_version_dir_is_invisible_and_vacuumable(
        self, spark, index_path
    ):
        """A crash mid-data-write leaves a partial versions/ dir no
        manifest references. Probes are unaffected throughout; vacuum
        SPARES it while its number is above the current manifest
        version (it is indistinguishable from an in-flight rebuild —
        deleting one mid-write would destroy days of compute) and
        reclaims it once a later rebuild publishes past it."""
        import os

        # current manifest is version 1 → a crashed rebuild's dir is v2
        stray = os.path.join(index_path, "versions", "v2-deadbeef")
        os.makedirs(os.path.join(stray, "bands"))
        with open(os.path.join(stray, "bands", "half.parquet"), "w") as f:
            f.write("not parquet")
        assert self._probe_finds_corpus_dup(spark, index_path) == {(10, 1)}
        deleted = vacuum_minhash_index(spark, index_path)
        assert not any("v2-deadbeef" in p for p in deleted)
        assert os.path.exists(stray)  # spared: could be in-flight
        assert self._probe_finds_corpus_dup(spark, index_path) == {(10, 1)}
        # a successful rebuild publishes version 2 → the orphan is now
        # provably dead and vacuum reclaims it
        write_minhash_index(
            spark.createDataFrame(BASE, "doc_id long, text string"),
            index_path,
        )
        deleted = vacuum_minhash_index(spark, index_path)
        assert any("v2-deadbeef" in p for p in deleted)
        assert not os.path.exists(stray)
        assert self._probe_finds_corpus_dup(spark, index_path) == {(10, 1)}

    def test_rebuild_then_vacuum_drops_old_version(
        self, spark, index_path
    ):
        import glob
        import os

        old_root = _data_root(spark, index_path)
        other = spark.createDataFrame(
            [(99, "totally different corpus after this full rebuild ok")],
            "doc_id long, text string",
        )
        write_minhash_index(other, index_path)
        # both versions on disk until vacuum; probes already see v2
        assert os.path.isdir(old_root)
        assert self._probe_finds_corpus_dup(spark, index_path) == set()
        vacuum_minhash_index(spark, index_path)
        assert not os.path.exists(old_root)
        assert (
            len(glob.glob(os.path.join(index_path, "versions", "*"))) == 1
        )
        assert (
            len(
                glob.glob(
                    os.path.join(index_path, "_manifests", "manifest-*")
                )
            )
            == 1
        )

    def test_legacy_index_rebuild_migrates_and_vacuums_residue(
        self, spark, tmp_path
    ):
        """Rebuilding over a pre-manifest index flips to the manifest
        layout; vacuum clears the legacy root bands/sets + marker."""
        import os

        p = str(tmp_path / "legacy")
        docs = spark.createDataFrame(BASE, "doc_id long, text string")
        _write_legacy_index(spark, docs, p)
        write_minhash_index(docs, p)  # migrate: same corpus, new layout
        assert self._probe_finds_corpus_dup(spark, p) == {(10, 1)}
        vacuum_minhash_index(spark, p)
        assert not os.path.exists(os.path.join(p, "bands"))
        assert not os.path.exists(os.path.join(p, "_minhash_index.json"))
        assert self._probe_finds_corpus_dup(spark, p) == {(10, 1)}


class TestMinhashIndexStats:
    def test_one_row_summary_tracks_appends_and_compaction(
        self, spark, tmp_path
    ):
        from datawaves_etl_airflow_spark.operators.dedup import (
            append_minhash_index,
            compact_minhash_index,
            minhash_index_stats,
            write_minhash_index,
        )

        docs = spark.createDataFrame(
            [
                (i, f"doc number {i} with some distinct words {i * 7}")
                for i in range(20)
            ],
            "doc_id long, text string",
        )
        day = spark.createDataFrame(
            [
                (100 + i, f"fresh batch doc {i} more words {i * 13}")
                for i in range(5)
            ],
            "doc_id long, text string",
        )
        p = str(tmp_path / "mhidx")
        write_minhash_index(docs, p)
        append_minhash_index(day, p, batch_token="d1")
        row = minhash_index_stats(spark, p).first()
        assert row["n_docs"] == 25
        assert row["n_batches"] == 2
        assert row["max_bucket"] >= 1
        assert row["mean_bucket"] >= 1.0
        assert row["p95_bucket"] <= row["max_bucket"]
        assert compact_minhash_index(spark, p) is True
        after = minhash_index_stats(spark, p).first()
        assert after["n_docs"] == 25
        assert after["n_batches"] == 1  # folded to base
        # bucket occupancy is invariant under compaction
        assert after["max_bucket"] == row["max_bucket"]
        assert after["mean_bucket"] == row["mean_bucket"]


class TestMaintainMinhashIndex:
    def _indexed(self, spark, tmp_path, n_appends):
        from datawaves_etl_airflow_spark.operators.dedup import (
            append_minhash_index,
            write_minhash_index,
        )

        docs = spark.createDataFrame(
            [
                (i, f"doc number {i} with some distinct words {i * 7}")
                for i in range(20)
            ],
            "doc_id long, text string",
        )
        p = str(tmp_path / "mhm")
        write_minhash_index(docs, p)
        for j in range(n_appends):
            day = spark.createDataFrame(
                [
                    (1000 * (j + 1) + i, f"batch {j} doc {i} words {i * 13}")
                    for i in range(5)
                ],
                "doc_id long, text string",
            )
            append_minhash_index(day, p, batch_token=f"d{j}")
        return p

    def test_noop_below_watermarks(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            maintain_minhash_index,
        )
        from datawaves_etl_airflow_spark.sources.manifest import (
            VersionedManifest,
        )

        p = self._indexed(spark, tmp_path, n_appends=2)
        before = VersionedManifest(p).latest_version(spark)
        rep = maintain_minhash_index(spark, p, max_batches=8)
        assert rep["compacted"] is False
        assert rep["n_batches"] == 3
        # max_bucket here is tiny; the default watermark is the
        # 10k production valve — nowhere near firing
        assert rep["crowd_flagged"] is False
        assert VersionedManifest(p).latest_version(spark) == before

    def test_compacts_past_watermark_probe_identical(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            dedup_against_index,
            maintain_minhash_index,
        )

        p = self._indexed(spark, tmp_path, n_appends=3)
        batch = spark.createDataFrame(
            [(9000 + i, f"doc number {i} with some distinct words {i * 7}")
             for i in range(6)],
            "doc_id long, text string",
        )
        before = _pairs(dedup_against_index(batch, p, threshold=0.5))
        rep = maintain_minhash_index(spark, p, max_batches=2)
        assert rep["compacted"] is True
        assert rep["compaction_race_lost"] is False
        after = _pairs(dedup_against_index(batch, p, threshold=0.5))
        assert after == before
        rep2 = maintain_minhash_index(spark, p, max_batches=2)
        assert rep2["compacted"] is False
        assert rep2["n_batches"] == 1

    def test_crowd_flag_fires_on_boilerplate_bucket(self, spark, tmp_path):
        """A shared-boilerplate crowd collapses many docs into one
        band bucket: with the watermark dialed to a test-sized value,
        the flag must fire WITHOUT triggering a compaction (crowding
        is not a fold problem)."""
        from datawaves_etl_airflow_spark.operators.dedup import (
            maintain_minhash_index,
            write_minhash_index,
        )

        boiler = spark.createDataFrame(
            [(i, "identical boilerplate header repeated everywhere")
             for i in range(30)],
            "doc_id long, text string",
        )
        p = str(tmp_path / "mhcrowd")
        write_minhash_index(boiler, p)
        rep = maintain_minhash_index(spark, p, max_bucket_watermark=10)
        assert rep["crowd_flagged"] is True
        assert rep["max_bucket"] == 30
        assert rep["compacted"] is False


class TestMinhashDeletes:
    """delete_from_minhash_index: tombstone deletes — a removed doc
    must stop claiming new batch rows as its near-duplicates at the
    next probe, and compaction applies the delete physically on both
    sides (bands AND sets)."""

    def test_deleted_doc_stops_claiming_neardups(self, spark, index_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            delete_from_minhash_index,
        )

        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        before = _pairs(
            dedup_against_index(batch, index_path, threshold=0.5)
        )
        assert (10, 1) in before  # doc 10 is a near-dup of corpus doc 1
        delete_from_minhash_index(
            spark.createDataFrame([(1,)], "id long"), index_path,
            delete_token="rm1",
        )
        after = _pairs(
            dedup_against_index(batch, index_path, threshold=0.5)
        )
        assert (10, 1) not in after
        # only pairs touching the deleted id disappear
        assert after == {p for p in before if 1 not in p}
        # replay + absent-id delete are value no-ops
        delete_from_minhash_index(
            spark.createDataFrame([(1,), (999,)], "id long"), index_path,
            delete_token="rm1",
        )
        assert (
            _pairs(dedup_against_index(batch, index_path, threshold=0.5))
            == after
        )

    def test_compaction_applies_both_sides_and_token_durable(
        self, spark, index_path
    ):
        import glob as _glob
        import os as _os

        from datawaves_etl_airflow_spark.operators.dedup import (
            compact_minhash_index,
            delete_from_minhash_index,
        )
        from datawaves_etl_airflow_spark.sources.manifest import (
            VersionedManifest,
        )

        delete_from_minhash_index(
            spark.createDataFrame([(1,)], "id long"), index_path,
            delete_token="rm1",
        )
        assert compact_minhash_index(spark, index_path) is True
        root = _data_root(spark, index_path)
        bands = spark.read.parquet(root + "/bands")
        sets = spark.read.parquet(root + "/sets")
        assert bands.filter("id = 1").count() == 0
        assert sets.filter("id = 1").count() == 0
        assert sets.filter("id = 2").count() == 1  # survivors intact
        assert not _glob.glob(_os.path.join(root, "tombstones", "*"))
        # durable token: replay after compaction must not re-tombstone
        _, payload = VersionedManifest(index_path).resolve(spark)
        assert "rm1" in payload["folded_deletes"]
        assert "rm1" not in payload["folded"]
        delete_from_minhash_index(
            spark.createDataFrame([(1,)], "id long"), index_path,
            delete_token="rm1",
        )
        assert not _glob.glob(_os.path.join(root, "tombstones", "*"))

    def test_torn_tombstone_refuses_compaction(self, spark, index_path):
        import os as _os

        from datawaves_etl_airflow_spark.operators.dedup import (
            compact_minhash_index,
            delete_from_minhash_index,
        )

        delete_from_minhash_index(
            spark.createDataFrame([(2,)], "id long"), index_path,
            delete_token="torn",
        )
        root = _data_root(spark, index_path)
        _os.remove(
            _os.path.join(root, "tombstones", "batch=torn", "_SUCCESS")
        )
        # probes skip the torn delete: doc 2 still indexed
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        dedup_against_index(batch, index_path, threshold=0.5).collect()
        with pytest.raises(RuntimeError, match="torn delete"):
            compact_minhash_index(spark, index_path)

    def test_maintain_fires_on_tombstone_debt(self, spark, index_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            delete_from_minhash_index,
            maintain_minhash_index,
        )

        delete_from_minhash_index(
            spark.createDataFrame([(1,), (2,)], "id long"), index_path,
        )
        rep = maintain_minhash_index(
            spark, index_path, max_tombstone_ratio=0.2
        )
        assert rep["n_tombstones"] == 2
        assert rep["compacted"] is True
        rep2 = maintain_minhash_index(
            spark, index_path, max_tombstone_ratio=0.2
        )
        assert rep2["n_tombstones"] == 0
        assert rep2["compacted"] is False
        assert rep2["n_docs"] == 2

    def test_legacy_and_missing_raise(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            delete_from_minhash_index,
        )

        docs = spark.createDataFrame(BASE, "doc_id long, text string")
        legacy = str(tmp_path / "legacy")
        _write_legacy_index(spark, docs, legacy)
        ids = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="predates the manifest"):
            delete_from_minhash_index(ids, legacy)
        with pytest.raises(Exception, match="index"):
            delete_from_minhash_index(ids, str(tmp_path / "nope"))
