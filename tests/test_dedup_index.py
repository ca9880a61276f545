"""Incremental MinHash dedup index: batch-vs-corpus pairs equal a
full recompute restricted to the batch; parameter contract travels
with the data."""

from __future__ import annotations

import pytest

from datawaves_etl_airflow_spark.operators.dedup import (
    append_minhash_index,
    dedup_against_index,
    minhash_dedup_pairs,
    read_minhash_index_meta,
    write_minhash_index,
)

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

    def test_corrupt_marker_raises(self, spark, tmp_path, index_path):
        from datawaves_etl_airflow_spark.sources.fs import write_text

        write_text(
            spark, index_path + "/_minhash_index.json", "{not json"
        )
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        with pytest.raises(ValueError, match="corrupt MinHash index"):
            dedup_against_index(batch, index_path)

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
        sets = spark.read.parquet(index_path + "/sets")
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
            index_path + "/sets/batch=day1"
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
        files_before = {
            f: os.path.getmtime(f)
            for f in glob.glob(index_path + "/sets/batch=day1/*")
        }
        append_minhash_index(batch, index_path, batch_token="day1")
        files_after = {
            f: os.path.getmtime(f)
            for f in glob.glob(index_path + "/sets/batch=day1/*")
        }
        assert files_before == files_after

    def test_pre_batch_flat_layout_rejected_loudly(self, spark, index_path):
        """A layoutless marker over FLAT part files (the truly old
        layout) is rejected with the rebuild message — while a
        layoutless marker over batch= dirs is accepted (see
        test_pre_versioning_batch_marker_accepted)."""
        from datawaves_etl_airflow_spark.sources.fs import (
            delete_path,
            write_text,
        )

        write_text(
            spark,
            index_path + "/_minhash_index.json",
            '{"k": 3, "n_hashes": 64, "n_bands": 16}',  # no layout key
        )
        # flatten: replace bands/ with part files directly at its root
        flat = spark.read.parquet(index_path + "/bands").select(
            "id", "band_id", "band_hash"
        ).collect()
        delete_path(spark, index_path + "/bands")
        spark.createDataFrame(
            flat, "id long, band_id int, band_hash long"
        ).write.parquet(index_path + "/bands")
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        with pytest.raises(ValueError, match="batch-v1"):
            dedup_against_index(batch, index_path)

    def test_crashed_rebuild_fails_loudly_not_stale(self, spark, index_path):
        """Marker-first rebuild: simulate a crash after the marker +
        data deletion but before the new write — the next probe must
        raise the missing-marker error, never read stale data."""
        from datawaves_etl_airflow_spark.sources.fs import delete_path

        delete_path(spark, index_path + "/_minhash_index.json")
        delete_path(spark, index_path + "/bands")
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        with pytest.raises(ValueError, match="no MinHash index marker"):
            dedup_against_index(batch, index_path)

    def test_pre_versioning_batch_marker_accepted(self, spark, index_path):
        """A marker without the layout key over a batch=-dir index (the
        immediately-previous code version) stays readable."""
        from datawaves_etl_airflow_spark.sources.fs import write_text

        write_text(
            spark,
            index_path + "/_minhash_index.json",
            '{"k": 3, "n_hashes": 64, "n_bands": 16}',
        )
        batch = spark.createDataFrame(
            [BATCH[0]], "doc_id long, text string"
        )
        got = _pairs(dedup_against_index(batch, index_path, threshold=0.5))
        assert got == {(10, 1)}
