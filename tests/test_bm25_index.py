"""Persisted BM25 inverted index: identical ranking to the in-session
bm25_topk (shared scoring tree), with the probe physically reading only
the query terms' term-hash buckets."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.text import (
    _resolve_bm25_index,
    append_bm25_index,
    bm25_search_index,
    bm25_topk,
    vacuum_bm25_index,
    write_bm25_index,
)


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [
            (i, f"doc number {i} about spark shuffles and data topic{i % 4}")
            for i in range(lo, hi)
        ],
        "doc_id long, text string",
    )


def _queries(spark):
    return spark.createDataFrame(
        [(1, "spark topic1"), (2, "data shuffles")],
        "query_id long, query_text string",
    )


@pytest.fixture()
def index_path(spark, tmp_path):
    p = str(tmp_path / "bm25")
    write_bm25_index(_docs(spark, 0, 20), p, n_buckets=16)
    return p


class TestBm25Index:
    def test_probe_matches_in_session_after_append(self, spark, index_path):
        """build(0..20) + append(20..30) must rank exactly like the
        in-session operator over the union — df/N/avgdl fold
        additively, the scoring tree is shared."""
        append_bm25_index(_docs(spark, 20, 30), index_path, batch_token="d1")
        got = sorted(
            map(tuple, bm25_search_index(_queries(spark), index_path, k=5).collect())
        )
        want = sorted(
            map(tuple, bm25_topk(_docs(spark, 0, 30), _queries(spark), k=5).collect())
        )
        assert got == want

    def test_same_token_replay_is_idempotent(self, spark, index_path):
        append_bm25_index(_docs(spark, 20, 30), index_path, batch_token="d1")
        before = sorted(
            map(tuple, bm25_search_index(_queries(spark), index_path, k=5).collect())
        )
        append_bm25_index(_docs(spark, 20, 30), index_path, batch_token="d1")
        after = sorted(
            map(tuple, bm25_search_index(_queries(spark), index_path, k=5).collect())
        )
        assert after == before

    def test_probe_reads_only_query_term_buckets(self, spark, index_path):
        """Execution-true pruning proof (the IVF pattern): the files
        the probe's postings scan actually reads all belong to the
        probed bucket dirs — a strict subset of the layout."""
        meta, root = _resolve_bm25_index(spark, index_path)
        qterms = ["spark", "topic1", "data", "shuffles"]
        probe_buckets = {
            r["_b"]
            for r in spark.createDataFrame([(t,) for t in qterms], "t string")
            .select(F.pmod(F.xxhash64("t"), F.lit(meta["n_buckets"])).alias("_b"))
            .collect()
        }
        all_buckets = {
            int(os.path.basename(d).split("=")[1])
            for d in glob.glob(root + "/postings/batch=*/bucket=*")
        }
        assert probe_buckets < all_buckets  # pruning has work to do
        pruned = spark.read.parquet(root + "/postings").filter(
            F.col("bucket").isin(sorted(probe_buckets))
        )
        read_files = {
            r["f"]
            for r in pruned.select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        for f in read_files:
            assert int(f.split("bucket=")[1].split("/")[0]) in probe_buckets

    def test_rebuild_pointer_flip_and_vacuum(self, spark, index_path):
        _, old_root = _resolve_bm25_index(spark, index_path)
        write_bm25_index(_docs(spark, 0, 10), index_path, n_buckets=8)
        meta, new_root = _resolve_bm25_index(spark, index_path)
        assert meta["n_buckets"] == 8 and new_root != old_root
        assert os.path.isdir(old_root)
        deleted = vacuum_bm25_index(spark, index_path)
        assert any(old_root.rstrip("/") in d for d in deleted)
        assert not os.path.exists(old_root)
        assert bm25_search_index(_queries(spark), index_path, k=5).count() > 0

    def test_missing_index_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="no BM25 index manifest"):
            bm25_search_index(_queries(spark), str(tmp_path / "nope"))


class TestBm25Compaction:
    def test_compact_folds_batches_probe_identical(self, spark, index_path):
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_index_stats,
            compact_bm25_index,
        )

        append_bm25_index(_docs(spark, 20, 25), index_path, batch_token="d1")
        append_bm25_index(_docs(spark, 25, 30), index_path, batch_token="d2")
        before = sorted(
            map(tuple, bm25_search_index(_queries(spark), index_path, k=5).collect())
        )
        row = bm25_index_stats(spark, index_path).first()
        assert row["n_batches"] == 3 and row["n_docs"] == 30
        assert compact_bm25_index(spark, index_path) is True
        after_row = bm25_index_stats(spark, index_path).first()
        assert after_row["n_batches"] == 1
        assert after_row["n_docs"] == 30  # meta folded additively
        after = sorted(
            map(tuple, bm25_search_index(_queries(spark), index_path, k=5).collect())
        )
        assert after == before

    def test_replay_after_compaction_noops_on_folded_token(
        self, spark, index_path
    ):
        """The duplication window: a fold compacted into base must not
        re-append on a late replay — postings AND the meta row would
        double-count."""
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_index_stats,
            compact_bm25_index,
        )

        append_bm25_index(_docs(spark, 20, 30), index_path, batch_token="d1")
        assert compact_bm25_index(spark, index_path) is True
        before = sorted(
            map(tuple, bm25_search_index(_queries(spark), index_path, k=5).collect())
        )
        append_bm25_index(_docs(spark, 20, 30), index_path, batch_token="d1")
        assert bm25_index_stats(spark, index_path).first()["n_docs"] == 30
        after = sorted(
            map(tuple, bm25_search_index(_queries(spark), index_path, k=5).collect())
        )
        assert after == before

    def test_torn_commit_refuses_loudly(self, spark, index_path):
        import glob as _glob

        from datawaves_etl_airflow_spark.operators.text import (
            _resolve_bm25_index,
            compact_bm25_index,
        )

        append_bm25_index(_docs(spark, 20, 30), index_path, batch_token="d1")
        _, root = _resolve_bm25_index(spark, index_path)
        os.remove(os.path.join(root, "postings", "batch=d1", "_SUCCESS"))
        assert _glob.glob(root + "/postings/batch=d1/bucket=*/part-*")
        with pytest.raises(RuntimeError, match="torn job commit"):
            compact_bm25_index(spark, index_path)


class TestMaintainBm25Index:
    def test_watermark_policy_and_vacuum(self, spark, index_path):
        from datawaves_etl_airflow_spark.operators.text import (
            _resolve_bm25_index,
            maintain_bm25_index,
        )

        for j in range(3):
            append_bm25_index(
                _docs(spark, 20 + 5 * j, 25 + 5 * j),
                index_path,
                batch_token=f"d{j}",
            )
        _, old_root = _resolve_bm25_index(spark, index_path)
        rep = maintain_bm25_index(
            spark, index_path, max_batches=2, vacuum=True
        )
        assert rep["compacted"] is True
        assert any(old_root.rstrip("/") in d for d in rep["vacuumed"])
        assert not os.path.exists(old_root)
        rep2 = maintain_bm25_index(spark, index_path, max_batches=2)
        assert rep2["compacted"] is False and rep2["n_batches"] == 1

    def test_hot_bucket_flag_on_stopword_corpus(self, spark, tmp_path):
        """Every doc shares the same few words → their buckets crowd:
        the flag must fire without compaction."""
        from datawaves_etl_airflow_spark.operators.text import (
            maintain_bm25_index,
        )

        boiler = spark.createDataFrame(
            [(i, f"the same header everywhere unique{i}") for i in range(40)],
            "doc_id long, text string",
        )
        p = str(tmp_path / "bmhot")
        write_bm25_index(boiler, p, n_buckets=32)
        rep = maintain_bm25_index(spark, p, max_bucket_ratio=3.0)
        assert rep["hot_buckets_flagged"] is True
        assert rep["compacted"] is False

    def test_hot_term_heat_is_diagnosed_and_never_resized(
        self, spark, tmp_path
    ):
        """One stopword-grade term dominates its bucket: the r10 rule
        must diagnose hot_term and SKIP the resize (a term's postings
        are indivisible — more buckets cannot spread them; the answer
        is the probe-side max_df_ratio valve)."""
        from datawaves_etl_airflow_spark.operators.text import (
            _resolve_bm25_index,
            maintain_bm25_index,
        )

        boiler = spark.createDataFrame(
            [(i, f"the unique{i}") for i in range(40)],
            "doc_id long, text string",
        )
        p = str(tmp_path / "bmhotterm")
        write_bm25_index(boiler, p, n_buckets=32)
        meta_before, root_before = _resolve_bm25_index(spark, p)
        rep = maintain_bm25_index(
            spark, p, max_bucket_ratio=3.0, resize_on_hot=256
        )
        assert rep["hot_buckets_flagged"] is True
        assert rep["hot_cause"] == "hot_term"
        assert rep["max_term_postings"] == 40  # 'the' in every doc
        assert rep["resized"] is False
        meta_after, root_after = _resolve_bm25_index(spark, p)
        assert meta_after["n_buckets"] == meta_before["n_buckets"]
        assert root_after == root_before  # nothing was republished


class TestResizeBm25Index:
    def test_collision_heat_resize_spreads_and_ranks_identically(
        self, spark, tmp_path
    ):
        """Many distinct terms crammed into 2 buckets: maintain with
        resize_on_hot diagnoses collisions, re-buckets to 64 in one
        postings pass, heat disperses, and probe ranking is UNCHANGED
        (bucketing is pure layout — df/tf/N/avgdl never move)."""
        from datawaves_etl_airflow_spark.operators.text import (
            _resolve_bm25_index,
            maintain_bm25_index,
        )

        docs = _docs(spark, 0, 40)
        p = str(tmp_path / "bmresize")
        write_bm25_index(docs, p, n_buckets=2)
        before = sorted(
            map(tuple, bm25_search_index(_queries(spark), p, k=5).collect())
        )
        # the 2-bucket split of this corpus is 149/211 postings
        # (mean 180, ratio 1.17) — 1.1 fires deterministically
        rep = maintain_bm25_index(
            spark, p, max_bucket_ratio=1.1, resize_on_hot=64
        )
        assert rep["hot_buckets_flagged"] is True
        assert rep["hot_cause"] == "collisions"
        assert rep["resized"] is True
        meta, _root = _resolve_bm25_index(spark, p)
        assert meta["n_buckets"] == 64
        after = sorted(
            map(tuple, bm25_search_index(_queries(spark), p, k=5).collect())
        )
        assert after == before
        # collision heat actually dispersed: the hottest bucket shrank
        # (an observe-only tick reads the resized layout; whether any
        # residual heat is hot_term or a further-splittable collision
        # is hash luck, so only the monotone claim is pinned)
        rep2 = maintain_bm25_index(spark, p, max_bucket_ratio=3.0)
        assert rep2["max_bucket"] < rep["max_bucket"]
        assert rep2["resized"] is False  # observe-only: never acts

    def test_resize_folds_batches_and_survives_replay(
        self, spark, tmp_path
    ):
        """Resize inherits the compaction contract: appended batches
        fold into the re-bucketed base, a late same-token replay
        no-ops via the folded list, and later appends hash into the
        NEW bucket count."""
        from datawaves_etl_airflow_spark.operators.text import (
            _resolve_bm25_index,
            bm25_index_stats,
            resize_bm25_index,
        )

        p = str(tmp_path / "bmresize2")
        write_bm25_index(_docs(spark, 0, 20), p, n_buckets=4)
        append_bm25_index(_docs(spark, 20, 30), p, batch_token="d1")
        assert resize_bm25_index(spark, p, 32) is True
        row = bm25_index_stats(spark, p).first()
        assert row["n_batches"] == 1 and row["n_docs"] == 30
        # late replay of the folded token: no-op
        append_bm25_index(_docs(spark, 20, 30), p, batch_token="d1")
        assert bm25_index_stats(spark, p).first()["n_docs"] == 30
        # a NEW append hashes with the resized bucket count
        append_bm25_index(_docs(spark, 30, 35), p, batch_token="d2")
        meta, root = _resolve_bm25_index(spark, p)
        assert meta["n_buckets"] == 32
        got = sorted(
            map(tuple, bm25_search_index(_queries(spark), p, k=5).collect())
        )
        want = sorted(
            map(tuple, bm25_topk(_docs(spark, 0, 35), _queries(spark), k=5).collect())
        )
        assert got == want

    def test_validation(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            resize_bm25_index,
        )

        p = str(tmp_path / "bmresize3")
        write_bm25_index(_docs(spark, 0, 5), p, n_buckets=4)
        with pytest.raises(ValueError, match="n_buckets"):
            resize_bm25_index(spark, p, 0)


class TestBm25StatsDiagnosis:
    """bm25_index_stats' hot-cause inputs, pinned hash-agnostically: a
    Python recomputation from the actual postings must match the
    stats row — in particular max_term_in_max_bucket is the hottest
    bucket's OWN largest term, NOT the global term max (which can
    live in a cooler bucket and would misdiagnose collision heat as
    hot_term, skipping the resize that would fix it)."""

    def test_in_bucket_term_max_matches_recomputation(
        self, spark, tmp_path
    ):
        from collections import Counter

        from datawaves_etl_airflow_spark.operators.text import (
            _resolve_bm25_index,
            bm25_index_stats,
        )

        # one globally-dominant term ('common', 60 docs) + many
        # medium terms; whichever buckets they hash into, the Python
        # recomputation below is ground truth
        docs = spark.createDataFrame(
            [
                (i, f"common mid{i % 12} other{i % 7} unique{i}")
                for i in range(60)
            ],
            "doc_id long, text string",
        )
        p = str(tmp_path / "bmdiag")
        write_bm25_index(docs, p, n_buckets=4)
        _, root = _resolve_bm25_index(spark, p)
        postings = spark.read.parquet(root + "/postings").select(
            "bucket", "term"
        ).collect()
        per_bucket = Counter(r["bucket"] for r in postings)
        per_bucket_term = Counter((r["bucket"], r["term"]) for r in postings)
        per_term = Counter(r["term"] for r in postings)
        hot_bucket = max(per_bucket, key=lambda b: per_bucket[b])
        want_in_bucket_max = max(
            n for (b, _t), n in per_bucket_term.items() if b == hot_bucket
        )
        row = bm25_index_stats(spark, p).first()
        assert row["max_bucket"] == per_bucket[hot_bucket]
        assert row["max_term_in_max_bucket"] == want_in_bucket_max
        assert row["max_term_postings"] == max(per_term.values())
        # the misdiagnosis scenario is representable: the global max
        # term need not equal the hottest bucket's own max
        assert row["max_term_in_max_bucket"] <= row["max_term_postings"]

    def test_resize_skipped_at_target(self, spark, tmp_path):
        """Residual heat at the target bucket count must NOT refold
        the whole postings layout every tick: the resize fires at most
        once per target."""
        from datawaves_etl_airflow_spark.operators.text import (
            _resolve_bm25_index,
            maintain_bm25_index,
        )
        from datawaves_etl_airflow_spark.sources.manifest import (
            VersionedManifest,
        )

        docs = _docs(spark, 0, 40)
        p = str(tmp_path / "bmskip")
        write_bm25_index(docs, p, n_buckets=2)
        rep = maintain_bm25_index(
            spark, p, max_bucket_ratio=1.1, resize_on_hot=64
        )
        assert rep["resized"] is True and rep["n_buckets"] == 2
        v_after = VersionedManifest(p).latest_version(spark)
        # tick 2: xxhash64 term placement is deterministic for this
        # fixed corpus — at 64 buckets the hottest bucket holds TWO
        # 40-posting common terms (80 postings, in-bucket term max 40,
        # 40*2 > 80 is false), so the diagnosis is ALWAYS collisions
        # and it always flags at ratio 1.01: the skip path is
        # exercised unconditionally
        rep2 = maintain_bm25_index(
            spark, p, max_bucket_ratio=1.01, resize_on_hot=64
        )
        assert rep2["n_buckets"] == 64
        assert rep2["hot_buckets_flagged"] is True
        assert rep2["hot_cause"] == "collisions"
        assert rep2["resized"] is False
        assert rep2["resize_skipped"] == "already_at_target"
        assert VersionedManifest(p).latest_version(spark) == v_after


class TestFilteredBm25:
    """allowed=: filtered lexical retrieval (r10) — top-k among
    allowed docs with FULL-collection statistics (the filter restricts
    who may be retrieved, never the language model: df/N/avgdl do not
    re-weight)."""

    def test_index_probe_equals_in_session_and_respects_filter(
        self, spark, index_path
    ):
        evens = spark.createDataFrame(
            [(i,) for i in range(0, 20, 2)], "doc_id long"
        )
        got = bm25_search_index(
            _queries(spark), index_path, k=5, allowed=evens
        )
        want = bm25_topk(
            _docs(spark, 0, 20), _queries(spark), k=5, allowed=evens
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        assert got.filter(F.col("doc_id") % 2 != 0).count() == 0

    def test_scores_keep_full_collection_statistics(self, spark):
        """The filtered score of an allowed doc must equal its
        UNFILTERED score (df/N/avgdl untouched) — only the candidate
        set shrinks; a per-subset re-weight would change idf and
        diverge."""
        docs = _docs(spark, 0, 20)
        evens = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
        filt = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_topk(
                docs, _queries(spark), k=20, allowed=evens
            ).collect()
        }
        full = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_topk(docs, _queries(spark), k=20).collect()
        }
        assert filt  # non-vacuous
        for key, score in filt.items():
            assert full[key] == score

    def test_underfill_is_a_data_property_and_empty_filter(
        self, spark, index_path
    ):
        """Fewer than k allowed docs sharing a query term under-fills
        honestly (exact postings — no recall trade, no starvation
        signal needed); an empty filter returns nothing."""
        three = spark.createDataFrame(
            [(0,), (2,), (4,)], "doc_id long"
        )
        got = bm25_search_index(
            _queries(spark), index_path, k=5, allowed=three
        )
        per_q = {r["query_id"]: r["count"]
                 for r in got.groupBy("query_id").count().collect()}
        assert per_q and all(c <= 3 for c in per_q.values())
        empty = three.filter(F.lit(False))
        assert bm25_search_index(
            _queries(spark), index_path, k=5, allowed=empty
        ).count() == 0
        # single-column coercion (whatever the column name)
        other = spark.createDataFrame([(0,), (2,)], "whatever long")
        ok = bm25_search_index(
            _queries(spark), index_path, k=5, allowed=other
        )
        assert {r["doc_id"] for r in ok.collect()} <= {0, 2}


class TestBm25Deletes:
    """delete_from_bm25_index: tombstone deletes — the retraction path
    the append-only fold cannot serve. Probe-time exclusion with exact
    df; N/avgdl stale until compaction, which corrects them exactly
    from the dropped postings (Lucene-before-merge, with a stronger
    merge)."""

    def test_deleted_doc_never_retrieved(self, spark, index_path):
        from datawaves_etl_airflow_spark.operators.text import (
            delete_from_bm25_index,
        )

        q = _queries(spark)
        hit = bm25_search_index(q, index_path, k=5).filter(
            F.col("doc_id") == 5
        )
        assert hit.count() >= 1  # doc 5 matches "spark topic1"
        delete_from_bm25_index(
            spark.createDataFrame([(5,)], "doc_id long"), index_path,
            delete_token="take5",
        )
        got = sorted(
            map(
                tuple,
                bm25_search_index(q, index_path, k=20).collect(),
            )
        )
        assert all(r[1] != 5 for r in got)  # (query_id, doc_id, ...)
        # replay + absent-id delete are no-ops
        delete_from_bm25_index(
            spark.createDataFrame([(5,), (777,)], "doc_id long"),
            index_path, delete_token="take5",
        )
        again = sorted(
            map(
                tuple,
                bm25_search_index(q, index_path, k=20).collect(),
            )
        )
        assert got == again

    def test_compaction_equals_rebuild_over_survivors(
        self, spark, tmp_path
    ):
        """The headline contract: delete → compact ≡ write_bm25_index
        over the surviving corpus, value-for-value (df AND the
        N/avgdl correction from the dropped postings' dl)."""
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_index_stats,
            compact_bm25_index,
            delete_from_bm25_index,
        )

        p = str(tmp_path / "bm25d")
        write_bm25_index(_docs(spark, 0, 30), p, n_buckets=16)
        dels = spark.createDataFrame(
            [(i,) for i in range(0, 30, 3)], "doc_id long"
        )
        delete_from_bm25_index(dels, p, delete_token="purge")
        assert compact_bm25_index(spark, p) is True
        got = sorted(
            map(
                tuple,
                bm25_search_index(_queries(spark), p, k=10).collect(),
            )
        )
        p2 = str(tmp_path / "bm25ref")
        write_bm25_index(
            _docs(spark, 0, 30).filter(F.col("doc_id") % 3 != 0),
            p2,
            n_buckets=16,
        )
        want = sorted(
            map(
                tuple,
                bm25_search_index(_queries(spark), p2, k=10).collect(),
            )
        )
        assert got == want
        # stats corrected exactly; new version tombstone-free
        row = bm25_index_stats(spark, p).collect()[0]
        assert row["n_docs"] == 20
        assert row["n_tombstones"] == 0
        root = _resolve_bm25_index(spark, p)[1]
        assert not glob.glob(os.path.join(root, "tombstones", "*"))
        # the delete token is durable in folded: replay must not
        # re-tombstone an id a later batch may legitimately re-add
        delete_from_bm25_index(dels, p, delete_token="purge")
        assert not glob.glob(os.path.join(root, "tombstones", "*"))

    def test_torn_tombstone_refuses_compaction(self, spark, index_path):
        from datawaves_etl_airflow_spark.operators.text import (
            compact_bm25_index,
            delete_from_bm25_index,
        )

        delete_from_bm25_index(
            spark.createDataFrame([(3,)], "doc_id long"), index_path,
            delete_token="torn",
        )
        root = _resolve_bm25_index(spark, index_path)[1]
        os.remove(
            os.path.join(root, "tombstones", "batch=torn", "_SUCCESS")
        )
        # probe unaffected: the torn delete is invisible until healed
        assert bm25_search_index(_queries(spark), index_path, k=5).count() > 0
        with pytest.raises(RuntimeError, match="torn delete"):
            compact_bm25_index(spark, index_path)

    def test_maintain_fires_on_tombstone_debt(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            delete_from_bm25_index,
            maintain_bm25_index,
        )

        p = str(tmp_path / "bm25m")
        write_bm25_index(_docs(spark, 0, 30), p, n_buckets=8)
        delete_from_bm25_index(
            spark.createDataFrame(
                [(i,) for i in range(10)], "doc_id long"
            ),
            p,
        )
        rep = maintain_bm25_index(spark, p, max_tombstone_ratio=0.2)
        assert rep["n_tombstones"] == 10
        assert rep["compacted"] is True
        rep2 = maintain_bm25_index(spark, p, max_tombstone_ratio=0.2)
        assert rep2["n_tombstones"] == 0
        assert rep2["compacted"] is False
        assert rep2["n_docs"] == 20

    def test_missing_index_and_bad_token_raise(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            delete_from_bm25_index,
        )

        ids = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError, match="no BM25 index"):
            delete_from_bm25_index(ids, str(tmp_path / "nope"))
        with pytest.raises(ValueError, match="path-safe"):
            delete_from_bm25_index(ids, str(tmp_path / "nope"),
                                   delete_token="a=b")


class TestBm25PrfIndex:
    """bm25_prf_search_index: persisted PRF — pass 1 and pass 2 through
    the shared index probe, feedback mining through the doc-bucketed
    forward layout. Must be value-identical to the in-session
    bm25_prf_topk over the same corpus."""

    def _prf_docs(self, spark):
        # vocabulary-mismatch corpus: doc 0 bridges "automobile" to
        # "motorcar"; docs 20.. share "motorcar" but not "automobile"
        rows = [(0, "automobile motorcar motorcar motorcar engine")]
        rows += [
            (i, f"doc number {i} about spark shuffles topic{i % 4}")
            for i in range(1, 20)
        ]
        rows += [
            (20 + i, f"motorcar chassis wheels brakes model{i}")
            for i in range(5)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _prf_queries(self, spark):
        return spark.createDataFrame(
            [(1, "automobile"), (2, "spark topic1")],
            "query_id long, query_text string",
        )

    def test_matches_in_session_prf_after_append(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_prf_search_index,
            bm25_prf_topk,
        )

        docs = self._prf_docs(spark)
        p = str(tmp_path / "prfidx")
        write_bm25_index(
            docs.filter(F.col("doc_id") < 20), p, n_buckets=8,
            forward=True,
        )
        append_bm25_index(
            docs.filter(F.col("doc_id") >= 20), p, batch_token="d1"
        )
        got = sorted(
            map(
                tuple,
                bm25_prf_search_index(
                    self._prf_queries(spark), p, k=5, fb_docs=2,
                    fb_terms=3,
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                bm25_prf_topk(
                    docs, self._prf_queries(spark), k=5, fb_docs=2,
                    fb_terms=3,
                ).collect(),
            )
        )
        assert got == want
        # and PRF actually did its job: a motorcar-only doc retrieved
        # for the "automobile" query
        assert any(
            r[0] == 1 and r[1] >= 20 for r in got
        )  # (query_id, doc_id, ...)

    def test_valved_matches_in_session(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_prf_search_index,
            bm25_prf_topk,
        )

        docs = self._prf_docs(spark)
        p = str(tmp_path / "prfvalve")
        write_bm25_index(docs, p, n_buckets=8, forward=True)
        kw = dict(k=5, fb_docs=2, fb_terms=3, max_df_ratio=0.5)
        got = sorted(
            map(
                tuple,
                bm25_prf_search_index(
                    self._prf_queries(spark), p, **kw
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                bm25_prf_topk(
                    docs, self._prf_queries(spark), **kw
                ).collect(),
            )
        )
        assert got == want

    def test_forward_mining_reads_only_feedback_buckets(
        self, spark, tmp_path
    ):
        """Execution-true pruning proof for the forward layout: the
        files the mining stage reads all belong to the feedback docs'
        fbucket dirs — the whole reason the layout exists."""
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_search_index,
        )

        docs = self._prf_docs(spark)
        p = str(tmp_path / "prfprune")
        write_bm25_index(docs, p, n_buckets=8, forward=True)
        fb = bm25_search_index(
            self._prf_queries(spark), p, k=2
        ).select("doc_id")
        fb_buckets = {
            r["_b"]
            for r in fb.select(
                F.pmod(F.xxhash64(F.col("doc_id")), F.lit(8)).alias("_b")
            ).collect()
        }
        root = _resolve_bm25_index(spark, p)[1]
        pruned = spark.read.parquet(root + "/forward").filter(
            F.col("fbucket").isin(sorted(fb_buckets))
        )
        read_files = {
            r["f"]
            for r in pruned.select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        assert read_files  # non-empty: the probe really read something
        for f in read_files:
            assert int(f.split("fbucket=")[1].split("/")[0]) in fb_buckets

    def test_lifecycle_compact_resize_delete(self, spark, tmp_path):
        """The forward layout travels through the whole lifecycle:
        delete → compact applies on BOTH sides, resize re-hashes
        fbucket, and PRF keeps answering identically to the in-session
        operator over the surviving corpus."""
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_prf_search_index,
            bm25_prf_topk,
            compact_bm25_index,
            delete_from_bm25_index,
            resize_bm25_index,
        )

        docs = self._prf_docs(spark)
        p = str(tmp_path / "prflife")
        write_bm25_index(docs, p, n_buckets=8, forward=True)
        delete_from_bm25_index(
            spark.createDataFrame([(21,), (3,)], "doc_id long"), p,
        )
        assert compact_bm25_index(spark, p) is True
        assert resize_bm25_index(spark, p, 16) is True
        survivors = docs.filter(~F.col("doc_id").isin(21, 3))
        got = sorted(
            map(
                tuple,
                bm25_prf_search_index(
                    self._prf_queries(spark), p, k=5, fb_docs=2,
                    fb_terms=3,
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                bm25_prf_topk(
                    survivors, self._prf_queries(spark), k=5,
                    fb_docs=2, fb_terms=3,
                ).collect(),
            )
        )
        assert got == want
        root = _resolve_bm25_index(spark, p)[1]
        fwd = spark.read.parquet(root + "/forward")
        assert fwd.filter(F.col("doc").isin(21, 3)).count() == 0

    def test_missing_forward_layout_raises(self, spark, index_path):
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_prf_search_index,
        )

        with pytest.raises(ValueError, match="forward"):
            bm25_prf_search_index(_queries(spark), index_path)


class TestAppendIdentityGuard:
    """append_bm25_index(check_ids=True): the opt-in doc-identity
    probe over the forward buckets — the one silent-corruption path
    of the index estate (double-counted postings/df/N/avgdl) turned
    into a loud error."""

    @pytest.fixture()
    def fwd_index(self, spark, tmp_path):
        p = str(tmp_path / "bm25f")
        write_bm25_index(
            _docs(spark, 0, 20), p, n_buckets=16, forward=True
        )
        return p

    def test_overlapping_append_raises(self, spark, fwd_index):
        with pytest.raises(ValueError, match="already\\s+present"):
            append_bm25_index(
                _docs(spark, 15, 25), fwd_index,
                batch_token="d1", check_ids=True,
            )
        # and nothing landed: the probe runs before any write
        root = _resolve_bm25_index(spark, fwd_index)[1]
        assert not os.path.exists(
            os.path.join(root, "postings", "batch=d1")
        )

    def test_disjoint_append_passes_and_folds(self, spark, fwd_index):
        append_bm25_index(
            _docs(spark, 20, 30), fwd_index,
            batch_token="d1", check_ids=True,
        )
        got = sorted(
            map(
                tuple,
                bm25_search_index(
                    _queries(spark), fwd_index, k=5
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                bm25_topk(
                    _docs(spark, 0, 30), _queries(spark), k=5
                ).collect(),
            )
        )
        assert got == want

    def test_same_token_retry_excludes_own_rows(self, spark, fwd_index):
        # a fully-committed append retried under the SAME token must
        # not see its own rows as duplicates (the replay contract)
        batch = _docs(spark, 20, 30)
        append_bm25_index(
            batch, fwd_index, batch_token="d1", check_ids=True
        )
        append_bm25_index(
            batch, fwd_index, batch_token="d1", check_ids=True
        )
        root = _resolve_bm25_index(spark, fwd_index)[1]
        fwd = spark.read.parquet(os.path.join(root, "forward"))
        rows = fwd.filter(F.col("doc") == 25)
        # one (doc, term) row per term — the overwrite did not double
        assert rows.count() == rows.select("term").distinct().count()

    def test_tombstoned_id_still_raises_readd_contract(
        self, spark, fwd_index
    ):
        from datawaves_etl_airflow_spark.operators.text import (
            compact_bm25_index,
            delete_from_bm25_index,
        )

        delete_from_bm25_index(
            _docs(spark, 5, 6).select("doc_id"), fwd_index,
            delete_token="t1",
        )
        # tombstoned but not compacted: RE-ADD must still refuse
        with pytest.raises(ValueError, match="RE-ADD"):
            append_bm25_index(
                _docs(spark, 5, 6), fwd_index,
                batch_token="d2", check_ids=True,
            )
        # after compaction the id is physically gone — re-add allowed
        assert compact_bm25_index(spark, fwd_index) is True
        append_bm25_index(
            _docs(spark, 5, 6), fwd_index,
            batch_token="d3", check_ids=True,
        )

    def test_check_without_forward_layout_raises(self, spark, index_path):
        with pytest.raises(ValueError, match="forward"):
            append_bm25_index(
                _docs(spark, 20, 25), index_path,
                batch_token="d1", check_ids=True,
            )
