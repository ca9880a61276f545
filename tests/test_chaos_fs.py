"""Object-store-semantics chaos tests (round-4 verdict task #4).

The sandbox has no S3, so the failure modes an object store adds —
renames that fail outright, renames that copy-then-fail-to-delete,
listings that lag behind writes — are injected behind the engine's own
fs seams (`sources.fs._rename`, `sources.manifest.glob_paths`) and the
commit protocols are asserted to stay loud-and-consistent under them:

- marker overwrites (`write_text`) leave complete-old / complete-new /
  missing — never torn — even when the rename fails or leaves ghosts;
- the versioned-manifest commit (txn store, MinHash/IVF rebuilds)
  never produces silent wrongness under a lagging listing: the losing
  writer raises, the committed state stays live, and the retry after
  the lag clears applies exactly once.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.sources import fs as fs_mod
from datawaves_etl_airflow_spark.sources import manifest as mf_mod
from datawaves_etl_airflow_spark.sources.fs import read_text, write_text
from datawaves_etl_airflow_spark.streaming.txn import ManifestedBucketStore


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, total bigint, n bigint")


def _totals(df):
    return {
        r["k"]: (r["total"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("total").alias("total"), F.sum("n").alias("n"))
        .collect()
    }


def _lag_listing(monkeypatch, n_calls):
    """Make manifest listings miss the HIGHEST manifest version for the
    next ``n_calls`` glob calls — S3-style eventual listing."""
    real = mf_mod.glob_paths
    state = {"left": n_calls}

    def lagged(spark, pattern):
        paths = real(spark, pattern)
        if state["left"] > 0 and "manifest-" in pattern and paths:

            def ver(p):
                try:
                    return int(
                        p.rsplit("manifest-", 1)[1].removesuffix(".json")
                    )
                except ValueError:
                    return -1

            newest = max(paths, key=ver)
            state["left"] -= 1
            return [p for p in paths if p != newest]
        return paths

    monkeypatch.setattr(mf_mod, "glob_paths", lagged)
    return state


class TestRenameChaos:
    def test_failed_rename_never_leaves_torn_marker(
        self, spark, tmp_path, monkeypatch
    ):
        marker = str(tmp_path / "m" / "_marker")
        write_text(spark, marker, "OLD-COMPLETE")
        monkeypatch.setattr(fs_mod, "_rename", lambda fs, s, d: False)
        with pytest.raises(OSError, match="rename"):
            write_text(spark, marker, "NEW-COMPLETE")
        got = read_text(spark, marker)
        # the documented delete->rename window: complete old content or
        # no file — NEVER a torn half-write
        assert got in (None, "OLD-COMPLETE")
        # and no stray temp files pollute the directory
        leftovers = [
            f
            for f in os.listdir(str(tmp_path / "m"))
            if "__tmp__" in f
        ]
        assert leftovers == []

    def test_copy_without_delete_ghosts_are_invisible(
        self, spark, tmp_path, monkeypatch
    ):
        """An object-store rename is copy+delete; a failed delete
        leaves the source beside the destination. Readers must never
        see ghosts: exact-path reads hit only the real marker and
        manifest globs only match manifest-<v>.json."""
        real = fs_mod._rename

        def ghosting(fs, src, dst):
            ok = real(fs, src, dst)
            fs.createNewFile(dst.suffix(".__tmp__ghost"))
            return ok

        monkeypatch.setattr(fs_mod, "_rename", ghosting)
        marker = str(tmp_path / "g" / "_marker")
        write_text(spark, marker, "A")
        write_text(spark, marker, "B")
        assert read_text(spark, marker) == "B"
        assert any(
            "__tmp__ghost" in f for f in os.listdir(str(tmp_path / "g"))
        )
        # manifest protocol untouched by ghost files in its dir
        store = ManifestedBucketStore(str(tmp_path / "s"), n_buckets=4)
        assert store.merge_batch(
            _batch(spark, [("a", 1, 1)]), 0, ["k"], ["total", "n"]
        )
        ghost = os.path.join(
            str(tmp_path / "s"), "_manifests", "manifest-1.json.__tmp__ghost"
        )
        open(ghost, "w").close()
        assert store.last_batch_id(spark) == 0
        assert _totals(store.current_df(spark)) == {"a": (1, 1)}


class TestListingLagManifest:
    def test_txn_merge_under_stale_listing_is_loud_then_exactly_once(
        self, spark, tmp_path, monkeypatch
    ):
        store = ManifestedBucketStore(str(tmp_path / "s"), n_buckets=4)
        store.merge_batch(_batch(spark, [("a", 10, 1)]), 0, ["k"], ["total", "n"])
        store.merge_batch(_batch(spark, [("a", 5, 1)]), 1, ["k"], ["total", "n"])
        # listings now lag: the writer resolves version 1, loses the
        # manifest-2 create race, and must fail LOUD — never corrupt
        state = _lag_listing(monkeypatch, n_calls=8)
        with pytest.raises(RuntimeError, match="concurrent writers"):
            store.merge_batch(
                _batch(spark, [("a", 2, 1)]), 2, ["k"], ["total", "n"]
            )
        state["left"] = 0  # lag clears
        assert _totals(store.current_df(spark)) == {"a": (15, 2)}
        # the retry applies batch 2 exactly once
        assert store.merge_batch(
            _batch(spark, [("a", 2, 1)]), 2, ["k"], ["total", "n"]
        ) is True
        assert _totals(store.current_df(spark)) == {"a": (17, 3)}
        assert store.last_batch_id(spark) == 2

    def test_minhash_rebuild_under_stale_listing_keeps_old_live(
        self, spark, tmp_path, monkeypatch
    ):
        from datawaves_etl_airflow_spark.operators.dedup import (
            dedup_against_index,
            write_minhash_index,
        )

        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog again ok"),
             (2, "pack my box with five dozen liquor jugs before noon")],
            "doc_id long, text string",
        )
        p = str(tmp_path / "idx")
        write_minhash_index(docs, p)

        def probe():
            probe_df = spark.createDataFrame(
                [(10, "the quick brown fox jumps over the lazy dog again ok!")],
                "doc_id long, text string",
            )
            return {
                (r["id_a"], r["id_b"])
                for r in dedup_against_index(
                    probe_df, p, threshold=0.5
                ).collect()
            }

        assert probe() == {(10, 1)}
        state = _lag_listing(monkeypatch, n_calls=4)
        other = spark.createDataFrame(
            [(99, "completely different corpus text nothing shared here")],
            "doc_id long, text string",
        )
        with pytest.raises(RuntimeError, match="manifest race"):
            write_minhash_index(other, p)
        state["left"] = 0
        # the old index never stopped answering
        assert probe() == {(10, 1)}
        write_minhash_index(other, p)  # retry after lag clears
        assert probe() == set()


class TestResolveNeverLiesEmpty:
    def test_listed_but_unreadable_manifest_raises(
        self, spark, tmp_path, monkeypatch
    ):
        """A manifest the listing shows but reads cannot fetch must
        RAISE: reporting the store empty would let a writer fork
        version 1 and silently orphan everything readers resolve."""
        store = ManifestedBucketStore(str(tmp_path / "s"), n_buckets=4)
        store.merge_batch(
            _batch(spark, [("a", 1, 1)]), 0, ["k"], ["total", "n"]
        )
        monkeypatch.setattr(mf_mod, "read_text", lambda s, p: None)
        with pytest.raises(ValueError, match="refusing to treat"):
            store.current_df(spark)


class TestVacuumPathRobustness:
    def test_index_rooted_under_versions_dir_survives_vacuum(
        self, spark, tmp_path
    ):
        """The review finding: splitting paths on '/versions/' mis-keys
        an index whose ROOT contains a component named 'versions' and
        vacuum would delete the live data. Matching is by basename."""
        from datawaves_etl_airflow_spark.operators.dedup import (
            dedup_against_index,
            vacuum_minhash_index,
            write_minhash_index,
        )

        p = str(tmp_path / "versions" / "minhash_idx")
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today")],
            "doc_id long, text string",
        )
        write_minhash_index(docs, p)
        write_minhash_index(docs, p)  # supersede v1 so vacuum has work
        vacuum_minhash_index(spark, p)
        probe = spark.createDataFrame(
            [(9, "the quick brown fox jumps over the lazy dog today!")],
            "doc_id long, text string",
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup_against_index(probe, p, threshold=0.5).collect()
        }
        assert got == {(9, 1)}  # live version intact after vacuum
