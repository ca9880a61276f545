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
