"""Deterministic training-shard export: membership/order are pure
functions of (id, seed) — stable across re-runs and input layout."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.sampling import (
    shuffle_shards,
    write_training_shards,
)


def _docs(spark, n=200, n_parts=4):
    return spark.range(n).repartition(n_parts).selectExpr(
        "id AS doc_id", "concat('text-', id) AS text"
    )


def _ordered_rows(df):
    """(shard_id -> [doc_id...] in arrival order) via partition-local
    collect order."""
    out: dict[int, list[int]] = {}
    for r in df.select("shard_id", "doc_id").collect():
        out.setdefault(r["shard_id"], []).append(r["doc_id"])
    return out


class TestShuffleShards:
    def test_membership_and_order_survive_input_layout(self, spark):
        a = shuffle_shards(_docs(spark, n_parts=2), n_shards=8, seed=7)
        b = shuffle_shards(_docs(spark, n_parts=13), n_shards=8, seed=7)
        assert _ordered_rows(a) == _ordered_rows(b)

    def test_different_seed_different_epoch_order(self, spark):
        a = _ordered_rows(shuffle_shards(_docs(spark), n_shards=8, seed=0))
        b = _ordered_rows(shuffle_shards(_docs(spark), n_shards=8, seed=1))
        assert a != b
        # same corpus either way
        assert sorted(x for v in a.values() for x in v) == sorted(
            x for v in b.values() for x in v
        )

    def test_every_row_lands_exactly_once(self, spark):
        out = shuffle_shards(_docs(spark, n=150), n_shards=8, seed=3)
        ids = [r["doc_id"] for r in out.select("doc_id").collect()]
        assert sorted(ids) == list(range(150))
        n_shards = out.select("shard_id").distinct().count()
        assert 1 < n_shards <= 8

    def test_order_matches_hash_function(self, spark):
        """Within a shard, rows arrive in xxhash64(id, seed) order."""
        seed, shard = 5, 2
        out = shuffle_shards(_docs(spark), n_shards=8, seed=seed)
        got = _ordered_rows(out).get(shard, [])
        want_df = (
            _docs(spark)
            .withColumn("h", F.xxhash64("doc_id", F.lit(seed)))
            .filter(F.pmod("h", F.lit(8)) == shard)
            .orderBy("h", "doc_id")
        )
        want = [r["doc_id"] for r in want_df.collect()]
        assert got == want


class TestWriteTrainingShards:
    def test_jsonl_export_roundtrip(self, spark, tmp_path):
        p = str(tmp_path / "shards")
        write_training_shards(
            _docs(spark, n=100), p, n_shards=4, seed=2, fmt="json"
        )
        dirs = sorted(glob.glob(os.path.join(p, "shard_id=*")))
        assert 1 < len(dirs) <= 4
        seen = []
        for d in dirs:
            for f in sorted(glob.glob(os.path.join(d, "*.json"))):
                with open(f) as fh:
                    for line in fh:
                        seen.append(json.loads(line)["doc_id"])
        assert sorted(seen) == list(range(100))

    def test_max_records_per_file_chunks_without_changing_membership(
        self, spark, tmp_path
    ):
        p = str(tmp_path / "chunked")
        write_training_shards(
            _docs(spark, n=120), p, n_shards=2, seed=2,
            fmt="parquet", max_records_per_file=16,
        )
        files = glob.glob(os.path.join(p, "shard_id=*", "*.parquet"))
        assert len(files) > 2  # chunking happened
        got = spark.read.parquet(p)
        assert got.count() == 120
        import pyarrow.parquet as pq

        assert max(pq.ParquetFile(f).metadata.num_rows for f in files) <= 16

    def test_bad_format_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="fmt"):
            write_training_shards(
                _docs(spark), str(tmp_path / "x"), fmt="csvx"
            )
