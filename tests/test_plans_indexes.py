"""Plan pins for the persisted-index operators (r4): no products in
the incremental dedup probe, partition pruning in the IVF probe scan,
and the single-exchange shard shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.dedup import (
    dedup_against_index,
    write_minhash_index,
)
from datawaves_etl_airflow_spark.operators.sampling import shuffle_shards
from datawaves_etl_airflow_spark.operators.similarity import write_ivf_index


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"some text body number {i} with shared tokens") for i in ids],
        "doc_id long, text string",
    )


class TestIndexPlans:
    def test_dedup_probe_has_no_product(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        write_minhash_index(_docs(spark, range(20)), p)
        probe = dedup_against_index(_docs(spark, range(100, 110)), p, 0.5)
        plan = plan_of(probe)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_ivf_probe_scan_is_partition_pruned(self, spark, tmp_path):
        import random

        rng = random.Random(3)
        vecs = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)],
            "vec_id long, embedding array<double>",
        )
        p = str(tmp_path / "ivf")
        write_ivf_index(vecs, p, n_centroids=8, n_iters=1)
        from datawaves_etl_airflow_spark.operators.similarity import (
            _resolve_ivf_index,
        )

        root = _resolve_ivf_index(spark, p)[1]
        # the probe's cell read: an isin over the partition column must
        # reach the scan as a partition filter, with zero data filters
        cells = spark.read.parquet(root + "/cells").filter(
            F.col("centroid_id").isin([1, 2])
        )
        s = formatted(cells)
        assert "PartitionFilters" in s
        assert "centroid_id IN (1,2)" in s.replace(" ", "").replace(
            "IN(", "IN ("
        ) or "centroid_id" in s.split("PartitionFilters")[1].split("]")[0]

    def test_shuffle_shards_single_exchange(self, spark):
        out = shuffle_shards(_docs(spark, range(50)), n_shards=8, seed=1)
        plan = plan_of(out)
        assert plan.count("Exchange") == 1
        assert "Sort" in plan  # per-shard hash order is a real sort
