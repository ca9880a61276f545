"""Thin Airflow binding (pipeline.airflow_compat): staged execution
across process-style boundaries equals the single-session runner, and
DAG wiring instantiates operators with the right dependencies — driven
by a stub operator class, since Airflow itself is not a dependency.
"""

import os

import pytest

from datawaves_etl_airflow_spark.pipeline.airflow_compat import (
    build_airflow_dag,
    evm_day_stages,
)
from datawaves_etl_airflow_spark.queries.domain import TRANSFER_EVENT
from datawaves_etl_airflow_spark.testing import fixtures as fx


class TestStagedExecution:
    def test_stages_equal_single_session_run(self, spark, tmp_path):
        """enrich → verify → parse as separate stage invocations (each
        re-reading the warehouse, as separate Airflow workers would)
        produces the same warehouse contents and verify counts as the
        one-session run_evm_day."""
        base = fx.ensure_fixtures()
        wh = str(tmp_path / "wh")

        stages = evm_day_stages(
            base, wh, fx.DS,
            decode_events=[TRANSFER_EVENT],
            session_factory=lambda name: spark,
        )
        ids = [t[0] for t in stages]
        assert ids == [
            f"ethereum_{fx.DS}_enrich",
            f"ethereum_{fx.DS}_verify",
            f"ethereum_{fx.DS}_parse",
        ]
        import json

        results = {}
        for task_id, fn, upstream in stages:
            for u in upstream:
                assert u in results, f"{task_id} ran before {u}"
            results[task_id] = fn()
            # the return value is the XCom payload: must be JSON-safe
            # (a raw ctx of DataFrames would fail the real operator)
            json.dumps(results[task_id])

        v = results[f"ethereum_{fx.DS}_verify"]["scalars"]["verify"]
        assert v["blocks"] == 20
        assert v["root_traces"] == 200
        assert "parse_evt_Transfer" in results[
            f"ethereum_{fx.DS}_parse"
        ]["completed"]
        # the stages' real interface is the warehouse
        decoded = spark.read.parquet(
            os.path.join(wh, "ethereum", "evt_Transfer")
        )
        assert decoded.count() == 100
        for table, n in [("blocks", 20), ("logs", 300), ("traces", 300)]:
            df = spark.read.parquet(os.path.join(wh, "ethereum", table))
            assert df.count() == n

    def test_parse_and_clean_stages_optional(self, spark):
        base = fx.ensure_fixtures()
        no_parse = evm_day_stages(
            base, "/tmp/unused-wh", fx.DS,
            session_factory=lambda name: spark,
        )
        names = [t[0].rsplit("_", 1)[-1] for t in no_parse]
        assert names == ["enrich", "verify"]


class _StubOperator:
    """PythonOperator-shaped stub recording wiring."""

    def __init__(self, task_id, python_callable, dag):
        self.task_id = task_id
        self.python_callable = python_callable
        self.dag = dag
        self.downstream = []

    def __rshift__(self, other):
        self.downstream.append(other.task_id)
        return other


class TestDagWiring:
    def test_operators_and_dependencies(self, spark):
        base = fx.ensure_fixtures()
        dag = object()
        ops = build_airflow_dag(
            dag, base, "/tmp/unused-wh", fx.DS,
            decode_events=[TRANSFER_EVENT],
            clean=True,
            session_factory=lambda name: spark,
            operator_cls=_StubOperator,
        )
        e, v, p, c = (
            f"ethereum_{fx.DS}_enrich",
            f"ethereum_{fx.DS}_verify",
            f"ethereum_{fx.DS}_parse",
            f"ethereum_{fx.DS}_clean",
        )
        assert set(ops) == {e, v, p, c}
        assert all(op.dag is dag for op in ops.values())
        assert sorted(ops[e].downstream) == sorted([v, p, c])
        assert ops[v].downstream == [c]
        assert ops[p].downstream == [c]

    def test_missing_airflow_raises_clearly(self):
        with pytest.raises(ImportError, match="run_evm_day"):
            build_airflow_dag(
                object(), "/x", "/y", fx.DS, operator_cls=None
            )


class TestMaintenanceDag:
    """build_maintenance_dag: the index-maintenance tick at Airflow
    granularity — one operator per index, a stats-reading report
    operator wired downstream of all of them (r9 verdict task 7)."""

    def _indexes(self, spark, tmp_path):
        import random

        from datawaves_etl_airflow_spark.operators.similarity import (
            append_ivf_index,
            write_ivf_index,
        )
        from datawaves_etl_airflow_spark.operators.text import (
            write_bm25_index,
        )

        rng = random.Random(3)
        vecs = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
        ivf = str(tmp_path / "ivf_idx")
        write_ivf_index(vecs, ivf, n_centroids=2, n_iters=1)
        for j in range(3):
            day = vecs.select(
                (vecs.vec_id + 100 * (j + 1)).alias("vec_id"), "embedding"
            )
            append_ivf_index(day, ivf, batch_token=f"d{j}")
        bm = str(tmp_path / "bm_idx")
        write_bm25_index(
            spark.createDataFrame(
                [(i, f"text number {i} about data") for i in range(10)],
                "doc_id long, text string",
            ),
            bm,
            n_buckets=8,
        )
        return ivf, bm

    def test_wiring_and_one_tick(self, spark, tmp_path):
        import json

        from datawaves_etl_airflow_spark.pipeline.airflow_compat import (
            build_maintenance_dag,
        )

        ivf, bm = self._indexes(spark, tmp_path)
        dag = object()
        ops = build_maintenance_dag(
            dag,
            ivf_indexes=[(ivf, {"max_batches": 2})],
            bm25_indexes=[bm],
            session_factory=lambda name: spark,
            operator_cls=_StubOperator,
        )
        maintainers = sorted(n for n in ops if n != "maintain_report")
        assert maintainers == ["maintain_bm25_bm_idx", "maintain_ivf_ivf_idx"]
        for n in maintainers:
            assert ops[n].downstream == ["maintain_report"]
        assert ops["maintain_report"].downstream == []
        # run the tick exactly as Airflow would: maintainers, then report
        results = {n: ops[n].python_callable() for n in maintainers}
        assert results["maintain_ivf_ivf_idx"]["compacted"] is True
        report = ops["maintain_report"].python_callable()
        json.dumps(report)  # XCom-safe
        assert report[f"ivf:{ivf}"]["max_batches"] == 1  # post-tick state
        assert report[f"bm25:{bm}"]["n_docs"] == 10

    def test_missing_airflow_raises_clearly(self):
        from datawaves_etl_airflow_spark.pipeline.airflow_compat import (
            build_maintenance_dag,
        )

        with pytest.raises(ImportError, match="maintenance_pipeline"):
            build_maintenance_dag(object(), ivf_indexes=["/x"])


class TestSyncDag:
    """build_sync_dag: the incremental-sync release tick at Airflow
    granularity — PARQUET-PATH task inputs (a task cannot carry a live
    DataFrame; the deployment's snapshot lands on storage), one
    operator per index + a terminal report."""

    def test_wiring_and_one_tick(self, spark, tmp_path):
        import json

        from pyspark.sql import functions as F

        from datawaves_etl_airflow_spark.operators.text import (
            bm25_search_index,
            bm25_topk,
            write_bm25_index,
        )
        from datawaves_etl_airflow_spark.pipeline.airflow_compat import (
            build_sync_dag,
        )

        new_docs = spark.createDataFrame(
            [(i, f"doc {i} about spark data topic{i % 3}")
             for i in range(20)],
            "doc_id long, text string",
        )
        old_docs = new_docs.filter(F.col("doc_id") % 4 != 0)
        old_p = str(tmp_path / "snap_old")
        new_p = str(tmp_path / "snap_new")
        old_docs.write.parquet(old_p)
        new_docs.write.parquet(new_p)
        from datawaves_etl_airflow_spark.operators.dedup import (
            write_minhash_index,
        )

        idx = str(tmp_path / "b_idx")
        midx = str(tmp_path / "m_idx")
        write_bm25_index(old_docs, idx, n_buckets=8)
        write_minhash_index(old_docs, midx, n_hashes=32, n_bands=16)
        ops = build_sync_dag(
            object(),
            bm25_syncs=[(idx, old_p, new_p, {"sync_token": "rel1"})],
            minhash_syncs=[(midx, old_p, new_p,
                            {"sync_token": "rel1"})],
            session_factory=lambda name: spark,
            operator_cls=_StubOperator,
        )
        assert sorted(ops) == [
            "sync_bm25_b_idx", "sync_minhash_m_idx", "sync_report"
        ]
        assert ops["sync_bm25_b_idx"].downstream == ["sync_report"]
        rep = ops["sync_bm25_b_idx"].python_callable()
        json.dumps(rep)  # XCom-safe
        assert rep["n_added"] == 5  # doc_id % 4 == 0: 0,4,8,12,16
        mrep = ops["sync_minhash_m_idx"].python_callable()
        json.dumps(mrep)
        assert mrep["n_added"] == 5
        assert ops["sync_report"].python_callable() == {
            "synced": ["sync_bm25_b_idx", "sync_minhash_m_idx"]
        }
        qs = spark.createDataFrame(
            [(1, "spark topic1")], "query_id long, query_text string"
        )
        got = sorted(
            map(tuple, bm25_search_index(qs, idx, k=5).collect())
        )
        want = sorted(
            map(tuple, bm25_topk(new_docs, qs, k=5).collect())
        )
        assert got == want

    def test_missing_airflow_raises_clearly(self):
        from datawaves_etl_airflow_spark.pipeline.airflow_compat import (
            build_sync_dag,
        )

        with pytest.raises(ImportError, match="sync_pipeline"):
            build_sync_dag(object(), bm25_syncs=[("/x", "/o", "/n")])
