"""Thin Airflow binding for the one-day EVM pipeline.

The north star is "Airflow-orchestrated Spark jobs": the reference
builds one Airflow DAG per chain with a SparkSubmitOperator or
PythonOperator per task (dags/chains/blockchain.py:48-142,
experiments/experiment_parser.py:43-75). This engine's native runner
(`pipeline.runner`) executes the whole day in ONE SparkSession — the
better design when a session is available — but orchestration
boundaries still matter operationally (retries, SLAs, backfills), so
this module exposes the same day-pipeline at Airflow task granularity:

- `evm_day_stages(...)` → ordered `(task_id, callable, upstream_ids)`
  triples with **disk-only interfaces**: each callable builds (or
  reuses) its own SparkSession and re-reads whatever earlier stages
  wrote to the warehouse, so the stages can run in separate worker
  processes — exactly the reference's spark-submit boundaries, without
  shipping DataFrames through XCom (impossible) or requiring a shared
  session.
- `build_airflow_dag(dag, ...)` → instantiates one PythonOperator per
  stage on a caller-supplied DAG object and wires the dependencies.
  Airflow itself is NOT a dependency of this package: the function
  imports `airflow.operators.python` lazily and raises a clear error
  when Airflow is absent (the engine's own runner is the no-Airflow
  path). Tests drive it with a stub operator class.
"""

from __future__ import annotations

from collections.abc import Callable

# import-light on purpose: the Airflow scheduler re-parses DAG files
# continuously, and this module's DAG-definition surface must not drag
# pyspark (or the operator modules) into every parse loop. The heavy
# runner imports happen inside the stage callables at RUN time;
# pipeline.maintenance is stdlib-only by contract.
from .maintenance import (
    _maintainer,
    maintenance_task_specs,
    sync_task_specs,
)


def _resolve_session_factory(session_factory: Callable | None) -> Callable:
    """Default to the engine's `session.get_spark`, resolved at task
    RUN time — resolving it at DAG-definition time would import
    pyspark into the Airflow scheduler's parse loop."""
    if session_factory is not None:
        return session_factory
    from ..session import get_spark

    return get_spark


def _resolve_operator_cls(operator_cls, fallback_hint: str):
    """Default to Airflow's PythonOperator (imported lazily — tests
    and airflow-less environments inject a stub), with the
    per-builder single-session fallback named in the error. One
    helper so an Airflow import-path change (e.g. a major-version
    move) lands in one place for every DAG builder."""
    if operator_cls is not None:
        return operator_cls
    try:
        from airflow.operators.python import PythonOperator

        return PythonOperator
    except ImportError as exc:  # pragma: no cover - env without airflow
        raise ImportError(
            "Airflow is not installed; either install apache-airflow "
            f"or run {fallback_hint}"
        ) from exc


#: (stage name, phases it executes, upstream stage names)
_STAGES: list[tuple[str, frozenset, list[str]]] = [
    ("enrich", frozenset({"load", "enrich"}), []),
    ("verify", frozenset({"verify"}), ["enrich"]),
    ("parse", frozenset({"parse"}), ["enrich"]),
    ("clean", frozenset({"clean"}), ["enrich", "verify", "parse"]),
]


def evm_day_stages(
    export_base: str,
    warehouse: str,
    ds: str,
    chain: str = "ethereum",
    decode_events: list | None = None,
    clean: bool = False,
    session_factory: Callable | None = None,
) -> list[tuple[str, Callable[[], dict], list[str]]]:
    """Process-isolated stage callables for one chain-day.

    Returns ``[(task_id, callable, upstream_task_ids), ...]`` in
    dependency order. Each callable is self-contained: it obtains a
    SparkSession from ``session_factory`` (default: the engine's
    `session.get_spark`) and runs its phase slice of `run_evm_day`,
    with cross-stage data flowing through the warehouse directory.
    """
    def _stage(phases: frozenset) -> Callable[[], dict]:
        def run() -> dict:
            from .runner import run_evm_day  # heavy: RUN time only

            spark = _resolve_session_factory(session_factory)(
                f"evm-{chain}-{ds}"
            )
            ctx = run_evm_day(
                spark,
                export_base,
                warehouse,
                ds,
                chain=chain,
                decode_events=decode_events,
                clean=clean,
                phases=phases,
            )
            # Airflow pushes the return value to XCom by default —
            # DataFrames are not serializable, so return only the
            # JSON-safe slice: completed task names plus scalar results
            # (the verify counts). The data itself lives in the
            # warehouse, which is the stages' real interface. The
            # json.dumps probe is the actual contract (a shallow
            # isinstance check would wave through a dict holding a
            # DataFrame one level down).
            import json

            def _json_safe(v) -> bool:
                try:
                    json.dumps(v)
                    return True
                except (TypeError, ValueError):
                    return False

            return {
                "completed": sorted(ctx),
                "scalars": {
                    k: v for k, v in ctx.items() if _json_safe(v)
                },
            }

        return run

    out = []
    for name, phases, upstream in _STAGES:
        if name == "parse" and not decode_events:
            continue
        if name == "clean" and not clean:
            continue
        ups = [
            u
            for u in upstream
            if u != "parse" or decode_events
        ]
        out.append((f"{chain}_{ds}_{name}", _stage(phases),
                    [f"{chain}_{ds}_{u}" for u in ups]))
    return out


def build_airflow_dag(
    dag,
    export_base: str,
    warehouse: str,
    ds: str,
    chain: str = "ethereum",
    decode_events: list | None = None,
    clean: bool = False,
    session_factory: Callable | None = None,
    operator_cls=None,
):
    """Attach the chain-day stages to an Airflow DAG as PythonOperators.

    ``operator_cls`` defaults to ``airflow.operators.python
    .PythonOperator`` (imported lazily); inject a stub in tests or a
    custom operator in production. Returns ``{task_id: operator}``.
    """
    operator_cls = _resolve_operator_cls(
        operator_cls,
        "the pipeline with pipeline.runner.run_evm_day "
        "(single-session, no orchestrator needed)",
    )

    stages = evm_day_stages(
        export_base,
        warehouse,
        ds,
        chain=chain,
        decode_events=decode_events,
        clean=clean,
        session_factory=session_factory,
    )
    ops = {
        task_id: operator_cls(task_id=task_id, python_callable=fn, dag=dag)
        for task_id, fn, _upstream in stages
    }
    for task_id, _fn, upstream in stages:
        for up in upstream:
            ops[up] >> ops[task_id]
    return ops


def build_maintenance_dag(
    dag,
    ivf_indexes=(),
    minhash_indexes=(),
    bm25_indexes=(),
    session_factory: Callable | None = None,
    operator_cls=None,
):
    """The scheduled index-maintenance tick
    (`pipeline.runner.maintenance_pipeline`) at Airflow granularity —
    the counterpart of the reference's standalone verifier DAG wiring
    (dags/chains/blockchain.py:115-126) for the engine's own
    operational surface: one PythonOperator per persisted index plus a
    terminal report operator wired downstream of all of them. Each
    operator builds (or reuses) its own SparkSession and returns the
    maintainer's JSON-safe report dict (XCom-friendly by
    construction). Returns ``{task_id: operator}``."""
    operator_cls = _resolve_operator_cls(
        operator_cls,
        "one tick with pipeline.runner.maintenance_pipeline(...).run()",
    )
    # DAG-definition time needs only names + deps: maintenance_task_specs
    # is import-free (the Airflow scheduler re-parses dagfiles
    # continuously — dragging the pyspark-heavy operator modules into
    # every parse loop would defeat runner.py's lazy-maintainer design).
    # Each callable is self-contained (the evm_day_stages rule): it
    # obtains its own session and runs exactly ONE maintain task. The
    # terminal report does NOT re-run its upstreams — their "written
    # state" is the index manifests, so it re-reads post-tick STATS
    # (bounded aggregations) the way evm stages re-read the warehouse.
    specs = maintenance_task_specs(
        ivf_indexes, minhash_indexes, bm25_indexes
    )

    def _one_task(kind: str, path: str, opts: dict) -> Callable[[], dict]:
        def run() -> dict:
            spark = _resolve_session_factory(session_factory)(
                "index-maintenance"
            )
            return _maintainer(kind)(spark, path, **opts)

        return run

    def _report() -> dict:
        spark = _resolve_session_factory(session_factory)(
            "index-maintenance"
        )
        from ..operators.dedup import minhash_index_stats
        from ..operators.similarity import ivf_index_stats
        from ..operators.text import bm25_index_stats

        out: dict = {}
        for kind, entries, statfn in (
            ("ivf", ivf_indexes, None),
            ("minhash", minhash_indexes, minhash_index_stats),
            ("bm25", bm25_indexes, bm25_index_stats),
        ):
            for entry in entries:
                path = entry[0] if isinstance(entry, tuple) else entry
                if kind == "ivf":  # per-cell rows: fold to one summary
                    rows = ivf_index_stats(spark, path).collect()
                    out[f"{kind}:{path}"] = {
                        "n_cells": len(rows),
                        "n_rows": sum(r["n_rows"] for r in rows),
                        "max_batches": max(
                            (r["n_batches"] for r in rows), default=0
                        ),
                    }
                else:
                    out[f"{kind}:{path}"] = (
                        statfn(spark, path).first().asDict()
                    )
        return out

    ops = {
        name: operator_cls(
            task_id=name,
            python_callable=_one_task(kind, path, opts),
            dag=dag,
        )
        for name, kind, path, opts in specs
    }
    ops["maintain_report"] = operator_cls(
        task_id="maintain_report", python_callable=_report, dag=dag
    )
    for name, _kind, _path, _opts in specs:
        ops[name] >> ops["maintain_report"]
    return ops


def build_sync_dag(
    dag,
    bm25_syncs=(),
    ivf_syncs=(),
    minhash_syncs=(),
    session_factory: Callable | None = None,
    operator_cls=None,
):
    """The incremental-index-sync release tick
    (`pipeline.runner.sync_pipeline`) at Airflow granularity — one
    PythonOperator per index plus a terminal report operator. Unlike
    the single-session runner, task inputs here are PARQUET PATHS
    (``(index_path, old_snapshot_path, new_snapshot_path)`` or the
    same + an options dict): an Airflow task cannot carry a live
    DataFrame across the process boundary, and reading the snapshots
    at RUN time inside each task is also what a real deployment does
    (the snapshot lands on storage; the DAG run is parameterized by
    its path). DAG-definition time imports nothing heavy — names and
    deps come from the entries alone (the parse-loop rule).

    Each task obtains its own session, reads both snapshots, runs the
    sync, and returns the JSON-safe diff-count report (XCom-friendly).
    The terminal ``sync_report`` re-reads nothing (sync reports are
    the tick's product, unlike maintenance where post-tick stats are
    re-readable state) — it simply depends on every sync so the DAG
    run's success means every index reached the snapshot.
    """
    operator_cls = _resolve_operator_cls(
        operator_cls,
        "one tick with pipeline.runner.sync_pipeline(...).run()",
    )
    specs = sync_task_specs(bm25_syncs, ivf_syncs, minhash_syncs)

    def _one_task(
        kind: str, path: str, old_p: str, new_p: str, opts: dict
    ) -> Callable[[], dict]:
        def run() -> dict:
            spark = _resolve_session_factory(session_factory)(
                "index-sync"
            )
            from ..operators import sync as _sync

            fn = {
                "bm25": _sync.sync_bm25_index_to_snapshot,
                "ivf": _sync.sync_ivf_index_to_snapshot,
                "minhash": _sync.sync_minhash_index_to_snapshot,
            }[kind]
            return fn(
                spark.read.parquet(old_p),
                spark.read.parquet(new_p),
                path,
                **opts,
            )

        return run

    ops = {
        name: operator_cls(
            task_id=name,
            python_callable=_one_task(kind, path, old_p, new_p, opts),
            dag=dag,
        )
        for name, kind, path, old_p, new_p, opts in specs
    }

    def _report() -> dict:
        return {"synced": [s[0] for s in specs]}

    ops["sync_report"] = operator_cls(
        task_id="sync_report", python_callable=_report, dag=dag
    )
    for name, *_rest in specs:
        ops[name] >> ops["sync_report"]
    return ops
