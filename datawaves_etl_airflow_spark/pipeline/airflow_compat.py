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

from .runner import run_evm_day

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
    if session_factory is None:
        from ..session import get_spark as session_factory  # noqa: PLW0127

    def _stage(phases: frozenset) -> Callable[[], dict]:
        def run() -> dict:
            spark = session_factory(f"evm-{chain}-{ds}")
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
    if operator_cls is None:
        try:
            from airflow.operators.python import PythonOperator as operator_cls
        except ImportError as exc:  # pragma: no cover - env without airflow
            raise ImportError(
                "Airflow is not installed; either install apache-airflow "
                "or run the pipeline with pipeline.runner.run_evm_day "
                "(single-session, no orchestrator needed)"
            ) from exc

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
