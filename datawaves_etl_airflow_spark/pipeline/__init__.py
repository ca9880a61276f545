"""Pipeline runner: Airflow-optional topological task execution.

Lazy re-exports (PEP 562): `runner` imports pyspark and the operator
modules at module level, and this package must stay importable from an
Airflow scheduler's DAG-parse loop (`airflow_compat` +
`maintenance` are deliberately import-light) without paying that cost.
"""

from __future__ import annotations

_RUNNER_EXPORTS = ("Pipeline", "Task", "run_evm_day")

__all__ = list(_RUNNER_EXPORTS)


def __getattr__(name: str):
    if name in _RUNNER_EXPORTS:
        from . import runner

        return getattr(runner, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )
