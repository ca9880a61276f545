"""Pipeline runner: Airflow-optional topological task execution."""

from .runner import Pipeline, Task, run_evm_day  # noqa: F401
