"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query corpus lives in ``datawaves_etl_airflow_spark.queries`` —
``generic`` (relational ops on the TPC-H-ish driver tables), ``domain``
(blockchain enrich/decode on deterministic fixtures), and ``llm``
(dedup / similarity / text analysis on documents+embeddings).

Registration policy (round 3): the driver's correctness run has a hard
budget — round 2 registered 88 queries and the run stopped at exactly
the 50th, leaving the whole decode and LLM families without a single
CORRECTNESS row. ``queries()`` therefore registers exactly the 50
highest-information queries (every SURVEY §2 operator family + every
LLM-pipeline component), ordered never-verified-first:
domain (decode → verify → staging/enrich) → llm → generic extension
picks. The FULL corpus (164 queries as of round 13 — 159 oracled + 5
rows-only-by-design; counts pinned against the registries by
tests/test_contract.py) stays importable via
``queries_all()`` / ``oracle_sql_all()`` and is verified end-to-end by
``tools/parity.py`` (a driver-faithful local gate: DuckDB fetched via
pandas so DECIMAL/HUGEINT coercions are reproduced) plus pytest plan
tests for the trimmed variants.
"""

from __future__ import annotations

import os
import sys
import traceback
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The J-1-shaped 3-way join (fact ⋈ fact-agg ⋈ broadcast dim) — the
    reference's enrich_transactions expressed on the generic tables.
    """
    from datawaves_etl_airflow_spark.queries.generic import j1_order_revenue_3way

    return j1_order_revenue_3way(spark, "/root/testdata/sf0.001")


def _pinned(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin session confs the queries assume (the driver session may not
    use our factory): UTC timestamp semantics, plus AQE with sane
    shuffle sizing so a default-conf session doesn't run 200-partition
    shuffles over sf0.01 inputs."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        for k, v in [
            ("spark.sql.session.timeZone", "UTC"),
            ("spark.sql.adaptive.enabled", "true"),
            ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
            ("spark.sql.shuffle.partitions", "32"),
        ]:
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # never let conf pinning break a query
        return fn(spark, sf_dir)

    return wrapped


def _import_failure_sentinel(modname: str, tb: str):
    """A query that surfaces an import failure as rows instead of
    silently dropping a whole family (round-2 hazard: a missing
    pandas/pyarrow would have erased 49 queries with no trace)."""

    def sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
        return spark.createDataFrame(
            [(modname, line) for line in tb.splitlines()],
            "failed_module string, traceback_line string",
        )

    return sentinel


def _load():
    """(modules, failures) — every queries module, imported loudly."""
    mods = {}
    failures = {}
    for modname in ("domain", "llm", "generic"):
        try:
            mods[modname] = __import__(
                f"datawaves_etl_airflow_spark.queries.{modname}",
                fromlist=[modname],
            )
        except Exception:
            tb = traceback.format_exc()
            print(
                f"__spark_entry__: FAILED to import queries.{modname}:\n{tb}",
                file=sys.stderr,
            )
            failures[modname] = tb
    return mods, failures


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The 50 driver-registered queries, never-verified-first order
    (authored for queries.REGISTRATION_ROUND — see the freshness gate)."""
    mods, failures = _load()
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for modname, tb in failures.items():
        out[f"aa_import_error_{modname}"] = _import_failure_sentinel(modname, tb)
    for modname in ("domain", "llm", "generic"):
        mod = mods.get(modname)
        if mod is None:
            continue
        for name in mod.DRIVER_QUERIES:
            out[name] = _pinned(mod.QUERIES[name])
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin per registered query (rows-only
    checks omit theirs)."""
    mods, _ = _load()
    registered = set()
    out: dict[str, str] = {}
    for modname in ("domain", "llm", "generic"):
        mod = mods.get(modname)
        if mod is None:
            continue
        if hasattr(mod, "ensure_fixtures"):
            mod.ensure_fixtures()
        registered.update(mod.DRIVER_QUERIES)
        out.update({k: v for k, v in mod.ORACLES.items() if k in registered})
    return out


def queries_all() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The FULL corpus (registered + trimmed variants) for tools/parity."""
    mods, _ = _load()
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for modname in ("domain", "llm", "generic"):
        mod = mods.get(modname)
        if mod is not None:
            out.update({n: _pinned(f) for n, f in mod.QUERIES.items()})
    return out


def oracle_sql_all() -> dict[str, str]:
    """Oracles for the FULL corpus (tools/parity)."""
    mods, _ = _load()
    out: dict[str, str] = {}
    for modname in ("domain", "llm", "generic"):
        mod = mods.get(modname)
        if mod is not None:
            if hasattr(mod, "ensure_fixtures"):
                mod.ensure_fixtures()
            out.update(mod.ORACLES)
    return out
