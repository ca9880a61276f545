"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query corpus lives in ``datawaves_etl_airflow_spark.queries`` —
``generic`` (relational ops on the TPC-H-ish driver tables), ``domain``
(blockchain enrich/decode on deterministic fixtures), and ``llm``
(dedup / similarity / text analysis on documents+embeddings).
"""

from __future__ import annotations

import os
import sys
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    from datawaves_etl_airflow_spark.queries import generic

    out.update(generic.QUERIES)
    try:
        from datawaves_etl_airflow_spark.queries import domain

        out.update(domain.QUERIES)
    except ImportError:
        pass
    try:
        from datawaves_etl_airflow_spark.queries import llm

        out.update(llm.QUERIES)
    except ImportError:
        pass
    return {name: _pinned(fn) for name, fn in out.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin per query (rows-only checks omit)."""
    out: dict[str, str] = {}
    from datawaves_etl_airflow_spark.queries import generic

    out.update(generic.ORACLES)
    try:
        from datawaves_etl_airflow_spark.queries import domain

        domain.ensure_fixtures()
        out.update(domain.ORACLES)
    except ImportError:
        pass
    try:
        from datawaves_etl_airflow_spark.queries import llm

        out.update(llm.ORACLES)
    except ImportError:
        pass
    return out
