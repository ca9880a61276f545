"""Warehouse SQL views: the switch-over surface for reference users.

The reference's consumers speak SQL against Hive-style tables
(``{schema}.blocks`` etc. — every template in
dags/templates/evm_load_template.py and dags/resources/verify/*.sql).
`register_warehouse_views` exposes the engine's parquet warehouse under
the same table names (optionally inside a database so the two-part
``schema.table`` spelling works verbatim), and `render_reference_sql`
fills the reference's Jinja placeholders (``{{ params.schema_name }}``,
``{{ ds }}``) so the reference repo's own SQL text runs unchanged
through ``spark.sql`` — the concrete "a user of the reference can
switch" proof, exercised in tests with the verify templates.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: warehouse tables `pipeline.runner.run_evm_day` writes
WAREHOUSE_TABLES = [
    "blocks",
    "transactions",
    "logs",
    "traces",
    "contracts",
    "token_transfers",
    "tokens",
    "prices",
]


def register_warehouse_views(
    spark: SparkSession,
    warehouse: str,
    chain: str = "ethereum",
    database: str | None = None,
) -> list[str]:
    """Register every existing warehouse table as a SQL view.

    With ``database`` set, views are created as ``{database}.{table}``
    (the reference's two-part ``schema.table`` references resolve
    as-is); otherwise they are session temp views named ``{table}``.
    Returns the registered table names.
    """
    from .fs import path_exists

    registered = []
    if database is not None:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {_qident(database)}")
    for table in WAREHOUSE_TABLES:
        path = os.path.join(warehouse, chain, table)
        # Hadoop-FS probe: a remote (hdfs://s3a://) warehouse must not
        # silently register zero views
        if not path_exists(spark, path):
            continue
        if database is not None:
            # a catalog view straight over the parquet path (permanent
            # views may not reference temp views, so go direct).
            # Identifiers are backtick-quoted and the path is checked:
            # interpolating them raw would let a quote/backtick in a
            # caller-supplied database or warehouse root break the
            # statement — or inject SQL.
            if "`" in path:
                raise ValueError(
                    f"warehouse path contains a backtick, which cannot "
                    f"be escaped inside a parquet.`…` reference: {path!r}"
                )
            spark.sql(
                f"CREATE OR REPLACE VIEW "
                f"{_qident(database)}.{_qident(table)} "
                f"AS SELECT * FROM parquet.`{path}`"
            )
        else:
            spark.read.parquet(path).createOrReplaceTempView(table)
        registered.append(table)
    return registered


def _qident(name: str) -> str:
    """Backtick-quote a SQL identifier (embedded backticks doubled,
    per Spark's identifier-escaping rule)."""
    return "`" + name.replace("`", "``") + "`"


def render_reference_sql(
    template: str, schema_name: str, ds: str
) -> str:
    """Fill the only two Jinja placeholders the reference's SQL uses
    (parser/verifier templates: ``{{ params.schema_name }}`` and
    ``{{ ds }}``) — no Jinja dependency needed for this grammar."""
    out = template
    for spelling in (
        "{{ params.schema_name }}",
        "{{params.schema_name}}",
    ):
        out = out.replace(spelling, schema_name)
    for spelling in ("{{ ds }}", "{{ds}}"):
        out = out.replace(spelling, ds)
    return out
