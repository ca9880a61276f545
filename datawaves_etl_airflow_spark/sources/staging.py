"""Schema-on-read staging sources (S-1, S-2, S-6).

The reference materializes each day's export file as a temp table
(``CREATE TABLE ... USING json OPTIONS (path ...)``,
reference: dags/templates/evm_load_template.py:4-149, invoked from
dags/chains/loader.py:88-93) because every spark-submit is a fresh JVM.
In-process we read straight into a DataFrame with the explicit schema —
same schema-on-read semantics, one lineage, no temp-table round trip.
"""

from __future__ import annotations

import os
from glob import glob

from pyspark.sql import DataFrame, SparkSession

from ..schemas.staging import STAGING_FORMATS, staging_schema


def export_path(base: str, chain: str, table: str, ds: str, fmt: str | None = None) -> str:
    """S3/posix layout of a day's export file:
    ``export/{chain}/{table}/block_date={ds}/{table}.{fmt}``
    (reference: dags/chains/loader.py:161-165,
    dags/chains/exporters/python.py:33-34)."""
    fmt = fmt or STAGING_FORMATS[table]
    return os.path.join(
        base, "export", chain, table, f"block_date={ds}", f"{table}.{fmt}"
    )


def input_exists(path: str, spark: SparkSession | None = None) -> bool:
    """Availability check standing in for the reference's S3KeySensor
    (S-6, reference: dags/chains/loader.py:79-86). With a session, the
    probe goes through Hadoop's FileSystem glob so hdfs://s3a:// export
    buckets work (sources.fs); without one it falls back to a local
    glob."""
    if spark is not None:
        from .fs import glob_paths

        return bool(glob_paths(spark, path))
    return bool(glob(path))


def read_staging(
    spark: SparkSession, table: str, path: str, fmt: str | None = None
) -> DataFrame:
    """Read one staging table with its exact reference schema.

    json → line-delimited JSON (S-1); csv → header CSV, prices only
    (S-2, reference: dags/chains/evm_chain.py:189). Never infers.
    """
    schema = staging_schema(table)
    fmt = fmt or STAGING_FORMATS[table]
    reader = spark.read.schema(schema)
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        return reader.option("header", True).csv(path)
    if fmt == "parquet":
        return reader.parquet(path)
    raise ValueError(f"unsupported staging format {fmt!r}")
