"""Warehouse sinks (S-3, S-4, S-5).

The reference's sink contract is idempotent daily partition overwrite:
``INSERT OVERWRITE TABLE db.t PARTITION (dt = date ds [, address_hash,
selector_hash])`` (reference: dags/templates/evm_load_template.py:
153-154,203-204,302-303 — mixed static/dynamic partitions for
logs/traces). The engine standardizes on Parquet warehouse tables with
``partitionOverwriteMode=dynamic`` so re-running a day replaces exactly
that day's partitions (plus any hash sub-buckets) and nothing else.

Scale: partition columns are (dt[, address_hash, selector_hash]) — at
100 TB the 10×10 hash-bucket layout keeps per-file sizes sane and lets
decode reads prune to 1/100th of a day. File sizing is AQE's job
(advisoryPartitionSizeInBytes), not a REPARTITION(1) hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    table: str,
    ds: str,
    extra_partition_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """S-3: idempotent ``INSERT OVERWRITE ... PARTITION (dt=ds, ...)``.

    Stamps the static ``dt`` partition column then dynamically
    overwrites; ``extra_partition_cols`` carries the logs/traces
    hash-bucket layout. ``path`` writes an external location instead of
    a catalog table (used by tests and file-based deployments).
    """
    out = df.withColumn("dt", F.lit(ds).cast("date"))
    part_cols = ["dt"] + (extra_partition_cols or [])
    writer = out.write.mode("overwrite").partitionBy(*part_cols)
    if path is not None:
        writer.parquet(path)
    else:
        spark = df.sparkSession
        if not spark.catalog.tableExists(table):
            writer.format("parquet").saveAsTable(table)
        else:
            out.write.mode("overwrite").insertInto(table)


def append_dedup(
    staged: DataFrame,
    table: str,
    key: str = "address",
    path: str | None = None,
) -> None:
    """S-4: append only rows whose ``key`` is not already present
    (tokens sink, reference: evm_load_template.py:281-297). Composes the
    J-6 anti-join with an append write."""
    spark = staged.sparkSession
    if path is not None:
        try:
            existing = spark.read.parquet(path).select(key).distinct()
            new = staged.join(existing, key, "left_anti")
        except Exception:
            new = staged
        new.write.mode("append").parquet(path)
    else:
        if spark.catalog.tableExists(table):
            existing = spark.table(table).select(key).distinct()
            staged.join(existing, key, "left_anti").write.mode(
                "append"
            ).insertInto(table)
        else:
            staged.write.format("parquet").saveAsTable(table)


def drop_staging(spark: SparkSession, database: str, table: str) -> None:
    """S-5: drop the staging temp table (reference:
    evm_load_template.py:418-419, dags/chains/loader.py:144-153). The
    in-process engine rarely materializes staging tables, but pipelines
    that checkpoint them clean up with this."""
    spark.sql(f"DROP TABLE IF EXISTS `{database}`.`{table}`")
