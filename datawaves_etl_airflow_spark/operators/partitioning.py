"""Scale-adaptive parallelism guard (r13 optimization round).

A parquet file with one row group is ONE scan task no matter what
``spark.sql.files.maxPartitionBytes`` / ``minPartitionNum`` say —
splits cannot cross row-group boundaries — so a CPU-heavy per-row
stage (regex tokenization, Arrow-batched codec UDFs) fed by a small
file runs serially while the rest of the cluster idles. The guard
repartitions ONLY when the plan's current partitioning is below the
session's ``defaultParallelism``; at production scale inputs already
carry far more partitions than cores and the guard is the identity —
no shuffle is added (guide §2.4: remove shuffles outright), which is
what keeps this scale-adaptive rather than a local[32] tuning knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_min_parallelism(df: DataFrame, id_col: str | None = None) -> DataFrame:
    """``df`` repartitioned to ``defaultParallelism`` iff it currently
    has fewer partitions; hash-partitioned on ``id_col`` when given
    (skips the defensive local sort a round-robin repartition pays —
    ``spark.sql.execution.sortBeforeRepartition``)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= target:
        return df
    if id_col is not None:
        return df.repartition(target, F.col(id_col))
    return df.repartition(target)
