"""SparkSession factory with scale-aware defaults.

The reference sizes clusters per-operator via Airflow Variable conf
overrides (reference: dags/chains/evm_chain.py:202-209,
dags/chains/resource_apply.py:41-57). The native engine replaces that
with one right-sized session + AQE, keeping a per-job conf hook.

Every default below is chosen for the 100 TB posture and degrades
gracefully on local[N]:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy demotion replace hand-tuned executor counts.
- dynamic partition overwrite: the reference's idempotent
  ``INSERT OVERWRITE ... PARTITION (dt=...)`` (evm_load_template.py:153-154)
  with mixed static/dynamic partitions needs
  ``spark.sql.sources.partitionOverwriteMode=dynamic``.
- Arrow on: all pandas UDFs (ABI decode, multimodal) move batches via
  Arrow, never per-row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied to every session the engine builds. Callers may override
#: any key via the ``conf`` argument (the per-job resource hook that
#: replaces the reference's SparkResource dataclass).
ENGINE_DEFAULTS: dict[str, str] = {
    # --- adaptive execution: the scale story -------------------------
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # --- idempotent daily partition overwrite (S-3) ------------------
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # --- python <-> JVM data movement --------------------------------
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # --- scan sizing: 128 MiB splits keep 100 TB ~ 800k tasks, fine --
    "spark.sql.files.maxPartitionBytes": "134217728",
    # --- writes: size-based file targets, not REPARTITION(1) ---------
    # (the reference coalesces every enrich output to one file,
    # evm_load_template.py:155 etc.; at 100 TB that serializes the
    # write, so the engine targets ~128 MiB output files instead)
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "134217728",
    # broadcast joins for dimension tables up to 64 MiB
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    # session timezone pinned so timestamp semantics are reproducible
    "spark.sql.session.timeZone": "UTC",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "datawaves-etl-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
    warehouse_dir: str | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``conf`` is the per-job override hook; ``warehouse_dir`` places the
    managed-table warehouse (tests point it at a tmpdir).
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    merged = dict(ENGINE_DEFAULTS)
    # shuffle partitions scale with available cores locally; on a real
    # cluster AQE coalesces whatever this starts at.
    merged.setdefault("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    if warehouse_dir:
        merged["spark.sql.warehouse.dir"] = warehouse_dir
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
