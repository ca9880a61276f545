"""Per-chain pipeline configuration — the reference's chain build
surface (dags/chains/evm_chain.py:178-270) as plain dataclasses.

The reference declares, per chain, a list of ``Loader``s with explicit
enrich/clean dependency lists and per-task Spark resource overrides,
then builds export/load/verify/parse DAGs from them
(dags/chains/blockchain.py:48-142). Here the same declarations drive
``pipeline.run_evm_day``; the resource override hook maps to a per-task
conf dict applied around the task (replacing SparkResource,
dags/chains/evm_chain.py:202-209).

Two built-in chains mirror the reference deployments:
- **ethereum**: parity-style traces exported with transaction hashes
  (enrich_traces, J-4).
- **polygon**: geth traces without transaction hashes, recovered by the
  composite-key join (enrich_geth_traces, J-5) — the one structural
  difference between the two chains in the reference
  (dags/chains/evm_chain.py:191-212).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LoaderSpec:
    """One staging table's load→enrich declaration
    (reference Loader, dags/chains/loader.py + evm_chain.py:178-190)."""

    table: str
    file_format: str = "json"
    enrich_dependencies: tuple[str, ...] = ()
    #: partition layout beyond dt (logs/traces hash buckets, SURVEY §4)
    extra_partition_cols: tuple[str, ...] = ()
    #: per-task Spark conf overrides (replaces SparkResource)
    conf: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class ChainConfig:
    name: str
    loaders: tuple[LoaderSpec, ...]
    #: which trace family the chain exports (reference: polygon uses
    #: geth traces, evm_chain.py:191-212)
    trace_mode: str = "parity"  # 'parity' | 'geth'


_BUCKETS = ("address_hash", "selector_hash")

_COMMON = (
    LoaderSpec("blocks"),
    LoaderSpec("transactions", enrich_dependencies=("blocks", "receipts")),
    LoaderSpec("receipts"),
    LoaderSpec("logs", enrich_dependencies=("blocks",),
               extra_partition_cols=_BUCKETS),
    LoaderSpec("contracts", enrich_dependencies=("blocks",)),
    LoaderSpec("token_transfers", enrich_dependencies=("blocks",)),
    LoaderSpec("tokens"),
    LoaderSpec("prices", file_format="csv"),
)

ETHEREUM = ChainConfig(
    name="ethereum",
    loaders=_COMMON + (
        LoaderSpec("traces", enrich_dependencies=("blocks",),
                   extra_partition_cols=_BUCKETS),
    ),
    trace_mode="parity",
)

POLYGON = ChainConfig(
    name="polygon",
    loaders=_COMMON + (
        # heavy enrich gets a bigger shuffle budget, mirroring the
        # reference's 3×(4 cores, 10g) override (evm_chain.py:202-209)
        LoaderSpec(
            "geth_traces",
            enrich_dependencies=("blocks", "transactions"),
            extra_partition_cols=_BUCKETS,
            conf=(("spark.sql.shuffle.partitions", "64"),),
        ),
    ),
    trace_mode="geth",
)

CHAINS: dict[str, ChainConfig] = {c.name: c for c in (ETHEREUM, POLYGON)}
