"""Export source adapters (S-7..S-11, S-13, P-6).

The reference's export phase shells out to the ethereum-etl/polygon-etl
CLIs per resource (reference: dags/chains/exporters/python.py:44-268);
the engine owns the *contract* — the export layout, the per-resource
dependency order, the block-range-for-date computation, the
`extract_field` projection, and the provider-failover loop — behind a
``ChainSource`` interface. A real deployment plugs a JSON-RPC client in;
tests and local runs use ``SyntheticChainSource`` (deterministic, built
on the fixture generator's shapes).

Exports are driver-side I/O producing line-delimited JSON in
``export/{chain}/{table}/block_date={ds}/{table}.json``
(reference: dags/chains/exporters/python.py:33-34) — the schema contract
with the load phase is the IR (SURVEY.md §3.2).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field


class ExportError(RuntimeError):
    pass


@dataclass
class ChainSource:
    """Interface a chain backend implements; each method returns row
    dicts matching the staging schema of its table (schemas.staging).

    Mirrors the per-exporter callbacks of
    dags/chains/exporters/python.py:90-268."""

    def get_block_range(self, ds: str) -> tuple[int, int]:  # S-7 helper :75-87
        raise NotImplementedError

    def export_blocks_and_transactions(
        self, start: int, end: int
    ) -> tuple[list[dict], list[dict]]:  # S-7 :90-114
        raise NotImplementedError

    def export_receipts_and_logs(
        self, tx_hashes: list[str]
    ) -> tuple[list[dict], list[dict]]:  # S-8 :117-146
        raise NotImplementedError

    def export_traces(self, start: int, end: int) -> list[dict]:  # S-9 :215-236
        raise NotImplementedError

    def export_geth_traces(
        self, start: int, end: int
    ) -> list[dict]:  # S-10 :239-268
        raise NotImplementedError

    def extract_tokens(
        self, contract_addresses: list[str]
    ) -> list[dict]:  # S-11 :171-191 (values_as_strings=True)
        raise NotImplementedError


def export_path(base: str, chain: str, table: str, ds: str) -> str:
    return os.path.join(
        base, "export", chain, table, f"block_date={ds}", f"{table}.json"
    )


def write_export(path: str, rows: Iterable[dict]) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, separators=(",", ":")) + "\n")
    return path


def extract_field(rows: Iterable[dict], field_name: str) -> list:
    """P-6: single-field projection (reference
    dags/chains/exporters/python.py:125-129 pulls tx hashes back out of
    transactions.json the same way)."""
    return [r[field_name] for r in rows]


def with_provider_failover(
    providers: Sequence[ChainSource],
    fn: Callable[[ChainSource], object],
) -> object:
    """S-13: try each provider in order until one succeeds
    (reference dags/chains/exporters/python.py:59-73)."""
    last: Exception | None = None
    for p in providers:
        try:
            return fn(p)
        except Exception as e:  # noqa: BLE001 - failover by contract
            last = e
    raise ExportError(f"all {len(providers)} providers failed") from last


@dataclass
class SyntheticChainSource(ChainSource):
    """Deterministic in-memory chain for tests/local runs — the stand-in
    for a JSON-RPC node (the real node is outside this repo's scope,
    exactly as ethereum-etl is outside the reference's).

    ``fail`` makes every method raise, to exercise S-13 failover.
    """

    ds_data: dict[str, dict[str, list[dict]]] = field(default_factory=dict)
    fail: bool = False

    def _maybe_fail(self) -> None:
        if self.fail:
            raise ExportError("synthetic provider down")

    def _day(self, table: str) -> list[dict]:
        # single synthetic day keyed by fixture DS
        from ..testing import fixtures as fx

        fx.ensure_fixtures()
        path = fx.export_file(table)
        with open(path) as f:
            return [json.loads(line) for line in f]

    def get_block_range(self, ds: str) -> tuple[int, int]:
        self._maybe_fail()
        blocks = self._day("blocks")
        nums = [b["number"] for b in blocks]
        return min(nums), max(nums)

    def export_blocks_and_transactions(self, start, end):
        self._maybe_fail()
        blocks = [b for b in self._day("blocks") if start <= b["number"] <= end]
        txs = [
            t for t in self._day("transactions")
            if start <= t["block_number"] <= end
        ]
        return blocks, txs

    def export_receipts_and_logs(self, tx_hashes):
        self._maybe_fail()
        hs = set(tx_hashes)
        receipts = [
            r for r in self._day("receipts") if r["transaction_hash"] in hs
        ]
        logs = [
            log for log in self._day("logs") if log["transaction_hash"] in hs
        ]
        return receipts, logs

    def export_traces(self, start, end):
        self._maybe_fail()
        return [
            t for t in self._day("traces") if start <= t["block_number"] <= end
        ]

    def export_geth_traces(self, start, end):
        self._maybe_fail()
        return [
            t for t in self._day("geth_traces")
            if start <= t["block_number"] <= end
        ]

    def extract_tokens(self, contract_addresses):
        self._maybe_fail()
        want = set(contract_addresses)
        return [
            t for t in self._day("tokens") if not want or t["address"] in want
        ]


def run_export_day(
    providers: Sequence[ChainSource],
    base: str,
    chain: str,
    ds: str,
) -> dict[str, str]:
    """Run the full export dependency chain for one day:
    blocks+txs → receipts+logs; traces → (contracts/tokens upstream of
    load); geth traces — mirroring the exporter DAG wiring
    (reference dags/chains/evm_chain.py:33-104, blockchain.py:81-83).

    Returns table → written file path.
    """
    out: dict[str, str] = {}

    def _run(fn):
        return with_provider_failover(providers, fn)

    start, end = _run(lambda p: p.get_block_range(ds))
    blocks, txs = _run(lambda p: p.export_blocks_and_transactions(start, end))
    out["blocks"] = write_export(export_path(base, chain, "blocks", ds), blocks)
    out["transactions"] = write_export(
        export_path(base, chain, "transactions", ds), txs
    )
    tx_hashes = extract_field(txs, "hash")  # P-6
    receipts, logs = _run(lambda p: p.export_receipts_and_logs(tx_hashes))
    out["receipts"] = write_export(
        export_path(base, chain, "receipts", ds), receipts
    )
    out["logs"] = write_export(export_path(base, chain, "logs", ds), logs)
    traces = _run(lambda p: p.export_traces(start, end))
    out["traces"] = write_export(export_path(base, chain, "traces", ds), traces)
    return out
