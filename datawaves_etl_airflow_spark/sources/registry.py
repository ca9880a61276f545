"""Contracts registry: contract/ABI definitions grouped per project,
from JSON files or an HTTP contract service.

Mirrors the reference registry layout
``dags/resources/contracts/{chain}/{project}/*.json`` read via
``read_resource`` (reference: dags/utils/common.py:23-29, grouped per
dataset at dags/chains/evm_chain.py:215-222), plus the HTTP registry
variant from the reference experiments
(``ContractService.get_contracts_by_chain``,
dags/experiments/contract_service.py:32-41 /
experiment_parser.py:43-75): both backends produce the same
``Contract`` model objects, so registry-driven decode is
backend-agnostic.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request
from glob import glob
from itertools import groupby

from ..schemas.abi import Contract


class RegistryError(RuntimeError):
    """A registry backend failed to produce contracts."""


class HttpContractRegistry:
    """ContractService-shaped HTTP client (reference
    dags/experiments/contract_service.py:32-41): ``GET
    {endpoint}/chain/{chain}`` returning ``{"data": [contract-dto...]}``
    where each DTO carries ``name``/``project``/``address`` and ``abi``
    as a JSON-encoded string (reference ContractDTO,
    contract_service.py:10-28). Stdlib-only; inject ``opener`` to stub
    transport in tests.
    """

    def __init__(
        self,
        endpoint: str,
        timeout: float = 10.0,
        opener=None,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.timeout = timeout
        self._open = opener or (
            lambda url: urllib.request.urlopen(url, timeout=self.timeout)
        )

    def get_contracts_by_chain(self, chain: str) -> list[Contract]:
        url = f"{self.endpoint}/chain/{chain}"
        try:
            with self._open(url) as res:
                # injected openers may hand back a non-2xx response
                # object instead of raising; the default urllib opener
                # raises HTTPError before this branch
                status = getattr(res, "status", 200)
                if not str(status).startswith("2"):
                    raise RegistryError(
                        f"get contracts by chain failed: {chain} "
                        f"(HTTP {status})"
                    )
                payload = json.loads(res.read().decode("utf-8"))
        except urllib.error.HTTPError as exc:
            # distinguish "service answered with an error" from
            # "network down" — an operator debugging a deployment
            # needs the real status, not 'unreachable'
            raise RegistryError(
                f"get contracts by chain failed: {chain} "
                f"(HTTP {exc.code} from {url})"
            ) from exc
        except urllib.error.URLError as exc:
            raise RegistryError(
                f"contract service unreachable at {url}: {exc}"
            ) from exc
        data = payload.get("data")
        if not isinstance(data, list):
            raise RegistryError(f"malformed registry response from {url}")
        return [self._to_contract(item) for item in data]

    @staticmethod
    def _to_contract(item: dict) -> Contract:
        # the DTO ships abi as a JSON string; file-registry dicts ship
        # it as a list — accept both
        abi_raw = item.get("abi")
        abi = json.loads(abi_raw) if isinstance(abi_raw, str) else (abi_raw or [])
        return Contract.from_contract_dict({
            "dataset_name": item.get("project")
            or item.get("dataset_name")
            or "",
            "contract_name": item.get("name")
            or item.get("contract_name")
            or "",
            "contract_address": item.get("address")
            or item.get("contract_address"),
            "abi": abi,
        })


def load_contracts_dir(root: str) -> list[Contract]:
    """Load every ``*.json`` under ``root`` (recursively) as a Contract."""
    out: list[Contract] = []
    for path in sorted(glob(os.path.join(root, "**", "*.json"), recursive=True)):
        with open(path) as f:
            out.append(Contract.from_contract_dict(json.load(f)))
    return out


def group_by_dataset(contracts: list[Contract]) -> dict[str, list[Contract]]:
    """Group contracts per dataset for per-project parse pipelines
    (reference: dags/chains/evm_chain.py:232-233)."""
    key = lambda c: c.dataset_name  # noqa: E731
    return {k: list(g) for k, g in groupby(sorted(contracts, key=key), key=key)}
