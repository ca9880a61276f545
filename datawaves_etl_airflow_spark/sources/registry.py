"""Contracts registry: load contract/ABI JSON files grouped per project.

Mirrors the reference registry layout
``dags/resources/contracts/{chain}/{project}/*.json`` read via
``read_resource`` (reference: dags/utils/common.py:23-29, grouped per
dataset at dags/chains/evm_chain.py:215-222). An HTTP registry variant
exists in the reference experiments (dags/experiments/contract_service.py:32-41);
here any callable returning JSON strings can stand in.
"""

from __future__ import annotations

import json
import os
from glob import glob
from itertools import groupby

from ..schemas.abi import Contract


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
