"""D-3: registry-driven decode — contracts loaded from JSON files (or
any callable registry) drive the same decode operator."""

import json
import os

import pytest

from datawaves_etl_airflow_spark.operators import enrich
from datawaves_etl_airflow_spark.operators.decode import decode_log_events
from datawaves_etl_airflow_spark.queries.domain import _staged
from datawaves_etl_airflow_spark.schemas.abi import Contract
from datawaves_etl_airflow_spark.sources.registry import (
    group_by_dataset,
    load_contracts_dir,
)

ERC20_CONTRACT = {
    "dataset_name": "erc20",
    "contract_name": "ERC20",
    "abi": [
        {
            "type": "event", "name": "Transfer", "anonymous": False,
            "inputs": [
                {"name": "from", "type": "address", "indexed": True},
                {"name": "to", "type": "address", "indexed": True},
                {"name": "value", "type": "uint256", "indexed": False},
            ],
        },
        {"type": "constructor", "inputs": []},  # filtered out
    ],
}


class TestRegistry:
    def test_load_dir_and_group(self, tmp_path):
        proj = tmp_path / "ethereum" / "erc20"
        proj.mkdir(parents=True)
        (proj / "erc20.json").write_text(json.dumps(ERC20_CONTRACT))
        other = dict(ERC20_CONTRACT, dataset_name="other")
        (proj / "other.json").write_text(json.dumps(other))
        contracts = load_contracts_dir(str(tmp_path))
        assert len(contracts) == 2
        grouped = group_by_dataset(contracts)
        assert set(grouped) == {"erc20", "other"}
        # non-event/function elements dropped (P-8)
        assert all(
            e.type in ("event", "function")
            for c in contracts for e in c.abi
        )

    def test_registry_to_decode_end_to_end(self, spark, tmp_path):
        """Registry JSON → Contract → decode operator → decoded rows,
        with the reference's decoded-table naming."""
        proj = tmp_path / "ethereum" / "erc20"
        proj.mkdir(parents=True)
        (proj / "erc20.json").write_text(json.dumps(ERC20_CONTRACT))
        [contract] = load_contracts_dir(str(tmp_path))
        [event] = contract.events()
        assert contract.table_name(event) == "erc20.ERC20_evt_Transfer"
        logs = enrich.enrich_logs(
            _staged(spark, "logs"), _staged(spark, "blocks")
        )
        out = decode_log_events(logs, event)
        assert out.count() == 100  # the fixture's planted Transfers

    def test_callable_registry_stand_in(self):
        """An HTTP registry (reference experiments) is just a callable
        returning contract JSON — same model objects downstream."""

        def fake_http_fetch() -> list[str]:
            return [json.dumps(ERC20_CONTRACT)]

        contracts = [Contract.from_json(s) for s in fake_http_fetch()]
        assert contracts[0].contract_name == "ERC20"
        assert len(contracts[0].events()) == 1


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/dags/resources/contracts"),
    reason="reference registry not present",
)
class TestReferenceRegistryParity:
    def test_reference_contracts_load(self):
        """Every contract JSON the reference ships loads through our
        registry (same file format contract)."""
        contracts = load_contracts_dir(
            "/root/reference/dags/resources/contracts"
        )
        assert contracts, "reference registry unexpectedly empty"
        names = {c.contract_name for c in contracts}
        assert any(n for n in names)
        for c in contracts:
            for e in c.events():
                assert e.event_topic0().startswith("0x")
