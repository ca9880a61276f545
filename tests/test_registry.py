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


def _service_payload() -> dict:
    """Reference ContractDTO shape: abi as a JSON-encoded STRING
    (contract_service.py:10-28)."""
    return {
        "data": [
            {
                "id": "1",
                "chain": "ethereum",
                "name": "ERC20",
                "project": "erc20",
                "type": "token",
                "address": "0x" + "ab" * 20,
                "abi": json.dumps(ERC20_CONTRACT["abi"]),
            }
        ]
    }


class _StubServer:
    """In-process HTTP contract service for tests."""

    def __enter__(self):
        import threading
        from http.server import BaseHTTPRequestHandler, HTTPServer

        payload = json.dumps(_service_payload()).encode()

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (http.server API)
                if self.path == "/contract/chain/ethereum":
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(payload)
                else:
                    self.send_response(404)
                    self.end_headers()
                    self.wfile.write(b"{}")

            def log_message(self, *a):  # quiet
                pass

        self.httpd = HTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()
        host, port = self.httpd.server_address
        return f"http://{host}:{port}/contract"

    def __exit__(self, *exc):
        self.httpd.shutdown()
        self.httpd.server_close()


class TestHttpRegistry:
    def test_fetch_parses_dto_shape(self):
        from datawaves_etl_airflow_spark.sources.registry import (
            HttpContractRegistry,
        )

        with _StubServer() as endpoint:
            reg = HttpContractRegistry(endpoint)
            [contract] = reg.get_contracts_by_chain("ethereum")
        assert contract.contract_name == "ERC20"
        assert contract.dataset_name == "erc20"
        assert contract.contract_address == "0x" + "ab" * 20
        # constructor dropped (P-8), event kept
        assert [e.type for e in contract.abi] == ["event"]

    def test_http_error_and_unreachable_raise(self):
        from datawaves_etl_airflow_spark.sources.registry import (
            HttpContractRegistry,
            RegistryError,
        )

        with _StubServer() as endpoint:
            reg = HttpContractRegistry(endpoint)
            # a service ERROR must report the real status, not
            # masquerade as a network failure
            with pytest.raises(RegistryError, match="HTTP 404"):
                reg.get_contracts_by_chain("unknown-chain")
        with pytest.raises(RegistryError):
            HttpContractRegistry(
                "http://127.0.0.1:9", timeout=0.5
            ).get_contracts_by_chain("ethereum")

    def test_decode_identical_from_both_backends(self, spark, tmp_path):
        """D-3 end-to-end: the same decode result whether contracts come
        from the file registry or the HTTP service."""
        from datawaves_etl_airflow_spark.sources.registry import (
            HttpContractRegistry,
        )

        proj = tmp_path / "ethereum" / "erc20"
        proj.mkdir(parents=True)
        (proj / "erc20.json").write_text(json.dumps(ERC20_CONTRACT))
        [file_contract] = load_contracts_dir(str(tmp_path))
        with _StubServer() as endpoint:
            [http_contract] = HttpContractRegistry(
                endpoint
            ).get_contracts_by_chain("ethereum")

        logs = enrich.enrich_logs(
            _staged(spark, "logs"), _staged(spark, "blocks")
        )
        [ev_file] = file_contract.events()
        [ev_http] = http_contract.events()
        a = decode_log_events(logs, ev_file)
        b = decode_log_events(logs, ev_http)
        assert a.columns == b.columns
        assert a.count() == b.count() == 100
        assert a.exceptAll(b).count() == 0


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
