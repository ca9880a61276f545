"""ABI model: signatures/selectors, schema compiler, codec round-trip
(including property-based and the real Seaport nested tuple[] ABI)."""

import json
import os
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    StringType,
    StructType,
)

from datawaves_etl_airflow_spark.functions.abi_codec import (
    decode_abi,
    encode_abi,
)
from datawaves_etl_airflow_spark.schemas.abi import (
    AbiElement,
    AbiInput,
    Contract,
    abi_element_schema,
    solidity_to_spark_type,
)

SEAPORT_PATH = (
    "/root/reference/dags/resources/contracts/ethereum/seaport/Seaport.json"
)


def _el(abi: dict) -> AbiElement:
    return AbiElement.from_dict(abi)


class TestSignatures:
    def test_event_topic0(self):
        el = _el({
            "type": "event", "name": "Transfer",
            "inputs": [
                {"name": "from", "type": "address", "indexed": True},
                {"name": "to", "type": "address", "indexed": True},
                {"name": "value", "type": "uint256"},
            ],
        })
        assert el.signature() == "Transfer(address,address,uint256)"
        assert el.event_topic0() == (
            "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
        )

    def test_function_selector(self):
        el = _el({
            "type": "function", "name": "transfer",
            "inputs": [
                {"name": "to", "type": "address"},
                {"name": "value", "type": "uint256"},
            ],
            "outputs": [{"name": "", "type": "bool"}],
        })
        # public ERC-20 transfer sighash
        assert el.function_selector() == "0xa9059cbb"

    def test_tuple_canonicalization(self):
        el = _el({
            "type": "event", "name": "E",
            "inputs": [{
                "name": "item", "type": "tuple[]",
                "components": [
                    {"name": "a", "type": "uint"},
                    {"name": "b", "type": "address"},
                ],
            }],
        })
        assert el.signature() == "E((uint256,address)[])"


class TestSchemaCompiler:
    def test_scalar_mapping(self):
        assert isinstance(
            solidity_to_spark_type(AbiInput("x", "uint256")), DecimalType
        )
        assert isinstance(
            solidity_to_spark_type(AbiInput("x", "bool")), BooleanType
        )
        for t in ("address", "bytes", "bytes32", "string"):
            assert isinstance(
                solidity_to_spark_type(AbiInput("x", t)), StringType
            )

    def test_nested_tuple_array(self):
        inp = AbiInput(
            "offer", "tuple[]",
            components=(
                AbiInput("token", "address"),
                AbiInput("amount", "uint256"),
            ),
        )
        t = solidity_to_spark_type(inp)
        assert isinstance(t, ArrayType)
        assert isinstance(t.elementType, StructType)
        assert [f.name for f in t.elementType.fields] == ["token", "amount"]

    def test_event_schema_provenance(self):
        el = _el({
            "type": "event", "name": "E",
            "inputs": [{"name": "v", "type": "uint256"}],
        })
        names = [f.name for f in abi_element_schema(el).fields]
        assert names == [
            "v", "contract_address", "evt_tx_hash", "evt_index",
            "evt_block_time", "evt_block_number",
        ]


class TestCodecRoundTrip:
    def test_static_types(self):
        inputs = [
            AbiInput("a", "uint256"),
            AbiInput("b", "address"),
            AbiInput("c", "bool"),
            AbiInput("d", "bytes4"),
        ]
        vals = [123456789, "0x" + "ab" * 20, True, "0xdeadbeef"]
        assert decode_abi(inputs, encode_abi(inputs, vals)) == vals

    def test_dynamic_types(self):
        inputs = [
            AbiInput("s", "string"),
            AbiInput("b", "bytes"),
            AbiInput("arr", "uint256[]"),
        ]
        vals = ["héllo world", "0x0102030405", [1, 2, 3, 2**100]]
        assert decode_abi(inputs, encode_abi(inputs, vals)) == vals

    def test_nested_tuple_array(self):
        inputs = [
            AbiInput(
                "offer", "tuple[]",
                components=(
                    AbiInput("token", "address"),
                    AbiInput("amount", "uint256"),
                    AbiInput("ids", "uint256[]"),
                ),
            ),
            AbiInput("tail", "uint256"),
        ]
        vals = [
            [
                {"token": "0x" + "11" * 20, "amount": 5, "ids": [7, 8]},
                {"token": "0x" + "22" * 20, "amount": 9, "ids": []},
            ],
            42,
        ]
        assert decode_abi(inputs, encode_abi(inputs, vals)) == vals

    def test_fixed_length_array(self):
        inputs = [AbiInput("a", "uint256[3]"), AbiInput("b", "bool")]
        vals = [[1, 2, 3], False]
        assert decode_abi(inputs, encode_abi(inputs, vals)) == vals

    @settings(max_examples=50, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=0, max_value=2**255 - 1),
            min_size=1, max_size=5,
        ),
        s=st.text(max_size=40),
    )
    def test_property_uint_array_string(self, vals, s):
        inputs = [AbiInput("xs", "uint256[]"), AbiInput("s", "string")]
        out = decode_abi(inputs, encode_abi(inputs, [vals, s]))
        assert out[0] == vals
        assert out[1] == s

    def test_malformed_raises(self):
        from datawaves_etl_airflow_spark.functions.abi_codec import (
            AbiDecodeError,
        )

        with pytest.raises(AbiDecodeError):
            decode_abi([AbiInput("a", "uint256")], b"\x01")


@pytest.mark.skipif(
    not os.path.exists(SEAPORT_PATH), reason="reference ABI not present"
)
class TestSeaportAbi:
    """The hardest real ABI in the reference: OrderFulfilled with
    SpentItem[]/ReceivedItem[] nested tuple arrays."""

    def _contract(self) -> Contract:
        with open(SEAPORT_PATH) as f:
            return Contract.from_contract_dict(json.load(f))

    def test_order_fulfilled_compiles(self):
        c = self._contract()
        ev = next(e for e in c.events() if e.name == "OrderFulfilled")
        schema = abi_element_schema(ev)
        by_name = {f.name: f.dataType for f in schema.fields}
        assert isinstance(by_name["offer"], ArrayType)
        assert isinstance(by_name["offer"].elementType, StructType)
        assert isinstance(by_name["consideration"], ArrayType)

    def test_order_fulfilled_round_trip(self):
        c = self._contract()
        ev = next(e for e in c.events() if e.name == "OrderFulfilled")
        non_indexed = [i for i in ev.inputs if not i.indexed]
        # build a value per input type
        def mk(inp):
            t = inp.type
            if t == "tuple[]":
                return [
                    {
                        comp.name: mk(comp) for comp in inp.components
                    }
                ]
            if t.startswith("uint") or t.startswith("int"):
                return 7
            if t == "address":
                return "0x" + "ab" * 20
            if t.startswith("bytes32"):
                return "0x" + "cd" * 32
            if t == "bool":
                return True
            return "0x" + "ef" * 4
        vals = [mk(i) for i in non_indexed]
        assert decode_abi(non_indexed, encode_abi(non_indexed, vals)) == vals
