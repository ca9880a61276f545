"""ABI data model and ABI → Spark StructType compiler.

Mirrors the reference's contract/ABI dataclasses
(reference: dags/chains/contracts.py:20-74) without the mashumaro
dependency, and adds what the reference delegates to its external decode
app: the mapping from Solidity ABI types to Spark types and per-element
output schemas for decoded tables
``{dataset}.{contract}_evt_{Event}`` / ``..._call_{Function}``
(naming: reference dags/chains/parser.py:114-117).

Type policy (SURVEY.md §1.2):
- ``uint256``/``int256`` (any uint/int width) → DecimalType(38,0) —
  the reference clamps 256-bit amounts to 38 digits everywhere.
- ``address`` / ``bytes`` / ``bytesN`` / ``string`` → StringType
  (0x-prefixed lowercase hex for address/bytes).
- ``bool`` → BooleanType.
- ``tuple`` → StructType over components; ``T[]``/``T[k]`` → ArrayType —
  the one place nested Spark types are mandatory (e.g. Seaport
  ``OrderFulfilled.offer: tuple[]``,
  reference dags/resources/contracts/ethereum/seaport/Seaport.json).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DecimalType,
    StringType,
    StructField,
    StructType,
)

from ..functions.keccak import keccak256_hex

_ARRAY_RE = re.compile(r"^(?P<base>.*)\[(?P<len>\d*)\]$")


@dataclass(frozen=True)
class AbiInput:
    """One input/output of an ABI event or function element."""

    name: str
    type: str
    indexed: bool = False
    components: tuple["AbiInput", ...] = ()

    @staticmethod
    def from_dict(d: dict) -> "AbiInput":
        return AbiInput(
            name=d.get("name") or "",
            type=d["type"],
            indexed=bool(d.get("indexed", False)),
            components=tuple(
                AbiInput.from_dict(c) for c in (d.get("components") or [])
            ),
        )

    def canonical_type(self) -> str:
        """Canonical type string used in signatures (tuples expanded)."""
        m = _ARRAY_RE.match(self.type)
        if m:
            inner = AbiInput(
                name=self.name, type=m.group("base"), components=self.components
            )
            return f"{inner.canonical_type()}[{m.group('len')}]"
        if self.type == "tuple":
            parts = ",".join(c.canonical_type() for c in self.components)
            return f"({parts})"
        # normalize aliases per ABI spec
        if self.type == "uint":
            return "uint256"
        if self.type == "int":
            return "int256"
        return self.type


@dataclass(frozen=True)
class AbiElement:
    """An ABI event or function (the reference keeps only these two,
    reference: dags/chains/contracts.py:63-67)."""

    name: str
    type: str  # 'event' | 'function'
    inputs: tuple[AbiInput, ...] = ()
    outputs: tuple[AbiInput, ...] = ()
    anonymous: bool = False

    @staticmethod
    def from_dict(d: dict) -> "AbiElement":
        return AbiElement(
            name=d.get("name") or "",
            type=d["type"],
            inputs=tuple(AbiInput.from_dict(i) for i in d.get("inputs") or []),
            outputs=tuple(AbiInput.from_dict(o) for o in d.get("outputs") or []),
            anonymous=bool(d.get("anonymous", False)),
        )

    def signature(self) -> str:
        args = ",".join(i.canonical_type() for i in self.inputs)
        return f"{self.name}({args})"

    def event_topic0(self) -> str:
        """0x-prefixed keccak256 of the event signature (D-1 predicate)."""
        if self.type != "event":
            raise ValueError(f"{self.name} is not an event")
        return "0x" + keccak256_hex(self.signature().encode())

    def function_selector(self) -> str:
        """0x-prefixed 4-byte sighash (D-2 predicate:
        ``selector = substr(input, 1, 10)``,
        reference evm_load_template.py:325)."""
        if self.type != "function":
            raise ValueError(f"{self.name} is not a function")
        return "0x" + keccak256_hex(self.signature().encode())[:8]


@dataclass
class Contract:
    """A contracts-registry entry (reference: dags/chains/contracts.py:13-17,
    JSON format under dags/resources/contracts/{chain}/{project}/)."""

    dataset_name: str = ""
    contract_name: str = ""
    contract_address: Optional[str] = None
    abi: list[AbiElement] = field(default_factory=list)

    @staticmethod
    def from_contract_dict(obj: dict) -> "Contract":
        # keep only event/function elements, like the reference
        # (dags/chains/contracts.py:63-67)
        abi = [
            AbiElement.from_dict(e)
            for e in obj.get("abi", [])
            if e.get("type") in ("event", "function")
        ]
        return Contract(
            dataset_name=obj.get("dataset_name") or "",
            contract_name=obj.get("contract_name") or "",
            contract_address=obj.get("contract_address"),
            abi=abi,
        )

    @staticmethod
    def from_json(text: str) -> "Contract":
        return Contract.from_contract_dict(json.loads(text))

    def events(self) -> list[AbiElement]:
        return [e for e in self.abi if e.type == "event"]

    def functions(self) -> list[AbiElement]:
        return [e for e in self.abi if e.type == "function"]

    def table_name(self, element: AbiElement) -> str:
        """Decoded table naming (reference dags/chains/parser.py:114-117)."""
        kind = "evt" if element.type == "event" else "call"
        return f"{self.dataset_name}.{self.contract_name}_{kind}_{element.name}"


def solidity_to_spark_type(inp: AbiInput) -> DataType:
    """Compile one ABI type to a Spark type per the policy above."""
    m = _ARRAY_RE.match(inp.type)
    if m:
        inner = AbiInput(name=inp.name, type=m.group("base"),
                         components=inp.components)
        return ArrayType(solidity_to_spark_type(inner), True)
    t = inp.type
    if t == "tuple":
        return StructType([
            StructField(c.name or f"_{i}", solidity_to_spark_type(c), True)
            for i, c in enumerate(inp.components)
        ])
    if t == "bool":
        return BooleanType()
    if re.fullmatch(r"u?int\d*", t):
        return DecimalType(38, 0)
    # address, bytes, bytesN, string, fixed/ufixed (rare) → string
    return StringType()


def abi_element_schema(element: AbiElement) -> StructType:
    """Output schema of the decoded table for one ABI element.

    Context columns mirror what downstream transfer consumers see:
    the decoded params plus provenance of the source log/trace row.
    """
    from pyspark.sql.types import LongType, TimestampType

    fields: list[StructField] = []
    if element.type == "event":
        for i, inp in enumerate(element.inputs):
            fields.append(StructField(inp.name or f"_{i}",
                                      solidity_to_spark_type(inp), True))
        fields += [
            StructField("contract_address", StringType(), True),
            StructField("evt_tx_hash", StringType(), True),
            StructField("evt_index", LongType(), True),
            StructField("evt_block_time", TimestampType(), True),
            StructField("evt_block_number", LongType(), True),
        ]
    else:
        for i, inp in enumerate(element.inputs):
            fields.append(StructField(inp.name or f"_{i}",
                                      solidity_to_spark_type(inp), True))
        for i, out in enumerate(element.outputs):
            fields.append(StructField(out.name or f"output_{i}",
                                      solidity_to_spark_type(out), True))
        fields += [
            StructField("contract_address", StringType(), True),
            StructField("call_success", BooleanType(), True),
            StructField("call_tx_hash", StringType(), True),
            StructField("call_trace_address", StringType(), True),
            StructField("call_block_time", TimestampType(), True),
            StructField("call_block_number", LongType(), True),
        ]
    return StructType(fields)
