"""Explicit StructType schemas for the nine raw staging tables.

Transcribed from the reference staging DDL
(reference: dags/templates/evm_load_template.py:4-149). The schema system
is fixed/explicit — every staging read declares its full schema; nothing
is ever inferred (schema inference at 100 TB means an extra full scan).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _fields(pairs: list[tuple[str, DataType]]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in pairs])


# 256-bit wei amounts clamped to 38 digits, as the reference does
# (evm_load_template.py:17-18,89,116,142).
WEI = DecimalType(38, 0)

# reference: dags/templates/evm_load_template.py:4-26
BLOCKS = _fields([
    ("number", LongType()),
    ("hash", StringType()),
    ("parent_hash", StringType()),
    ("nonce", StringType()),
    ("sha3_uncles", StringType()),
    ("logs_bloom", StringType()),
    ("transactions_root", StringType()),
    ("state_root", StringType()),
    ("receipts_root", StringType()),
    ("miner", StringType()),
    ("difficulty", WEI),
    ("total_difficulty", WEI),
    ("size", LongType()),
    ("extra_data", StringType()),
    ("gas_limit", LongType()),
    ("gas_used", LongType()),
    ("timestamp", LongType()),
    ("transaction_count", LongType()),
    ("base_fee_per_gas", LongType()),
])

# reference: dags/templates/evm_load_template.py:132-149
TRANSACTIONS = _fields([
    ("hash", StringType()),
    ("nonce", LongType()),
    ("block_hash", StringType()),
    ("block_number", LongType()),
    ("transaction_index", LongType()),
    ("from_address", StringType()),
    ("to_address", StringType()),
    ("value", WEI),
    ("gas", LongType()),
    ("gas_price", LongType()),
    ("input", StringType()),
    ("max_fee_per_gas", LongType()),
    ("max_priority_fee_per_gas", LongType()),
    ("transaction_type", LongType()),
])

# reference: dags/templates/evm_load_template.py:67-80
RECEIPTS = _fields([
    ("transaction_hash", StringType()),
    ("transaction_index", LongType()),
    ("block_hash", StringType()),
    ("block_number", LongType()),
    ("cumulative_gas_used", LongType()),
    ("gas_used", LongType()),
    ("contract_address", StringType()),
    ("root", StringType()),
    ("status", LongType()),
    ("effective_gas_price", LongType()),
])

# reference: dags/templates/evm_load_template.py:41-52
LOGS = _fields([
    ("log_index", LongType()),
    ("transaction_hash", StringType()),
    ("transaction_index", LongType()),
    ("block_hash", StringType()),
    ("block_number", LongType()),
    ("address", StringType()),
    ("data", StringType()),
    ("topics", StringType()),
])

# reference: dags/templates/evm_load_template.py:108-129
# (geth_traces shares this schema with transaction_hash null)
TRACES = _fields([
    ("block_number", LongType()),
    ("transaction_hash", StringType()),
    ("transaction_index", LongType()),
    ("from_address", StringType()),
    ("to_address", StringType()),
    ("value", WEI),
    ("input", StringType()),
    ("output", StringType()),
    ("trace_type", StringType()),
    ("call_type", StringType()),
    ("reward_type", StringType()),
    ("gas", LongType()),
    ("gas_used", LongType()),
    ("subtraces", LongType()),
    ("trace_address", StringType()),
    ("error", StringType()),
    ("status", LongType()),
    ("trace_id", StringType()),
])

# reference: dags/templates/evm_load_template.py:29-38
CONTRACTS = _fields([
    ("address", StringType()),
    ("bytecode", StringType()),
    ("function_sighashes", StringType()),
    ("is_erc20", BooleanType()),
    ("is_erc721", BooleanType()),
    ("block_number", LongType()),
])

# reference: dags/templates/evm_load_template.py:83-93
TOKEN_TRANSFERS = _fields([
    ("token_address", StringType()),
    ("from_address", StringType()),
    ("to_address", StringType()),
    ("value", WEI),
    ("transaction_hash", StringType()),
    ("log_index", LongType()),
    ("block_number", LongType()),
])

# reference: dags/templates/evm_load_template.py:96-105
# decimals/total_supply deliberately STRING: uint256 can overflow any
# numeric type the exporter emits (dags/chains/exporters/python.py:187).
TOKENS = _fields([
    ("address", StringType()),
    ("symbol", StringType()),
    ("name", StringType()),
    ("decimals", StringType()),
    ("total_supply", StringType()),
    ("block_number", LongType()),
])

# reference: dags/templates/evm_load_template.py:55-64 (CSV with header)
PRICES = _fields([
    ("minute", TimestampType()),
    ("price", DoubleType()),
    ("decimals", LongType()),
    ("contract_address", StringType()),
    ("symbol", StringType()),
    ("dt", DateType()),
])

STAGING_SCHEMAS: dict[str, StructType] = {
    "blocks": BLOCKS,
    "transactions": TRANSACTIONS,
    "receipts": RECEIPTS,
    "logs": LOGS,
    "traces": TRACES,
    "geth_traces": TRACES,
    "contracts": CONTRACTS,
    "token_transfers": TOKEN_TRANSFERS,
    "tokens": TOKENS,
    "prices": PRICES,
}

#: File format per staging table (prices is the only CSV loader,
#: reference: dags/chains/evm_chain.py:189).
STAGING_FORMATS: dict[str, str] = {name: "json" for name in STAGING_SCHEMAS}
STAGING_FORMATS["prices"] = "csv"


def staging_schema(table: str) -> StructType:
    try:
        return STAGING_SCHEMAS[table]
    except KeyError:
        raise KeyError(
            f"unknown staging table {table!r}; expected one of "
            f"{sorted(STAGING_SCHEMAS)}"
        ) from None
