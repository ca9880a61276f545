"""Deterministic blockchain-domain staging fixtures (FIXTURES.md §B).

Writes one synthetic day (2024-01-15) of every staging table in the
reference's export layout —
``export/{chain}/{table}/block_date={ds}/{table}.{fmt}``
(reference: dags/chains/loader.py:161-165) — as line-delimited JSON
(CSV for prices), plus a small parquet "warehouse tokens" table for the
J-6 anti-join. Pure Python + pyarrow; no Spark needed, so the DuckDB
oracle side can read the very same files.

Respects every referential constraint in FIXTURES.md:
1:1 receipts, block_number FK everywhere, root-trace count ==
transaction count, monotone block timestamps inside the day, valid
ERC-20 Transfer logs (real keccak topic0), tokens overlapping the
warehouse, topics in all three normalizer shapes.
"""

from __future__ import annotations

import csv
import hashlib
import json
import os
import random

from ..functions.keccak import keccak256_hex

FIXTURE_VERSION = "3"
DS = "2024-01-15"
CHAIN = "ethereum"
DAY_T0 = 1705276800  # 2024-01-15 00:00:00 UTC

N_BLOCKS = 20
N_TX = 200
N_EXTRA_LOGS = 200
N_TRANSFER_LOGS = 100
N_TOKEN_TRANSFERS = 100
N_CONTRACTS = 30

TRANSFER_SIG = "Transfer(address,address,uint256)"
TRANSFER_TOPIC0 = "0x" + keccak256_hex(TRANSFER_SIG.encode())
TRANSFER_FN_SELECTOR = "0x" + keccak256_hex(b"transfer(address,uint256)")[:8]

# Public ERC interface selectors (from the ERC-20/721 standards).
ERC20_SELECTORS = [
    "18160ddd", "70a08231", "a9059cbb", "23b872dd", "095ea7b3", "dd62ed3e",
]
ERC721_SELECTORS = ["70a08231", "6352211e", "095ea7b3", "23b872dd"]


def _h(seed: str, n: int = 64) -> str:
    """Deterministic lowercase hex string of length n."""
    out = ""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()
        i += 1
    return out[:n]


def _addr(seed: str) -> str:
    return "0x" + _h(seed, 40)


def _word_addr(addr: str) -> str:
    return "0x" + "0" * 24 + addr[2:]


def _word_int(v: int) -> str:
    return "0x" + format(v, "064x")


def fixture_base() -> str:
    return os.environ.get(
        "SPARK_GRAFT_FIXTURES", "/root/repo/.fixtures"
    )


def export_file(table: str, fmt: str = "json") -> str:
    return os.path.join(
        fixture_base(), "export", CHAIN, table,
        f"block_date={DS}", f"{table}.{fmt}",
    )


def warehouse_tokens_path() -> str:
    return os.path.join(fixture_base(), "warehouse", "tokens")


def prices_raw_path() -> str:
    return os.path.join(fixture_base(), "raw", "prices_5min.csv")


def _write_jsonl(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, separators=(",", ":")) + "\n")


def ensure_fixtures() -> str:
    """Idempotently materialize the fixture day; returns the base dir."""
    base = fixture_base()
    marker = os.path.join(base, f".complete-v{FIXTURE_VERSION}")
    if os.path.exists(marker):
        return base
    rng = random.Random(42)

    addr_pool = [_addr(f"acct{i}") for i in range(30)]
    token_pool = [_addr(f"token{i}") for i in range(5)]

    # ---- blocks --------------------------------------------------------
    blocks = []
    for i in range(N_BLOCKS):
        n = 1000 + i
        blocks.append({
            "number": n,
            "hash": "0x" + _h(f"block{n}"),
            "parent_hash": "0x" + _h(f"block{n-1}"),
            "nonce": "0x" + _h(f"nonce{n}", 16),
            "sha3_uncles": "0x" + _h("uncles", 64),
            "logs_bloom": "0x" + _h(f"bloom{n}", 64),
            "transactions_root": "0x" + _h(f"txroot{n}"),
            "state_root": "0x" + _h(f"stroot{n}"),
            "receipts_root": "0x" + _h(f"rcroot{n}"),
            "miner": addr_pool[i % len(addr_pool)],
            "difficulty": rng.randrange(10**12, 10**13),
            "total_difficulty": rng.randrange(10**15, 10**16),
            "size": rng.randrange(20_000, 90_000),
            "extra_data": "0x" + _h(f"extra{n}", 20),
            "gas_limit": 30_000_000,
            "gas_used": rng.randrange(1_000_000, 29_000_000),
            "timestamp": DAY_T0 + i * 720,
            "transaction_count": 0,  # fixed up below
            "base_fee_per_gas": rng.randrange(10**9, 10**10),
        })
    block_numbers = [b["number"] for b in blocks]

    # ---- transactions + receipts (1:1) ---------------------------------
    txs, receipts = [], []
    per_block_index: dict[int, int] = {}
    for i in range(N_TX):
        bn = rng.choice(block_numbers)
        idx = per_block_index.get(bn, 0)
        per_block_index[bn] = idx + 1
        h = "0x" + _h(f"tx{i}")
        to = rng.choice(addr_pool)
        is_call = i % 3 == 0
        inp = (
            TRANSFER_FN_SELECTOR
            + _word_addr(rng.choice(addr_pool))[2:]
            + _word_int(rng.randrange(1, 10**15))[2:]
            if is_call else "0x"
        )
        txs.append({
            "hash": h,
            "nonce": rng.randrange(0, 1000),
            "block_hash": "0x" + _h(f"block{bn}"),
            "block_number": bn,
            "transaction_index": idx,
            "from_address": rng.choice(addr_pool),
            "to_address": to,
            "value": rng.randrange(0, 10**15),
            "gas": rng.randrange(21_000, 500_000),
            "gas_price": rng.randrange(10**9, 10**11),
            "input": inp,
            "max_fee_per_gas": rng.randrange(10**9, 10**11),
            "max_priority_fee_per_gas": rng.randrange(10**8, 10**9),
            "transaction_type": rng.choice([0, 2]),
        })
        receipts.append({
            "transaction_hash": h,
            "transaction_index": idx,
            "block_hash": "0x" + _h(f"block{bn}"),
            "block_number": bn,
            "cumulative_gas_used": rng.randrange(21_000, 10**7),
            "gas_used": rng.randrange(21_000, 500_000),
            "contract_address": None,
            "root": None,
            "status": 1 if i % 17 else 0,
            "effective_gas_price": rng.randrange(10**9, 10**11),
        })
    for b in blocks:
        b["transaction_count"] = per_block_index.get(b["number"], 0)

    # ---- logs (three topics shapes; 100 valid ERC-20 Transfers) --------
    logs = []
    per_block_log_index: dict[int, int] = {}

    def _next_log_index(bn: int) -> int:
        v = per_block_log_index.get(bn, 0)
        per_block_log_index[bn] = v + 1
        return v

    for i in range(N_TRANSFER_LOGS):
        tx = rng.choice(txs)
        bn = tx["block_number"]
        topics = [
            TRANSFER_TOPIC0,
            _word_addr(rng.choice(addr_pool)),
            _word_addr(rng.choice(addr_pool)),
        ]
        # alternate between the two multi-topic wire shapes
        topics_str = (
            json.dumps(topics) if i % 2 == 0 else ",".join(topics)
        )
        logs.append({
            "log_index": _next_log_index(bn),
            "transaction_hash": tx["hash"],
            "transaction_index": tx["transaction_index"],
            "block_hash": tx["block_hash"],
            "block_number": bn,
            "address": rng.choice(token_pool),
            "data": _word_int(rng.randrange(1, 10**15)),
            "topics": topics_str,
        })
    for i in range(N_EXTRA_LOGS):
        tx = rng.choice(txs)
        bn = tx["block_number"]
        n_topics = rng.choice([1, 1, 2, 3])
        topics = ["0x" + _h(f"evt{i}t{j}") for j in range(n_topics)]
        if n_topics == 1:
            topics_str = topics[0]  # bare single-value shape
        elif i % 2 == 0:
            topics_str = json.dumps(topics)
        else:
            topics_str = ",".join(topics)
        logs.append({
            "log_index": _next_log_index(bn),
            "transaction_hash": tx["hash"],
            "transaction_index": tx["transaction_index"],
            "block_hash": tx["block_hash"],
            "block_number": bn,
            "address": rng.choice(addr_pool),
            "data": "0x" + _h(f"data{i}", 2 * rng.randrange(1, 6) * 32),
            "topics": topics_str,
        })

    # ---- traces (one root per tx; calls, subcalls, creates) ------------
    traces = []
    for i, tx in enumerate(txs):  # root call traces: invariant #4
        is_call = i % 3 == 0
        traces.append({
            "block_number": tx["block_number"],
            "transaction_hash": tx["hash"],
            "transaction_index": tx["transaction_index"],
            "from_address": tx["from_address"],
            "to_address": tx["to_address"],
            "value": tx["value"],
            "input": tx["input"],
            "output": _word_int(1) if is_call else "0x",
            "trace_type": "call",
            "call_type": "call",
            "reward_type": None,
            "gas": tx["gas"],
            "gas_used": rng.randrange(21_000, 400_000),
            "subtraces": rng.randrange(0, 3),
            "trace_address": "[]",
            "error": None,
            "status": 1 if i % 13 else 0,
            "trace_id": f"call_{tx['hash']}_[]",
        })
    for i in range(80):  # sub-call traces
        tx = rng.choice(txs)
        traces.append({
            "block_number": tx["block_number"],
            "transaction_hash": tx["hash"],
            "transaction_index": tx["transaction_index"],
            "from_address": tx["to_address"],
            "to_address": rng.choice(addr_pool),
            "value": rng.randrange(0, 10**12),
            "input": (
                TRANSFER_FN_SELECTOR
                + _word_addr(rng.choice(addr_pool))[2:]
                + _word_int(rng.randrange(1, 10**15))[2:]
                if i % 2 == 0 else "0x" + _h(f"subin{i}", 8)
            ),
            "output": _word_int(i % 3 == 0) if i % 2 == 0 else "0x",
            "trace_type": "call",
            "call_type": rng.choice(["call", "staticcall", "delegatecall"]),
            "reward_type": None,
            "gas": rng.randrange(21_000, 200_000),
            "gas_used": rng.randrange(5_000, 100_000),
            "subtraces": 0,
            "trace_address": f"[{i % 4}]",
            "error": None,
            "status": 1,
            "trace_id": f"call_{tx['hash']}_[{i % 4}]",
        })
    created_contracts = []
    for i in range(20):  # create traces with planted PUSH4 sighashes
        tx = rng.choice(txs)
        new_addr = _addr(f"created{i}")
        if i % 3 == 0:
            sels = list(ERC20_SELECTORS)
        elif i % 3 == 1:
            sels = list(ERC721_SELECTORS)
        else:
            sels = [_h(f"sel{i}{j}", 8) for j in range(3)]
        body = "".join(f"63{s}14" for s in sels)  # PUSH4 <sel> EQ
        bytecode = "0x6080" + body + _h(f"code{i}", 40)
        created_contracts.append((new_addr, bytecode, sels, tx))
        traces.append({
            "block_number": tx["block_number"],
            "transaction_hash": tx["hash"],
            "transaction_index": tx["transaction_index"],
            "from_address": tx["from_address"],
            "to_address": new_addr,
            "value": 0,
            "input": "0x" + _h(f"initcode{i}", 64),
            "output": bytecode,
            "trace_type": "create",
            "call_type": None,
            "reward_type": None,
            "gas": rng.randrange(100_000, 2_000_000),
            "gas_used": rng.randrange(100_000, 1_500_000),
            "subtraces": 0,
            "trace_address": f"[{i % 3 + 4}]",
            "error": None,
            "status": 1,
            "trace_id": f"create_{tx['hash']}_[{i % 3 + 4}]",
        })

    geth_traces = [dict(t, transaction_hash=None) for t in traces]

    # ---- contracts ------------------------------------------------------
    contracts = []
    for i in range(N_CONTRACTS):
        if i < len(created_contracts):
            addr, bytecode, sels, _tx = created_contracts[i]
        else:
            addr = _addr(f"contract{i}")
            sels = [_h(f"csel{i}{j}", 8) for j in range(2)]
            bytecode = "0x6080" + "".join(f"63{s}14" for s in sels)
        contracts.append({
            "address": addr,
            "bytecode": bytecode,
            "function_sighashes": ",".join("0x" + s for s in sorted(set(sels))),
            "is_erc20": set(ERC20_SELECTORS) <= set(sels),
            "is_erc721": set(ERC721_SELECTORS) <= set(sels),
            "block_number": rng.choice(block_numbers),
        })

    # ---- token transfers ------------------------------------------------
    token_transfers = []
    for i in range(N_TOKEN_TRANSFERS):
        tx = rng.choice(txs)
        token_transfers.append({
            "token_address": rng.choice(token_pool),
            "from_address": rng.choice(addr_pool),
            "to_address": rng.choice(addr_pool),
            "value": rng.randrange(1, 10**15),
            "transaction_hash": tx["hash"],
            "log_index": rng.randrange(0, 50),
            "block_number": tx["block_number"],
        })

    # ---- tokens: staged day overlaps the warehouse (J-6) ----------------
    staged_tokens = []
    for i in range(15):
        staged_tokens.append({
            "address": _addr(f"tokenrow{i}"),
            "symbol": f"TK{i}",
            "name": f"Token {i}",
            "decimals": "18",
            "total_supply": str(10**21 + i),
            "block_number": rng.choice(block_numbers),
        })
    warehouse_tokens = [
        dict(staged_tokens[i], symbol=f"OLD{i}") for i in range(5, 10)
    ] + [
        {
            "address": _addr(f"oldtoken{i}"),
            "symbol": f"OT{i}",
            "name": f"Old Token {i}",
            "decimals": "6",
            "total_supply": str(10**12 + i),
            "block_number": 900 + i,
        }
        for i in range(5)
    ]

    # ---- prices: raw 5-minute ticks + filled 1-minute staging CSV -------
    symbols = [("WETH", token_pool[0], 18), ("USDC", token_pool[1], 6),
               ("DAI", token_pool[2], 18)]
    raw_rows, filled_rows = [], []
    for sym, caddr, dec in symbols:
        for k in range(36):  # 3 hours of 5-minute ticks
            minute = DAY_T0 + k * 300
            price = round(
                100.0 + 10.0 * rng.random() + (0.001 if sym == "USDC" else 0), 6
            )
            ts = _iso_minute(minute)
            raw_rows.append([ts, price, dec, caddr, sym, DS])
            for off in range(5):
                filled_rows.append(
                    [_iso_minute(minute + off * 60), price, dec, caddr, sym, DS]
                )

    # ---- write everything ----------------------------------------------
    _write_jsonl(export_file("blocks"), blocks)
    _write_jsonl(export_file("transactions"), txs)
    _write_jsonl(export_file("receipts"), receipts)
    _write_jsonl(export_file("logs"), logs)
    _write_jsonl(export_file("traces"), traces)
    _write_jsonl(export_file("geth_traces"), geth_traces)
    _write_jsonl(export_file("contracts"), contracts)
    _write_jsonl(export_file("token_transfers"), token_transfers)
    _write_jsonl(export_file("tokens"), staged_tokens)

    header = ["minute", "price", "decimals", "contract_address", "symbol", "dt"]
    for path, rows in [
        (export_file("prices", "csv"), filled_rows),
        (prices_raw_path(), raw_rows),
    ]:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows)

    _write_warehouse_tokens(warehouse_tokens)

    with open(marker, "w") as f:
        f.write(FIXTURE_VERSION)
    return base


def _iso_minute(epoch_s: int) -> str:
    import datetime as dt

    return dt.datetime.fromtimestamp(epoch_s, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _write_warehouse_tokens(rows: list[dict]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = warehouse_tokens_path()
    os.makedirs(path, exist_ok=True)
    cols = ["address", "symbol", "name", "decimals", "total_supply",
            "block_number"]
    table = pa.table({c: [r[c] for r in rows] for c in cols})
    pq.write_table(table, os.path.join(path, "part-000.parquet"))
