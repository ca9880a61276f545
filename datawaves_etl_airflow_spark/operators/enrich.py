"""The enrich operator family: staging DataFrames → warehouse DataFrames.

Each function is a pure transformation (DataFrames in → DataFrame out);
sinks live in ``operators.sinks``. Semantics transcribed 1:1 from the
reference SQL templates (citations per function), re-expressed with the
DataFrame API so Catalyst sees a single declarative plan per day.

Scale notes that apply to every function here:

- The per-day ``blocks`` table (~7k rows/day) joins against every big
  table (J-1..J-5, J-7). We broadcast it explicitly — at 100 TB the
  fact sides shuffle nothing for these joins.
- The reference appends ``/*+ REPARTITION(1) */`` to every enrich
  select (evm_load_template.py:155 etc.) to avoid small files at daily
  volumes. That serializes the write at scale, so the engine leaves
  output sizing to AQE (advisoryPartitionSizeInBytes) and the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.evm import (
    block_time,
    hash_bucket,
    topics_arr,
    trace_selector,
    unhex_0x,
)


def _blocks_dim(blocks: DataFrame) -> DataFrame:
    """The slim per-day blocks dimension every enrich join needs."""
    return F.broadcast(
        blocks.select(
            F.col("number"),
            F.col("hash").alias("block_hash_dim"),
            F.col("timestamp").alias("block_ts_dim"),
        )
    )


def enrich_blocks(blocks: DataFrame) -> DataFrame:
    """P-1: reorder/rename + TIMESTAMP_SECONDS cast.

    reference: dags/templates/evm_load_template.py:150-175.
    """
    return blocks.select(
        block_time(F.col("timestamp")).alias("timestamp"),
        "number",
        "hash",
        "parent_hash",
        "nonce",
        "sha3_uncles",
        "logs_bloom",
        "transactions_root",
        "state_root",
        "receipts_root",
        "miner",
        "difficulty",
        "total_difficulty",
        "size",
        "extra_data",
        "gas_limit",
        "gas_used",
        "transaction_count",
        "base_fee_per_gas",
    )


def enrich_transactions(
    transactions: DataFrame, blocks: DataFrame, receipts: DataFrame
) -> DataFrame:
    """J-1: blocks ⋈ transactions ⋈ receipts (inner equi-joins).

    reference: dags/templates/evm_load_template.py:381-415. The blocks
    side is broadcast (small per-day dimension); the tx ⋈ receipts join
    is 1:1 on transaction hash — at scale both sides arrive partitioned
    by hash from the exporter, and AQE picks shuffle strategy.
    """
    b = _blocks_dim(blocks)
    return (
        transactions.alias("t")
        .join(b, F.col("t.block_number") == b["number"], "inner")
        .join(
            receipts.alias("r"),
            F.col("t.hash") == F.col("r.transaction_hash"),
            "inner",
        )
        .select(
            F.col("t.hash").alias("hash"),
            F.col("t.nonce").alias("nonce"),
            F.col("t.transaction_index").alias("transaction_index"),
            F.col("t.from_address").alias("from_address"),
            F.col("t.to_address").alias("to_address"),
            F.col("t.value").alias("value"),
            F.col("t.gas").alias("gas"),
            F.col("t.gas_price").alias("gas_price"),
            F.col("t.input").alias("input"),
            F.col("r.cumulative_gas_used").alias("receipt_cumulative_gas_used"),
            F.col("r.gas_used").alias("receipt_gas_used"),
            F.col("r.contract_address").alias("receipt_contract_address"),
            F.col("r.root").alias("receipt_root"),
            F.col("r.status").alias("receipt_status"),
            block_time(F.col("block_ts_dim")).alias("block_timestamp"),
            F.col("number").alias("block_number"),
            F.col("block_hash_dim").alias("block_hash"),
            F.col("t.max_fee_per_gas").alias("max_fee_per_gas"),
            F.col("t.max_priority_fee_per_gas").alias("max_priority_fee_per_gas"),
            F.col("t.transaction_type").alias("transaction_type"),
            F.col("r.effective_gas_price").alias("receipt_effective_gas_price"),
        )
    )


def enrich_logs(logs: DataFrame, blocks: DataFrame) -> DataFrame:
    """J-2 + P-2: blocks ⋈ logs, topics normalization, hash buckets.

    reference: dags/templates/evm_load_template.py:197-243. Output keeps
    the decode-pruning layout columns ``address_hash``/``selector_hash``
    so the partitioned sink can prune decode scans to 1/100th of the
    data (SURVEY.md §4).
    """
    b = _blocks_dim(blocks)
    arr = topics_arr(F.col("topics"))
    inner = (
        b.join(logs.alias("l"), b["number"] == F.col("l.block_number"), "inner")
        .select(
            F.col("l.log_index").alias("log_index"),
            F.col("l.transaction_hash").alias("transaction_hash"),
            F.col("l.transaction_index").alias("transaction_index"),
            F.col("l.address").alias("address"),
            F.col("l.data").alias("data"),
            F.col("l.topics").alias("topics"),
            block_time(F.col("block_ts_dim")).alias("block_timestamp"),
            F.col("number").alias("block_number"),
            F.col("block_hash_dim").alias("block_hash"),
            hash_bucket(F.col("l.address")).alias("address_hash"),
            arr.alias("topics_arr"),
            unhex_0x(F.col("l.data")).alias("unhex_data"),
        )
    )
    return inner.select(
        "log_index",
        "transaction_hash",
        "transaction_index",
        "address",
        "data",
        "topics",
        "block_timestamp",
        "block_number",
        "block_hash",
        "topics_arr",
        "unhex_data",
        F.col("topics_arr")[0].alias("selector"),
        "address_hash",
        hash_bucket(F.col("topics_arr")[0]).alias("selector_hash"),
    )


_TRACE_PASSTHROUGH = [
    "transaction_index", "from_address", "to_address", "value", "input",
    "output", "trace_type", "call_type", "reward_type", "gas", "gas_used",
    "subtraces", "trace_address", "error", "status", "trace_id",
]


def _trace_projection(joined: DataFrame, tx_hash_col: str) -> DataFrame:
    cols = [F.col(tx_hash_col).alias("transaction_hash")]
    cols += [F.col(f"tr.{c}").alias(c) for c in _TRACE_PASSTHROUGH]
    cols += [
        block_time(F.col("block_ts_dim")).alias("block_timestamp"),
        F.col("number").alias("block_number"),
        F.col("block_hash_dim").alias("block_hash"),
        trace_selector(F.col("tr.input")).alias("selector"),
        unhex_0x(F.col("tr.input")).alias("unhex_input"),
        unhex_0x(F.col("tr.output")).alias("unhex_output"),
        hash_bucket(F.col("tr.to_address")).alias("address_hash"),
        hash_bucket(trace_selector(F.col("tr.input"))).alias("selector_hash"),
    ]
    return joined.select(*cols)


def enrich_traces(traces: DataFrame, blocks: DataFrame) -> DataFrame:
    """J-4 + P-3: blocks ⋈ traces with selector/unhex/bucket derivations.

    reference: dags/templates/evm_load_template.py:299-336.
    """
    b = _blocks_dim(blocks)
    joined = b.join(
        traces.alias("tr"), b["number"] == F.col("tr.block_number"), "inner"
    )
    return _trace_projection(joined, "tr.transaction_hash")


def enrich_geth_traces(
    geth_traces: DataFrame, blocks: DataFrame, transactions: DataFrame
) -> DataFrame:
    """J-5: 3-way join recovering transaction_hash absent from geth
    traces via the composite key (transaction_index, block_number).

    reference: dags/templates/evm_load_template.py:338-379 (the one
    composite-key join in the reference; polygon only).
    """
    b = _blocks_dim(blocks)
    tx = transactions.select(
        F.col("hash").alias("tx_hash_dim"),
        F.col("transaction_index").alias("tx_index_dim"),
        F.col("block_number").alias("tx_block_dim"),
    )
    joined = (
        b.join(
            geth_traces.alias("tr"),
            b["number"] == F.col("tr.block_number"),
            "inner",
        )
        .join(
            tx,
            (F.col("tr.transaction_index") == tx["tx_index_dim"])
            & (F.col("tr.block_number") == tx["tx_block_dim"]),
            "inner",
        )
    )
    return _trace_projection(joined, "tx_hash_dim")


def enrich_contracts(contracts: DataFrame, blocks: DataFrame) -> DataFrame:
    """J-7: contracts ⋈ blocks.

    reference: dags/templates/evm_load_template.py:178-195.
    """
    b = _blocks_dim(blocks)
    return (
        contracts.alias("c")
        .join(b, F.col("c.block_number") == b["number"], "inner")
        .select(
            F.col("c.address").alias("address"),
            F.col("c.bytecode").alias("bytecode"),
            F.col("c.function_sighashes").alias("function_sighashes"),
            F.col("c.is_erc20").alias("is_erc20"),
            F.col("c.is_erc721").alias("is_erc721"),
            block_time(F.col("block_ts_dim")).alias("block_timestamp"),
            F.col("number").alias("block_number"),
            F.col("block_hash_dim").alias("block_hash"),
        )
    )


def enrich_token_transfers(
    token_transfers: DataFrame, blocks: DataFrame
) -> DataFrame:
    """J-3: blocks ⋈ token_transfers.

    reference: dags/templates/evm_load_template.py:255-276.
    """
    b = _blocks_dim(blocks)
    return (
        token_transfers.alias("tt")
        .join(b, F.col("tt.block_number") == b["number"], "inner")
        .select(
            F.col("tt.token_address").alias("token_address"),
            F.col("tt.from_address").alias("from_address"),
            F.col("tt.to_address").alias("to_address"),
            F.col("tt.value").alias("value"),
            F.col("tt.transaction_hash").alias("transaction_hash"),
            F.col("tt.log_index").alias("log_index"),
            block_time(F.col("block_ts_dim")).alias("block_timestamp"),
            F.col("number").alias("block_number"),
            F.col("block_hash_dim").alias("block_hash"),
        )
    )


def new_tokens(staged_tokens: DataFrame, existing_tokens: DataFrame) -> DataFrame:
    """J-6 / S-4: staged tokens whose address is not yet in the warehouse.

    The reference writes this as
    ``WHERE address IN (SELECT address FROM staged EXCEPT SELECT address
    FROM warehouse)`` (evm_load_template.py:281-297). A left-anti join is
    the identical relation with one fewer shuffle; with the warehouse
    side projected to one column it broadcasts when small, and AQE
    handles it when it is not.
    """
    existing = existing_tokens.select("address").distinct()
    return (
        staged_tokens.join(existing, "address", "left_anti")
        .select("address", "symbol", "name", "decimals", "total_supply")
    )


def anti_join_prefiltered(
    staged: DataFrame, warehouse: DataFrame, key: str
) -> DataFrame:
    """Warehouse-scale left-anti join: staged rows whose ``key`` is
    absent from the (much larger) warehouse side — the scale path for
    `new_tokens` (SCALE.md watch item: the plain anti-join shuffles
    the warehouse).

    A warehouse row is only relevant to the anti-join if its key
    occurs in the staged batch, so the warehouse is first reduced by a
    BROADCAST semi-join on the staged key set (the exact-set analog of
    a Bloom pre-filter — Spark 4 does not expose bloom_filter_agg to
    SQL), leaving at most |staged| warehouse rows; the anti-join right
    side is then broadcastable too. The warehouse is scanned but NEVER
    shuffled, at any corpus size; a daily staged batch always fits the
    broadcast.
    """
    staged_keys = F.broadcast(staged.select(key).distinct())
    # .distinct() bounds the broadcast by |staged| KEYS: a warehouse
    # with many rows per key would otherwise broadcast every matching
    # row and can blow the broadcast threshold at scale
    relevant = (
        warehouse.select(key).join(staged_keys, key, "left_semi").distinct()
    )
    return staged.join(F.broadcast(relevant), key, "left_anti")


def anti_join_bucket_pruned(
    staged: DataFrame, warehouse_path: str, key: str, n_buckets: int = 64
) -> DataFrame:
    """`anti_join_prefiltered` over a `write_key_bucketed` warehouse
    layout: prunes the warehouse SCAN, not just the shuffle.

    The staged batch's bucket ids (≤ ``n_buckets`` integers — bounded
    driver state regardless of corpus size) select which
    ``key_bucket=`` partition directories are read at all; matching
    keys cannot live elsewhere because the layout co-locates each key
    in exactly one bucket. A small daily batch therefore scans
    ``min(|staged keys|, n_buckets) / n_buckets`` of the warehouse
    bytes, and the surviving rows follow the broadcast-semi
    `anti_join_prefiltered` path (warehouse never shuffles).
    """
    spark = staged.sparkSession
    buckets = [
        r["b"]
        for r in staged.select(
            F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).alias("b")
        )
        .distinct()
        .collect()
    ]
    warehouse = (
        spark.read.parquet(warehouse_path)
        .filter(F.col("key_bucket").isin(buckets))
        .drop("key_bucket")
    )
    return anti_join_prefiltered(staged, warehouse, key)


def enrich_prices(prices: DataFrame) -> DataFrame:
    """Prices passthrough projection (drops the staging ``dt``).

    reference: dags/templates/evm_load_template.py:245-260.
    """
    return prices.select("minute", "price", "decimals", "contract_address", "symbol")
