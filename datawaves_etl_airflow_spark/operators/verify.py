"""Data-quality verification operators (A-1, A-2, A-3, P-4, P-5).

The reference runs these as a scheduled DAG of SQL assertions with
``select if((subquery) > 0, 1, raise_error(...))``
(reference: dags/resources/verify/*.sql, wired at
dags/chains/blockchain.py:115-126, retries=0 — assertions, not
retryable work). Here they are library operators: each builds the same
aggregate-only plan (partition-pruned count, no data movement beyond the
final scalar) and raises ``VerificationError`` driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class VerificationError(AssertionError):
    """A verify check failed (maps the reference's raise_error abort)."""


def _partition_count(df: DataFrame, ds: str) -> int:
    # P-4: dt = ds filter → partition pruning on the warehouse layout
    # (reference: dags/resources/verify/blocks_have_latest.sql:5).
    return (
        df.filter(F.col("dt") == F.lit(ds).cast("date"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()[0]["cnt"]
    )


def verify_have_latest(df: DataFrame, ds: str, what: str = "rows") -> int:
    """A-1/A-3: today's partition must be non-empty.

    reference: dags/resources/verify/{blocks,transactions,logs,traces}
    _have_latest.sql — ``count(1) where dt=ds > 0`` else raise_error.
    Returns the count on success.
    """
    cnt = _partition_count(df, ds)
    if cnt <= 0:
        raise VerificationError(f"There are no latest {what}")
    return cnt


def verify_root_traces_match_transactions(
    traces: DataFrame, transactions: DataFrame, ds: str
) -> int:
    """A-2/P-5: #root traces == #transactions for the day.

    Root trace predicate: ``trace_address = '[]' AND transaction_hash IS
    NOT NULL`` (reference: dags/resources/verify/
    traces_null_address_equal_to_transaction_count.sql:1-13). Uses
    ``count(col)`` (null-skipping) vs ``count(*)`` exactly as the
    reference does.
    """
    dsd = F.lit(ds).cast("date")
    n_root = (
        traces.filter(
            (F.col("dt") == dsd)
            & (F.col("trace_address") == "[]")
            & F.col("transaction_hash").isNotNull()
        )
        .agg(F.count("transaction_hash").alias("cnt"))
        .collect()[0]["cnt"]
    )
    n_tx = (
        transactions.filter(F.col("dt") == dsd)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()[0]["cnt"]
    )
    if n_root != n_tx:
        raise VerificationError(
            "Total number of traces with null address is not equal to "
            f"transaction count ({n_root} != {n_tx})"
        )
    return n_tx
