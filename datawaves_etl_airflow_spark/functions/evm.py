"""Column-expression helpers for the EVM enrich family.

Each helper returns a Spark Column built only from JVM-side builtins
(whole-stage-codegen friendly; no Python in the hot path). Semantics are
transcribed from the reference SQL templates — citations inline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

#: Number of hash buckets for the decode-pruning layout
#: (reference: evm_load_template.py:218-219 — ``abs(hash(x)) % 10``).
N_HASH_BUCKETS = 10


def topics_arr(topics: Column) -> Column:
    """Normalize the raw ``topics`` string into ``array<string>``.

    The exporter emits topics in three shapes; the reference normalizes
    at enrich time (reference: evm_load_template.py:231-236)::

        IF(topics rlike ',',
           IF(topics rlike '^[0-9]+',
              split(replace(topics, '"', ''), ','),
              from_json(topics, 'array<string>')),
           array(topics))

    i.e. comma-joined bare list, JSON array string, or single value.
    """
    return (
        F.when(
            topics.rlike(","),
            F.when(
                topics.rlike("^[0-9]+"),
                F.split(F.regexp_replace(topics, '"', ""), ","),
            ).otherwise(F.from_json(topics, ArrayType(StringType()))),
        )
        .otherwise(F.array(topics))
    )


def unhex_0x(col: Column) -> Column:
    """``unhex(substr(x, 3))`` — strip the 0x prefix and decode to binary
    (reference: evm_load_template.py:237,326-327)."""
    return F.unhex(F.substring(col, 3, 2147483647))


def hash_bucket(col: Column, buckets: int = N_HASH_BUCKETS) -> Column:
    """``abs(hash(x)) % buckets`` — Spark Murmur3-based partition bucket.

    Must be Spark's builtin ``hash`` so bucket values reproduce the
    reference layout exactly (reference: evm_load_template.py:219,230,
    328-329); decode reads prune on these values (§4 of SURVEY.md).
    """
    return F.abs(F.hash(col)) % F.lit(buckets)


def trace_selector(input_col: Column) -> Column:
    """4-byte call sighash: ``substr(input, 1, 10)`` keeps '0x'+8 hex
    chars (reference: evm_load_template.py:325)."""
    return F.substring(input_col, 1, 10)


def block_time(ts_seconds: Column) -> Column:
    """``TIMESTAMP_SECONDS(bigint)`` (reference: evm_load_template.py:156
    and six sibling sites)."""
    return F.timestamp_seconds(ts_seconds)
