"""Skew mitigation utilities: salted aggregation and salted broadcast
joins.

AQE's skew-join splitting (on by default, session.py) handles most
runtime skew; these operators are for the cases AQE can't fix:
a groupBy where one key holds a double-digit percentage of all rows
(AQE cannot split a single hash-aggregation key), and a shuffle join
against a dimension where one join key dominates.

Both are pure plan rewrites — results are exactly what the unsalted
plan produces, which is what the oracle-checked query verifies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """GroupBy with a two-phase salted shuffle: partial aggregate on
    (keys, salt) — spreading a hot key over ``n_salts`` reducers — then
    the final (small) aggregate on keys.

    ``sum_cols`` maps output name → input column; counts come along as
    ``n_rows``. Only algebraic aggregates (sum/count) distribute over
    the two phases — that is precisely why this helper restricts to
    them.
    """
    salt = (F.spark_partition_id() % F.lit(n_salts)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(c).alias(f"_s_{name}") for name, c in sum_cols.items()],
        )
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("_n").alias("n_rows"),
            *[
                F.sum(f"_s_{name}").alias(name)
                for name in sum_cols
            ],
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join where ``big`` has skewed join keys: the big side
    gets a deterministic salt (partition id modulo ``n_salts``), the
    small side is exploded ×``n_salts`` — each hot-key reducer now
    receives 1/n of the hot rows. Same rows out as the plain join.
    """
    salted_big = big.withColumn(
        "_salt", F.spark_partition_id() % F.lit(n_salts)
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [key, "_salt"], "inner")
    return out.drop("_salt")
