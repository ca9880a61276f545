"""Off-chain prices operators (S-12).

The reference fetches 5-minute tickers and forward-fills each record to
1-minute rows in driver-side Python (reference:
dags/offchains/prices.py:44-83). At scale that fill is a generate+join
problem, so the engine expresses it as ``explode(sequence(...))`` — a
pure JVM rowset expansion, no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_active_tokens(
    tokens: DataFrame,
    window_start,
    end_date_col: str = "end_date",
) -> DataFrame:
    """P-7: keep only tokens whose tracked period is still open at the
    window start — tokens with an end date before the window are
    skipped (reference dags/offchains/prices.py:56-59; token list model
    dags/offchains/tokens.py:45-59 carries the optional end date)."""
    end = F.col(end_date_col).cast("date")
    return tokens.filter(
        end.isNull() | (end >= F.lit(window_start).cast("date"))
    )


def fill_price_minutes(raw: DataFrame, interval_minutes: int = 5) -> DataFrame:
    """Expand each ``interval_minutes``-grain price record to 1-minute
    rows (reference dags/offchains/prices.py:73-83: each record fills
    [minute, minute+interval-1])."""
    span = interval_minutes - 1
    seq = F.expr(
        f"sequence(minute, minute + INTERVAL {span} MINUTES, INTERVAL 1 MINUTE)"
    )
    other = [c for c in raw.columns if c != "minute"]
    return raw.select(F.explode(seq).alias("minute"), *other)
