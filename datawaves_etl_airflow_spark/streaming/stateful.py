"""Custom stateful streaming operator via applyInPandasWithState.

Example operator: running per-key totals (e.g. cumulative transfer
volume per token address) — state is one (count, total) pair per key,
updated per micro-batch, emitted on every update.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("key", StringType(), False),
    StructField("n_events", LongType(), True),
    StructField("total", DoubleType(), True),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType(), True),
    StructField("total", DoubleType(), True),
])


def running_totals(
    grouped_stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Cumulative (count, sum) per key across micro-batches.

    ``grouped_stream`` is a streaming DataFrame; grouping happens here.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total": [total]}
        )

    return grouped_stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
