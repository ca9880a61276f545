"""Off-chain prices operators (S-12) and the hardened prices source.

The reference fetches 5-minute tickers and forward-fills each record to
1-minute rows in driver-side Python (reference:
dags/offchains/prices.py:44-83). At scale that fill is a generate+join
problem, so the engine expresses it as ``explode(sequence(...))`` — a
pure JVM rowset expansion, no Python, no shuffle.

Round-5 hardening (verdict #8): the CSV ingest path gets the same
rigor as the JSON exporters — provider failover on the fetch (the
reference's single Coinpaprika provider raises and kills the day,
dags/offchains/prices.py:103-106; the engine reuses the S-13 loop from
`sources.exporters`) and a strict read mode that REJECTS malformed CSV
instead of Spark's default PERMISSIVE nulling (a silently-nulled price
poisons every downstream join and fill).
"""

from __future__ import annotations

import csv
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference: dags/offchains/prices.py:20 — the temp-CSV contract the
#: loader reads (schemas.staging.PRICES matches it column-for-column)
PRICE_HEADER = ["minute", "price", "decimals", "contract_address", "symbol", "dt"]


class PriceSource:
    """One price provider (Coinpaprika-shaped). The real HTTP client is
    outside this repo's scope (exactly as the reference's requests call
    is an external API); subclasses implement `token_prices`."""

    def token_prices(
        self, token: dict, start: int, end: int
    ) -> list[dict]:
        """Raw interval records for one token over [start, end) epoch
        seconds — dicts with the PRICE_HEADER fields."""
        raise NotImplementedError


class SyntheticPriceSource(PriceSource):
    """Deterministic in-memory provider for tests/local runs;
    ``fail=True`` makes every call raise, to exercise failover."""

    def __init__(self, records_by_token: dict[str, list[dict]], fail: bool = False):
        self.records_by_token = records_by_token
        self.fail = fail
        self.calls = 0

    def token_prices(self, token: dict, start: int, end: int) -> list[dict]:
        self.calls += 1
        if self.fail:
            from ..sources.exporters import ExportError

            raise ExportError("synthetic price provider down")
        return self.records_by_token.get(token["address"], [])


def fetch_prices_csv(
    providers: Sequence[PriceSource],
    tokens: Sequence[dict],
    output_path: str,
    start: int,
    end: int,
) -> int:
    """Write the day's raw price CSV (the reference's create_temp_csv,
    dags/offchains/prices.py:47-64) with PER-TOKEN provider failover —
    the S-13 loop the JSON exporters already use. Tokens whose tracked
    period ended before the window end are skipped (reference:56-59).
    Returns rows written.

    Driver-side by design: this is the EXTRACT step (an HTTP fetch per
    token, like the reference), bounded by the token list — the
    Spark-side work starts at `read_prices_csv`/`fill_price_minutes`.
    """
    from ..sources.exporters import with_provider_failover

    n = 0
    tmp = output_path + ".__tmp__"
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(tmp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=PRICE_HEADER)
        w.writeheader()
        for token in tokens:
            end_at = token.get("end")
            if end_at is not None and int(end_at) < end:
                continue
            rows = with_provider_failover(
                providers, lambda p, t=token: p.token_prices(t, start, end)
            )
            for r in rows:
                w.writerow({k: r[k] for k in PRICE_HEADER})
                n += 1
    os.replace(tmp, output_path)  # never a half-written day file
    return n


def read_prices_csv(
    spark: SparkSession, path: str, strict: bool = True
) -> DataFrame:
    """S-2 prices read with loud rejection: FAILFAST makes a malformed
    cell (unparseable price/timestamp, ragged row) raise at execution
    instead of PERMISSIVE's silent null — matching the JSON staging
    paths, whose explicit schemas + tests already reject hostile
    fixtures. ``strict=False`` restores the permissive read for
    salvage jobs."""
    from ..schemas.staging import staging_schema

    reader = spark.read.schema(staging_schema("prices")).option(
        "header", True
    )
    if strict:
        reader = reader.option("mode", "FAILFAST")
    return reader.csv(path)


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
