"""Prices-source hardening (round-4 verdict #8): the CSV ingest path
gets the exporters' rigor — S-13 provider failover on the fetch and
loud malformed-CSV rejection on the read."""

from __future__ import annotations

import os

import pytest

from datawaves_etl_airflow_spark.operators.prices import (
    PRICE_HEADER,
    SyntheticPriceSource,
    fetch_prices_csv,
    read_prices_csv,
)
from datawaves_etl_airflow_spark.sources.exporters import ExportError

TOKENS = [
    {"address": "0xaaa", "symbol": "AAA", "decimals": 18, "end": None},
    {"address": "0xbbb", "symbol": "BBB", "decimals": 6, "end": None},
]

RECORDS = {
    "0xaaa": [
        {
            "minute": "2022-01-01 00:00",
            "price": 1.5,
            "decimals": 18,
            "contract_address": "0xaaa",
            "symbol": "AAA",
            "dt": "2022-01-01",
        }
    ],
    "0xbbb": [
        {
            "minute": "2022-01-01 00:05",
            "price": 2.0,
            "decimals": 6,
            "contract_address": "0xbbb",
            "symbol": "BBB",
            "dt": "2022-01-01",
        }
    ],
}


class TestProviderFailover:
    def test_second_provider_serves_when_first_is_down(
        self, spark, tmp_path
    ):
        down = SyntheticPriceSource({}, fail=True)
        up = SyntheticPriceSource(RECORDS)
        out = str(tmp_path / "d" / "prices.csv")
        n = fetch_prices_csv([down, up], TOKENS, out, 0, 86400)
        assert n == 2
        assert down.calls == 2 and up.calls == 2  # tried in order
        df = read_prices_csv(spark, out)
        got = {
            (r["contract_address"], r["symbol"], r["price"])
            for r in df.collect()
        }
        assert got == {("0xaaa", "AAA", 1.5), ("0xbbb", "BBB", 2.0)}

    def test_all_providers_down_raises_and_writes_nothing(
        self, spark, tmp_path
    ):
        out = str(tmp_path / "d" / "prices.csv")
        with pytest.raises(ExportError, match="providers failed"):
            fetch_prices_csv(
                [SyntheticPriceSource({}, fail=True)], TOKENS, out, 0, 86400
            )
        assert not os.path.exists(out)  # tmp-then-replace: no torn file

    def test_ended_tokens_skipped(self, tmp_path):
        up = SyntheticPriceSource(RECORDS)
        ended = [
            {**TOKENS[0], "end": 100},  # ended before window end
            TOKENS[1],
        ]
        out = str(tmp_path / "prices.csv")
        n = fetch_prices_csv([up], ended, out, 0, 86400)
        assert n == 1 and up.calls == 1  # 0xaaa never even fetched


class TestMalformedCsvRejection:
    def _write(self, tmp_path, lines):
        p = str(tmp_path / "prices.csv")
        with open(p, "w") as f:
            f.write(",".join(PRICE_HEADER) + "\n")
            for line in lines:
                f.write(line + "\n")
        return p

    def test_good_csv_reads_strict(self, spark, tmp_path):
        p = self._write(
            tmp_path,
            ["2022-01-01 00:00,1.5,18,0xaaa,AAA,2022-01-01"],
        )
        rows = read_prices_csv(spark, p).collect()
        assert len(rows) == 1 and rows[0]["price"] == 1.5

    def test_unparseable_price_raises_strict(self, spark, tmp_path):
        p = self._write(
            tmp_path,
            ["2022-01-01 00:00,not-a-price,18,0xaaa,AAA,2022-01-01"],
        )
        with pytest.raises(Exception, match="Malformed|FAILFAST"):
            read_prices_csv(spark, p).collect()

    def test_ragged_row_raises_strict(self, spark, tmp_path):
        p = self._write(tmp_path, ["2022-01-01 00:00,1.5"])
        with pytest.raises(Exception, match="Malformed|FAILFAST"):
            read_prices_csv(spark, p).collect()

    def test_permissive_mode_still_available_for_salvage(
        self, spark, tmp_path
    ):
        p = self._write(
            tmp_path,
            [
                "2022-01-01 00:00,1.5,18,0xaaa,AAA,2022-01-01",
                "2022-01-01 00:05,not-a-price,18,0xaaa,AAA,2022-01-01",
            ],
        )
        rows = read_prices_csv(spark, p, strict=False).collect()
        assert len(rows) == 2
        assert {r["price"] for r in rows} == {1.5, None}
