"""S-14 end-to-end: a decoded ABI table flows decode → warehouse →
client transfer, matching the reference's per-(client, table) copy
jobs (reference dags/chains/transfer.py:19-130, client config
transfer_client.py:26-35). VERDICT r3 task #6."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators import enrich
from datawaves_etl_airflow_spark.operators.decode import (
    TRANSFER_TOPIC0,
    decode_log_events,
    decoded_table_name,
)
from datawaves_etl_airflow_spark.operators.sinks import write_partitioned
from datawaves_etl_airflow_spark.operators.transfer import (
    TransferTarget,
    transfer_partition,
)
from datawaves_etl_airflow_spark.queries.domain import TRANSFER_EVENT

DS = "2023-11-14"
ADDR_A = "0x" + "aa" * 20
ADDR_B = "0x" + "bb" * 20


def _decoded_transfers(spark):
    """Enriched logs → decoded ERC-20 Transfer rows (the exact table
    shape a client receives)."""
    word = lambda a: "0x" + "0" * 24 + a[2:]  # noqa: E731
    rows = [
        (
            i,
            f"0xt{i}",
            0,
            "0xtoken",
            "0x" + format(10_000 + i, "064x"),
            ",".join([TRANSFER_TOPIC0, word(ADDR_A), word(ADDR_B)]),
            100,
        )
        for i in range(6)
    ]
    raw = spark.createDataFrame(
        rows,
        ["log_index", "transaction_hash", "transaction_index", "address",
         "data", "topics", "block_number"],
    ).withColumn("block_hash", F.lit("0xb"))
    blocks = spark.createDataFrame(
        [(100, "0xb100", 1_699_900_000)], ["number", "hash", "timestamp"]
    )
    return decode_log_events(enrich.enrich_logs(raw, blocks), TRANSFER_EVENT)


class TestDecodedTableTransfer:
    def test_decode_to_client_end_to_end(self, spark, tmp_path):
        decoded = _decoded_transfers(spark)
        table = decoded_table_name("erc20", "token", TRANSFER_EVENT)

        # producer side: daily partitioned warehouse write
        wh = str(tmp_path / "wh" / table)
        write_partitioned(decoded, "", DS, path=wh)

        # client side: per-table partition copy
        client = TransferTarget("path", str(tmp_path / "client"))
        n = transfer_partition(spark, wh, client, table, DS)
        assert n == 6

        got = spark.read.parquet(str(tmp_path / "client" / table))
        # value-exact: every decoded column survives both hops
        want = decoded.withColumn("dt", F.lit(DS).cast("date"))
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # decoded payload sanity on the far side
        row = got.orderBy("evt_index").collect()[0]
        assert row["from"] == ADDR_A and row["to"] == ADDR_B
        assert row["evt_block_number"] == 100

    def test_rerun_is_idempotent(self, spark, tmp_path):
        """The reference's transfer jobs are daily re-runnable; a
        second copy of the same ds must not duplicate client rows."""
        decoded = _decoded_transfers(spark)
        wh = str(tmp_path / "wh" / "t")
        write_partitioned(decoded, "", DS, path=wh)
        client = TransferTarget("path", str(tmp_path / "client"))
        transfer_partition(spark, wh, client, "t", DS)
        transfer_partition(spark, wh, client, "t", DS)
        assert spark.read.parquet(
            str(tmp_path / "client" / "t")
        ).count() == 6

    def test_other_days_survive_a_rerun(self, spark, tmp_path):
        """Dynamic overwrite scopes to the transferred ds only."""
        decoded = _decoded_transfers(spark)
        wh = str(tmp_path / "wh" / "t")
        other = "2023-11-15"
        write_partitioned(decoded, "", DS, path=wh)
        write_partitioned(decoded.limit(2), "", other, path=wh)
        client = TransferTarget("path", str(tmp_path / "client"))
        transfer_partition(spark, wh, client, "t", DS)
        transfer_partition(spark, wh, client, "t", other)
        transfer_partition(spark, wh, client, "t", DS)  # re-run day 1
        got = spark.read.parquet(str(tmp_path / "client" / "t"))
        assert got.filter(F.col("dt") == F.lit(other).cast("date")).count() == 2
        assert got.count() == 8

    def test_jdbc_target_builds_writer_contract(self, spark, monkeypatch):
        """No JDBC endpoint exists in the sandbox; pin the contract —
        url, dbtable, options, append mode — by intercepting the final
        save."""
        import datawaves_etl_airflow_spark.operators.transfer as tr

        captured = {}

        class FakeWriter:
            def __init__(self):
                self.opts = {}
                self.fmt = self.saved_mode = None

            def mode(self, m):
                self.saved_mode = m
                return self

            def format(self, f):
                self.fmt = f
                return self

            def option(self, k, v):
                self.opts[k] = v
                return self

            def save(self):
                captured.update(
                    mode=self.saved_mode, fmt=self.fmt, **self.opts
                )

        class FakeDF:
            def __init__(self):
                self.write = FakeWriter()

            def filter(self, *a, **k):
                return self

            def count(self):
                return 3

        fake = FakeDF()
        # transfer_partition type-dispatches on DataFrame; let the fake
        # pass the isinstance gate without touching py4j
        from pyspark.sql import DataFrame as RealDF

        monkeypatch.setattr(tr, "DataFrame", (RealDF, FakeDF))
        target = TransferTarget(
            "jdbc",
            "jdbc:databricks://host:443/default",
            (("user", "client"), ("password", "secret")),
        )
        n = tr.transfer_partition(spark, fake, target, "erc20_transfer", DS)
        assert n == 3
        assert captured["mode"] == "append"
        assert captured["fmt"] == "jdbc"
        assert captured["url"] == "jdbc:databricks://host:443/default"
        assert captured["dbtable"] == "erc20_transfer"
        assert captured["user"] == "client"
        assert captured["password"] == "secret"
