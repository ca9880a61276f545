"""SCD2 dimension maintenance: every row fate in one small frame."""

import datetime as dt

from datawaves_etl_airflow_spark.operators.scd import scd2_apply


def _ts(s):
    return dt.datetime.fromisoformat(s)


class TestScd2Apply:
    def _dim(self, spark):
        return spark.createDataFrame(
            [
                # k1: closed history row + a current row
                (1, "a", _ts("2020-01-01"), _ts("2021-01-01")),
                (1, "b", _ts("2021-01-01"), None),
                # k2: current only, will be unchanged (identical update)
                (2, "x", _ts("2020-06-01"), None),
                # k3: current only, no update at all
                (3, "y", _ts("2020-06-01"), None),
                # k4: current with NULL attr, update also NULL → no change
                (4, None, _ts("2020-06-01"), None),
            ],
            ["k", "attr", "valid_from", "valid_to"],
        )

    def _updates(self, spark):
        return spark.createDataFrame(
            [
                (1, "c", _ts("2022-03-01")),   # change → close + reopen
                (2, "x", _ts("2022-03-01")),   # identical → no-op
                (4, None, _ts("2022-03-01")),  # null == null → no-op
                (9, "new", _ts("2022-03-01")), # brand-new key → insert
            ],
            ["k", "attr", "eff"],
        )

    def test_all_row_fates(self, spark):
        out = scd2_apply(
            self._dim(spark), self._updates(spark), "k", ["attr"], "eff"
        )
        rows = {
            (r["k"], r["attr"], r["valid_from"], r["valid_to"])
            for r in out.collect()
        }
        assert rows == {
            # history passthrough
            (1, "a", _ts("2020-01-01"), _ts("2021-01-01")),
            # k1 current closed at eff + new version opened
            (1, "b", _ts("2021-01-01"), _ts("2022-03-01")),
            (1, "c", _ts("2022-03-01"), None),
            # unchanged / untouched / null-equal currents
            (2, "x", _ts("2020-06-01"), None),
            (3, "y", _ts("2020-06-01"), None),
            (4, None, _ts("2020-06-01"), None),
            # insert
            (9, "new", _ts("2022-03-01"), None),
        }

    def test_exactly_one_open_row_per_key(self, spark):
        from pyspark.sql import functions as F

        out = scd2_apply(
            self._dim(spark), self._updates(spark), "k", ["attr"], "eff"
        )
        open_counts = (
            out.filter(F.col("valid_to").isNull())
            .groupBy("k")
            .count()
            .collect()
        )
        assert all(r["count"] == 1 for r in open_counts)

    def test_reapply_is_idempotent(self, spark):
        # applying the same batch to the already-updated dimension
        # changes nothing: versions now match the updates
        d1 = scd2_apply(
            self._dim(spark), self._updates(spark), "k", ["attr"], "eff"
        )
        d2 = scd2_apply(d1, self._updates(spark), "k", ["attr"], "eff")
        a = {tuple(r) for r in d1.collect()}
        b = {tuple(r) for r in d2.collect()}
        assert a == b
