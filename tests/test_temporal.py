"""Temporal joins (operators.temporal): as-of join vs a naive Python
point-in-time lookup, bucketed range join vs a naive containment scan —
including boundary inclusivity and no-match rows."""

import datetime as dt

from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.temporal import (
    asof_join,
    bucketed_range_join,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


class TestAsofJoin:
    def _run(self, spark, left_rows, right_rows):
        left = spark.createDataFrame(left_rows, ["id", "key", "ts"])
        right = spark.createDataFrame(right_rows, ["key", "rts", "val"])
        out = asof_join(left, right, "key", "ts", "rts", ["val"])
        return {r["id"]: (r["rts"], r["val"]) for r in out.collect()}

    def test_backward_inclusive_and_no_match(self, spark):
        left = [
            (1, "a", _ts("2024-01-01T10:00:00")),   # exact tie → inclusive
            (2, "a", _ts("2024-01-01T10:30:00")),   # between rights
            (3, "a", _ts("2024-01-01T09:00:00")),   # before any right → null
            (4, "b", _ts("2024-01-01T12:00:00")),   # other key
            (5, "c", _ts("2024-01-01T12:00:00")),   # key absent from right
        ]
        right = [
            ("a", _ts("2024-01-01T10:00:00"), 1.0),
            ("a", _ts("2024-01-01T10:15:00"), 2.0),
            ("a", _ts("2024-01-01T11:00:00"), 3.0),
            ("b", _ts("2024-01-01T11:59:00"), 9.0),
        ]
        got = self._run(spark, left, right)
        assert got[1] == (_ts("2024-01-01T10:00:00"), 1.0)
        assert got[2] == (_ts("2024-01-01T10:15:00"), 2.0)
        assert got[3] == (None, None)
        assert got[4] == (_ts("2024-01-01T11:59:00"), 9.0)
        assert got[5] == (None, None)

    def test_matches_naive_oracle(self, spark):
        left = [
            (i, f"k{i % 3}", _ts("2024-01-01T00:00:00")
             + dt.timedelta(minutes=7 * i))
            for i in range(40)
        ]
        right = [
            (f"k{j % 3}", _ts("2024-01-01T00:00:00")
             + dt.timedelta(minutes=11 * j), float(j))
            for j in range(20)
        ]
        got = self._run(spark, left, right)
        for i, key, ts in left:
            cands = [(rts, v) for k, rts, v in right
                     if k == key and rts <= ts]
            want = max(cands) if cands else (None, None)
            assert got[i] == want, f"row {i}"

    def test_left_rows_preserved(self, spark):
        left = spark.createDataFrame(
            [(1, "a", _ts("2024-01-01T00:00:00"), "extra")],
            ["id", "key", "ts", "payload"],
        )
        right = spark.createDataFrame(
            [("a", _ts("2023-12-31T00:00:00"), 5.0)], ["key", "rts", "val"]
        )
        out = asof_join(left, right, "key", "ts", "rts", ["val"]).collect()
        assert len(out) == 1
        assert out[0]["payload"] == "extra"
        assert out[0]["val"] == 5.0


class TestBucketedRangeJoin:
    def test_matches_naive_containment(self, spark):
        base = _ts("2024-03-01T00:00:00")
        facts_rows = [
            (i, base + dt.timedelta(hours=3 * i)) for i in range(50)
        ]
        # overlapping, non-grid-aligned ranges of uneven width
        ranges_rows = [
            (100 + j,
             base + dt.timedelta(hours=5 * j + 1),
             base + dt.timedelta(hours=5 * j + 1 + 4 + (j % 3) * 7))
            for j in range(10)
        ]
        facts = spark.createDataFrame(facts_rows, ["fid", "ts"])
        ranges = spark.createDataFrame(ranges_rows, ["rid", "start", "end"])
        for bucket_s in (3600, 6 * 3600, 48 * 3600):
            out = bucketed_range_join(
                facts, "ts", ranges, "start", "end", bucket_s
            )
            got = {(r["fid"], r["rid"]) for r in out.collect()}
            want = {
                (fid, rid)
                for fid, ts in facts_rows
                for rid, s, e in ranges_rows
                if s <= ts < e
            }
            assert got == want, f"bucket={bucket_s}"

    def test_half_open_boundaries(self, spark):
        facts = spark.createDataFrame(
            [(1, _ts("2024-01-01T00:00:00")), (2, _ts("2024-01-02T00:00:00"))],
            ["fid", "ts"],
        )
        ranges = spark.createDataFrame(
            [(9, _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"))],
            ["rid", "start", "end"],
        )
        got = {r["fid"] for r in
               bucketed_range_join(facts, "ts", ranges, "start", "end",
                                   86400).collect()}
        assert got == {1}  # start inclusive, end exclusive

    def test_no_duplicate_pairs(self, spark):
        # a range spanning many buckets must still emit each pair once
        facts = spark.createDataFrame(
            [(1, _ts("2024-01-05T12:00:00"))], ["fid", "ts"]
        )
        ranges = spark.createDataFrame(
            [(9, _ts("2024-01-01T00:00:00"), _ts("2024-01-31T00:00:00"))],
            ["rid", "start", "end"],
        )
        rows = bucketed_range_join(
            facts, "ts", ranges, "start", "end", 3600
        ).collect()
        assert len(rows) == 1


class TestAsofJoinBucketed:
    def _random_frames(self, spark, seed):
        import random

        rng = random.Random(seed)
        base = dt.datetime(2024, 1, 1)
        left = [
            (
                i,
                f"k{rng.randrange(4)}",
                base + dt.timedelta(seconds=rng.randrange(0, 7200)),
            )
            for i in range(120)
        ]
        # unique (key, ts) on the right, per the operator contract
        seen = set()
        right = []
        for _ in range(80):
            k = f"k{rng.randrange(4)}"
            t = base + dt.timedelta(seconds=rng.randrange(0, 7200))
            if (k, t) in seen:
                continue
            seen.add((k, t))
            right.append((k, t, float(rng.randrange(1000))))
        l = spark.createDataFrame(left, ["id", "key", "ts"])
        r = spark.createDataFrame(right, ["key", "rts", "val"])
        return l, r

    def test_equals_plain_asof_across_widths(self, spark):
        from datawaves_etl_airflow_spark.operators.temporal import (
            asof_join_bucketed,
        )

        l, r = self._random_frames(spark, 11)
        want = {
            row["id"]: (row["rts"], row["val"])
            for row in asof_join(l, r, "key", "ts", "rts", ["val"]).collect()
        }
        for width in (1, 60, 600, 86400):
            got = {
                row["id"]: (row["rts"], row["val"])
                for row in asof_join_bucketed(
                    l, r, "key", "ts", "rts", ["val"], width
                ).collect()
            }
            assert got == want, f"width={width}"

    def test_seed_crosses_empty_buckets(self, spark):
        from datawaves_etl_airflow_spark.operators.temporal import (
            asof_join_bucketed,
        )

        # right row at t=0; probe hours later with every intermediate
        # bucket empty — the match must carry across all of them
        l = spark.createDataFrame(
            [(1, "a", _ts("2024-01-01T09:00:00"))], ["id", "key", "ts"]
        )
        r = spark.createDataFrame(
            [("a", _ts("2024-01-01T00:00:30"), 7.0)], ["key", "rts", "val"]
        )
        out = asof_join_bucketed(l, r, "key", "ts", "rts", ["val"], 60)
        row = out.collect()[0]
        assert (row["rts"], row["val"]) == (_ts("2024-01-01T00:00:30"), 7.0)
