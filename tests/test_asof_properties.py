"""Property test: asof_join ≡ pandas.merge_asof (an independent,
widely-trusted implementation of backward-inclusive as-of semantics)
on randomized inputs — keys with empty sides, boundary-equal
timestamps, NULL value columns, and unmatched probes all emerge from
the generator rather than hand-picked cases."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datawaves_etl_airflow_spark.operators.temporal import asof_join

EPOCH = dt.datetime(2024, 1, 1)

# (key, seconds-offset) pairs; tight domains force collisions on keys
# and boundary-equal timestamps across the two sides
_row = st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50))
_left_rows = st.lists(_row, min_size=1, max_size=25)
_right_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(0, 50),
        st.one_of(st.none(), st.integers(-100, 100)),
    ),
    min_size=0,
    max_size=25,
)


class TestAsofEquivalence:
    @settings(max_examples=12, deadline=None)
    @given(left=_left_rows, right=_right_rows)
    def test_matches_pandas_merge_asof(self, spark, left, right):
        # right rows unique per (key, ts) — the operator's contract
        seen = set()
        rdata = []
        for k, s, v in right:
            if (k, s) not in seen:
                seen.add((k, s))
                rdata.append(
                    (k, EPOCH + dt.timedelta(seconds=s),
                     float(v) if v is not None else None)
                )
        ldata = [
            (k, EPOCH + dt.timedelta(seconds=s)) for k, s in left
        ]
        ldf = spark.createDataFrame(ldata, "key string, lts timestamp")
        rdf = spark.createDataFrame(
            rdata, "key string, rts timestamp, v double"
        )
        got = asof_join(ldf, rdf, "key", "lts", "rts", ["v"]).select(
            "key", "lts", "v"
        )
        got_rows = sorted(
            (r["key"], r["lts"], r["v"]) for r in got.collect()
        )

        lpd = pd.DataFrame(ldata, columns=["key", "lts"]).sort_values(
            "lts", kind="stable"
        )
        if rdata:
            rpd = pd.DataFrame(
                rdata, columns=["key", "rts", "v"]
            ).sort_values("rts", kind="stable")
            merged = pd.merge_asof(
                lpd, rpd, left_on="lts", right_on="rts",
                by="key", direction="backward", allow_exact_matches=True,
            )
        else:
            merged = lpd.assign(v=None)
        want_rows = sorted(
            (
                r.key,
                r.lts.to_pydatetime(),
                None if pd.isna(r.v) else float(r.v),
            )
            for r in merged.itertuples()
        )
        assert got_rows == want_rows


# (key-free) range containment: randomized facts/intervals vs a naive
# O(n*m) python reference, with boundary-exact and sub-second cases
_facts = st.lists(
    st.integers(0, 400),  # fact offsets in HALF-seconds (forces
    min_size=1, max_size=20,  # sub-second boundaries)
)
_ranges = st.lists(
    st.tuples(st.integers(0, 400), st.integers(1, 120)),  # (start, len)
    min_size=0,
    max_size=10,
)


class TestRangeJoinEquivalence:
    @settings(max_examples=10, deadline=None)
    @given(facts=_facts, ranges=_ranges)
    def test_matches_naive_containment(self, spark, facts, ranges):
        from datawaves_etl_airflow_spark.operators.temporal import (
            bucketed_range_join,
        )

        fdata = [
            (i, EPOCH + dt.timedelta(milliseconds=500 * o))
            for i, o in enumerate(facts)
        ]
        rdata = [
            (
                j,
                EPOCH + dt.timedelta(milliseconds=500 * s),
                EPOCH + dt.timedelta(milliseconds=500 * (s + ln)),
            )
            for j, (s, ln) in enumerate(ranges)
        ]
        fdf = spark.createDataFrame(fdata, "fid long, ts timestamp")
        rdf = spark.createDataFrame(
            rdata, "rid long, start timestamp, end timestamp"
        )
        got = sorted(
            (r["fid"], r["rid"])
            for r in bucketed_range_join(
                fdf, "ts", rdf, "start", "end", bucket_seconds=60
            ).collect()
        )
        want = sorted(
            (fi, rj)
            for fi, fts in fdata
            for rj, rs, re in rdata
            if rs <= fts < re
        )
        assert got == want
