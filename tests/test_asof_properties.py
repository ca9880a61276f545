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
