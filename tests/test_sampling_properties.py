"""Property test: temperature_sample ≡ an independent pure-Python
replay (hashlib.md5 + IEEE double sqrt + integer floor division) on
randomized inputs — zero budgets, starved tail groups, single-doc
groups, and quota-exceeds-group-size cases all emerge from the
generator rather than hand-picked fixtures."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from datawaves_etl_airflow_spark.operators.sampling import temperature_sample

_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.sampled_from(["A", "B", "C", "D"])),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


def _reference(rows, budget, alpha):
    """Pure-Python replay of the operator's documented math."""
    groups = defaultdict(list)
    for i, g in rows:
        groups[g].append(i)
    def _raw(n):
        # mirror the operator's exact spellings: sqrt is correctly
        # rounded everywhere, n**alpha (libm pow) is not
        if alpha == 0.5:
            return math.sqrt(n)
        if alpha == 0:
            return 1.0
        return float(n)

    w = {
        g: math.floor(1_000_000.0 * _raw(len(ids)))
        for g, ids in groups.items()
    }
    tot = sum(w.values())
    kept = {}
    for g, ids in groups.items():
        quota = budget * w[g] // tot
        ranked = sorted(
            ids,
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        kept[g] = (quota, set(ranked[: max(quota, 0)]))
    return kept


class TestTemperatureSampleProperties:
    @settings(max_examples=10, deadline=None)
    @given(
        rows=_rows,
        budget=st.integers(0, 25),
        alpha=st.sampled_from([0, 0.5, 1]),
    )
    def test_matches_python_replay(self, spark, rows, budget, alpha):
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = temperature_sample(
            df, "source", total_budget=budget, alpha=alpha
        ).collect()
        expected = _reference(rows, budget, alpha)
        got = defaultdict(set)
        for r in out:
            got[r["source"]].add(r["doc_id"])
            assert r["quota"] == expected[r["source"]][0]
            assert 1 <= r["rk"] <= r["quota"]
        for g, (quota, ids) in expected.items():
            assert got.get(g, set()) == ids, (g, quota)
        assert len(out) <= budget
