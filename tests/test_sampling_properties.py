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


class TestEpochUpsampleProperties:
    """epoch_upsample ≡ a pure-Python replay: per-group output size
    lands exactly on the (clamped) quota, epochs split into
    floor(q/n) full copies + an md5-ranked remainder, (id, epoch)
    unique — starved quotas, over-epoch quotas and single-doc groups
    all emerge from the generator."""

    @settings(max_examples=10, deadline=None)
    @given(
        rows=_rows,
        quotas=st.dictionaries(
            st.sampled_from(["A", "B", "C", "D"]),
            st.integers(0, 60),
            max_size=4,
        ),
    )
    def test_matches_reference(self, spark, rows, quotas):
        from datawaves_etl_airflow_spark.operators.sampling import (
            epoch_upsample,
        )

        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = epoch_upsample(df, "source", quotas).collect()
        groups = defaultdict(list)
        for i, g in rows:
            groups[g].append(i)
        got = defaultdict(list)
        for r in out:
            got[r["source"]].append((r["doc_id"], r["epoch"]))
        for g, ids in groups.items():
            n = len(ids)
            q = quotas.get(g, n)
            rows_g = got.get(g, [])
            assert len(rows_g) == q, (g, q, n)
            assert len(set(rows_g)) == len(rows_g)  # (id, epoch) unique
            full, rem = q // n, q % n
            # every doc appears exactly `full` times at epochs 0..full-1
            for i in ids:
                epochs = sorted(e for d, e in rows_g if d == i)
                base = list(range(full))
                ranked = sorted(
                    ids,
                    key=lambda x: (
                        hashlib.md5(str(x).encode()).hexdigest(), x
                    ),
                )
                want = base + ([full] if i in set(ranked[:rem]) else [])
                assert epochs == want, (g, i)
