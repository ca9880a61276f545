"""Property test: cell_outliers ≡ an independent numpy replay
(argmax cosine, ties to the smaller centroid id, strict < flag) on
randomized corpora — zero vectors, duplicate vectors, ties, and
single-centroid cases emerge from the generator rather than
hand-picked fixtures. Similarities are compared at the operator's own
6-dp rounding; assignment and flag are compared exactly (the shipped
thresholds sit far from any value, see the llm_cell_outliers oracle
note, and the generator draws thresholds between grid points so the
replay can't straddle a float boundary either)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datawaves_etl_airflow_spark.operators.similarity import cell_outliers

# small integer grid: cosine of integer-coordinate vectors keeps the
# Spark (float32 input, double math) and numpy (double) paths in exact
# agreement at 6 dp, while still generating ties and zero vectors
_vec = st.lists(st.integers(-3, 3), min_size=4, max_size=4)
_corpus = st.lists(
    st.tuples(st.integers(0, 999), _vec),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)
_cents = st.lists(
    st.tuples(st.integers(0, 99), _vec),
    min_size=1,
    max_size=4,
    unique_by=lambda t: t[0],
)


def _reference(rows, cents, min_sim):
    out = {}
    for vid, v in rows:
        va = np.asarray(v, dtype=np.float64)
        nv = math.sqrt(float(va @ va))
        best = None  # (sim, -cid) max
        for cid, c in cents:
            ca = np.asarray(c, dtype=np.float64)
            nc = math.sqrt(float(ca @ ca))
            s = float(va @ ca) / (nv * nc) if nv and nc else float("nan")
            key = (s, -cid)
            # NaN never wins a > comparison; mirror SQL semantics where
            # a NaN sim sorts above (Spark treats NaN as largest) —
            # exclude NaN vectors from generation instead: zero-norm
            # rows are the only NaN source and are asserted separately
            if math.isnan(s):
                continue
            if best is None or key > best:
                best = key
        if best is None:
            out[vid] = (None, None, True)
        else:
            s, ncid = best
            out[vid] = (-ncid, round(s, 6), s < min_sim)
    return out


class TestMatchesNumpyReplay:
    @settings(max_examples=25, deadline=None)
    @given(
        rows=_corpus,
        cents=_cents,
        min_sim=st.sampled_from([-0.55, -0.15, 0.05, 0.45, 0.85]),
    )
    def test_assignment_sim_and_flag(self, spark, rows, cents, min_sim):
        # zero vectors stay IN the corpus: the operator's norm guard
        # must route them through the NULL-cell outlier branch itself
        # (r6 ADVICE — before the guard, array_max fell through to the
        # nid tiebreak and reported a meaningless non-NULL centroid_id
        # with NULL sim). Zero CENTROIDS stay excluded: a prototype
        # set is caller-curated, a corpus is not.
        rows = [(vid, [float(x) for x in v]) for vid, v in rows]
        cents = [c for c in cents if any(c[1])]
        if not cents:
            return
        got = {
            r["vec_id"]: (
                r["centroid_id"],
                r["centroid_sim"],
                r["is_outlier"],
            )
            for r in cell_outliers(
                spark.createDataFrame(
                    rows, "vec_id long, embedding array<float>"
                ),
                spark.createDataFrame(
                    [(cid, [float(x) for x in c]) for cid, c in cents],
                    "centroid_id int, centroid array<double>",
                ),
                min_sim=min_sim,
            ).collect()
        }
        want = _reference(rows, cents, min_sim)
        for vid, v in rows:
            if not any(v):
                # zero vector: unscorable → NULL cell, flagged
                assert got[vid] == (None, None, True)
            else:
                assert got[vid] == want[vid], (vid, got[vid], want[vid])
