"""Property tests for the vectorized LSH kernels (dedup.minhash_band_rows_np,
similarity.neardup_pairs_banded): the probabilistic machinery has exact
obligations — identical inputs collide with certainty, the mixer is a
bijection (no signature collapse), and high-similarity pairs are always
recovered. Spark-side properties run on one session with small corpora;
the pure-numpy mixer property needs no Spark at all.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datawaves_etl_airflow_spark.operators import dedup, similarity
from datawaves_etl_airflow_spark.operators.dedup import _mix64


class TestMixerProperties:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, 2**64 - 1), min_size=2, max_size=64,
                    unique=True))
    def test_mix64_injective_on_sample(self, xs):
        """A finalizer that collapses distinct inputs would merge
        unrelated shingles into one permutation value — mix64 is a
        bijection, so distinct inputs stay distinct."""
        arr = np.array(xs, dtype=np.uint64)
        out = _mix64(arr)
        assert len(np.unique(out)) == len(xs)

    @settings(max_examples=50, deadline=None)
    @given(st.integers(0, 2**64 - 1))
    def test_mix64_deterministic(self, x):
        a = _mix64(np.array([x], dtype=np.uint64))[0]
        b = _mix64(np.array([x], dtype=np.uint64))[0]
        assert a == b


class TestMinhashBandProperties:
    def _bands(self, spark, docs):
        sets = dedup.word_shingle_hash_sets(
            spark.createDataFrame(docs, ["doc_id", "text"])
        )
        return dedup.minhash_band_rows_np(sets, 64, 32)

    def test_identical_docs_collide_in_every_band(self, spark):
        """MinHash is exact on identical shingle sets: all 32 band
        hashes must be equal, not just one."""
        text = "the quick brown fox jumps over the lazy dog again"
        rows = self._bands(spark, [(1, text), (2, text)]).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["id"], {})[r["band_id"]] = r["band_hash"]
        assert by_doc[1] == by_doc[2]
        assert len(by_doc[1]) == 32

    def test_disjoint_docs_share_no_band(self, spark):
        """Two docs with disjoint shingle sets colliding in a band is a
        2^-? accident per band; with these fixed inputs the seeded
        pipeline gives zero collisions (deterministic, so this is a pin
        rather than a flake)."""
        a = " ".join(f"alpha{i}" for i in range(40))
        b = " ".join(f"beta{i}" for i in range(40))
        rows = self._bands(spark, [(1, a), (2, b)]).collect()
        bands = {}
        for r in rows:
            bands.setdefault((r["band_id"], r["band_hash"]), set()).add(r["id"])
        assert all(len(ids) == 1 for ids in bands.values())

    def test_high_jaccard_pairs_always_candidates(self, spark):
        """j ≥ 0.8 pairs survive banding with prob 1-(1-j^2)^32 ≥
        1-1e-14 — operationally 'always'; the seeded pipeline makes
        this a deterministic pin over 20 planted pairs."""
        base = [f"word{i}" for i in range(50)]
        docs = []
        for d in range(20):
            repl = list(base)
            repl[d] = f"changed{d}"  # ~0.88 shingle jaccard vs base
            docs.append((d, " ".join(base)))
            docs.append((d + 1000, " ".join(repl)))
        pairs = dedup.minhash_dedup_pairs(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            threshold=0.5, n_hashes=64, n_bands=32,
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        for d in range(20):
            assert (d, d + 1000) in found, (
                f"planted pair ({d}, {d + 1000}) not recovered"
            )


class TestNeardupBandedProperties:
    def test_duplicate_vectors_always_pair(self, spark):
        """Identical vectors share every band signature — recall 1
        regardless of banding parameters."""
        rng = np.random.RandomState(3)
        rows = []
        for i in range(30):
            v = rng.standard_normal(64).astype(float).tolist()
            rows.append((i, v))
            rows.append((i + 100, v))
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        got = similarity.neardup_pairs_banded(df, dim=64, threshold=0.999)
        pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
        assert {(i, i + 100) for i in range(30)} <= pairs

    def test_malformed_embeddings_excluded_not_crashed(self, spark):
        """NULL or wrong-length embeddings must not abort the job AND
        must never pair — including two malformed rows of the SAME
        wrong length, which would share a signature and a plausible
        garbage cosine if they reached the rerank."""
        rng = np.random.RandomState(5)
        v = rng.standard_normal(64).tolist()
        w = rng.standard_normal(64).tolist()
        rows = [(0, v), (1, v), (2, None), (3, v[:10]), (4, v[:10]),
                (5, w[:10])]
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )
        got = similarity.neardup_pairs_banded(df, dim=64, threshold=0.999)
        pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
        assert pairs == {(0, 1)}

    def test_orthogonal_vectors_never_pair(self, spark):
        """cos = 0 vectors can collide in bands (half the sign bits
        agree by chance) but must be rejected by the exact rerank."""
        rows = []
        for i in range(20):
            v = [0.0] * 64
            v[i] = 1.0
            rows.append((i, v))
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        got = similarity.neardup_pairs_banded(df, dim=64, threshold=0.5)
        assert got.count() == 0
