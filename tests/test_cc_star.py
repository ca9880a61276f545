"""Star-contraction connected components (duplicate_clusters_star):
equivalence with min-label propagation on random graphs, and the
log-diameter round advantage on deep chains it exists for."""

from __future__ import annotations

import random

import pytest

from datawaves_etl_airflow_spark.operators.dedup import (
    duplicate_clusters,
    duplicate_clusters_star,
)


def _clusters(df):
    return {r["id"]: r["cluster_id"] for r in df.collect()}


def _reference_cc(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find oracle."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


class TestStarContraction:
    @pytest.mark.parametrize("seed", [1, 7, 42])
    def test_random_graph_matches_label_prop_and_oracle(self, spark, seed):
        rng = random.Random(seed)
        n = 180
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(140)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        star = _clusters(duplicate_clusters_star(pairs))
        label = _clusters(duplicate_clusters(pairs))
        assert star == label == _reference_cc(edges)

    def test_deep_chain_converges_in_log_rounds(self, spark):
        """A 400-node path: label propagation needs ~400 rounds (one
        per hop), star contraction halves depth every round pair — at
        max_iter=12 star is exact where label propagation is not."""
        n = 400
        chain = [(i, i + 1) for i in range(n - 1)]
        pairs = spark.createDataFrame(chain, "id_a long, id_b long")
        star = _clusters(duplicate_clusters_star(pairs, max_iter=12))
        assert star == {i: 0 for i in range(n)} == _reference_cc(chain)
        label = _clusters(duplicate_clusters(pairs, max_iter=12))
        assert label != star  # the budget that sufficed for star didn't

    def test_multiple_components_and_isolated_shapes(self, spark):
        edges = [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = _clusters(duplicate_clusters_star(pairs))
        assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
                       30: 30, 31: 30}

    def test_reliable_checkpoint_requires_dir(self, spark):
        # must run before any test sets the session checkpoint dir
        # (Spark has no unset); skip if another file got there first
        if spark.sparkContext.getCheckpointDir() is not None:
            pytest.skip("checkpoint dir already configured in session")
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        with pytest.raises(ValueError, match="checkpoint"):
            duplicate_clusters_star(pairs, use_reliable_checkpoint=True)

    def test_reliable_checkpoint_mode(self, spark, tmp_path):
        sc = spark.sparkContext
        prev = sc.getCheckpointDir()
        sc.setCheckpointDir(str(tmp_path / "ckpt"))
        try:
            pairs = spark.createDataFrame(
                [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
            )
            got = _clusters(
                duplicate_clusters_star(
                    pairs, use_reliable_checkpoint=True
                )
            )
            assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
        finally:
            if prev:
                sc.setCheckpointDir(prev)


class TestReviewRegressions:
    """Pins for the r4 review findings."""

    def test_max_iter_exhaustion_one_row_per_id(self, spark):
        """Early stop mid-contraction must degrade to one (possibly
        unconverged) label per id — never duplicate rows."""
        n = 60
        chain = [(i, i + 1) for i in range(n - 1)]
        pairs = spark.createDataFrame(chain, "id_a long, id_b long")
        got = duplicate_clusters_star(pairs, max_iter=1)
        rows = got.collect()
        assert len(rows) == n
        assert len({r["id"] for r in rows}) == n

    def test_self_pair_only_id_gets_singleton_label(self, spark):
        pairs = spark.createDataFrame(
            [(5, 5), (1, 2)], "id_a long, id_b long"
        )
        got = _clusters(duplicate_clusters_star(pairs))
        assert got == {5: 5, 1: 1, 2: 1}


class TestClusterRepresentatives:
    def test_keep_best_with_tiebreak(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            cluster_representatives,
        )

        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
            "id long, cluster_id long",
        )
        scores = spark.createDataFrame(
            # cluster 1: 2 and 3 tie at 9 -> keep 2 (smaller id);
            # cluster 7: 8 wins outright
            [(1, 5), (2, 9), (3, 9), (7, 1), (8, 4)],
            "id long, score long",
        )
        got = {
            r["cluster_id"]: (r["keep_id"], r["keep_score"])
            for r in cluster_representatives(clusters, scores).collect()
        }
        assert got == {1: (2, 9), 7: (8, 4)}

    def test_string_ids_tiebreak_deterministic(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            cluster_representatives,
        )

        clusters = spark.createDataFrame(
            [("u-b", "u-a"), ("u-a", "u-a"), ("u-c", "u-a")],
            "id string, cluster_id string",
        )
        scores = spark.createDataFrame(
            [("u-a", 3.0), ("u-b", 7.0), ("u-c", 7.0)],
            "id string, score double",
        )
        got = cluster_representatives(clusters, scores).collect()
        assert len(got) == 1
        assert got[0]["keep_id"] == "u-b"  # tie at 7.0 -> smaller id

    def test_missing_score_raises_loudly(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            cluster_representatives,
        )

        clusters = spark.createDataFrame(
            [(1, 1), (2, 1)], "id long, cluster_id long"
        )
        scores = spark.createDataFrame([(1, 5.0)], "id long, score double")
        with pytest.raises(Exception, match="no score for id"):
            cluster_representatives(clusters, scores).collect()
