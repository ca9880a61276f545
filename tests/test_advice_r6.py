"""Round-6 hardening pins — the r5 ADVICE findings plus the verdict's
data-shape/scale-evidence tasks:

1. replay-after-compaction duplication window: compactions record the
   folded batch tokens in the manifest payload and appends no-op for
   them (MinHash and IVF);
2. _SUCCESS validation on BOTH written directories of an index build
   (bands+sets / cells+centroids), matching the compaction's
   both-sides completeness rule;
3. explicit queries-side broadcast in brute_force_topk /
   knn_label_predict (a bare crossJoin above the auto-broadcast
   threshold degrades to a cartesian shuffle of the corpus);
4. degenerate-cluster skew valves on the embedding sign-LSH band joins
   (neardup_pairs_banded.max_docs_per_band, lsh_topk.max_bucket_size)
   — the embedding twins of minhash_dedup_pairs' valve;
5. index-backed kNN label eval (knn_label_predict_index): at full
   probe it is bit-identical to the brute-force form;
6. manifest commit-path seam isolation: the whole persisted-index
   lifecycle never touches the rename-based marker writer, so S3
   conditional-write (If-None-Match) semantics slot in by swapping
   the one create-if-absent primitive.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators import similarity
from datawaves_etl_airflow_spark.operators.dedup import (
    append_minhash_index,
    compact_minhash_index,
    dedup_against_index,
    write_minhash_index,
)
from datawaves_etl_airflow_spark.operators.similarity import (
    append_ivf_index,
    brute_force_topk,
    compact_ivf_index,
    ivf_search_index,
    knn_label_predict,
    knn_label_predict_index,
    lsh_topk,
    neardup_pairs,
    neardup_pairs_banded,
    write_ivf_index,
)
from datawaves_etl_airflow_spark.sources import fs as fs_mod
from datawaves_etl_airflow_spark.sources.manifest import VersionedManifest

DIM = 16

TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog again today"),
    (2, "pack my box with five dozen liquor jugs before noon strikes"),
    (3, "sphinx of black quartz judge my vow said the old man"),
]


def _docs(spark, rows=TEXTS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vectors(spark, n=120, seed=11):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _labeled(spark, n=120, seed=11):
    return _vectors(spark, n, seed).withColumn(
        "label", (F.col("vec_id") % 3).cast("bigint")
    )


class TestFoldedTokenReplayGuard:
    """ADVICE r5 (medium): a fold whose _SUCCESS markers landed but
    whose stream marker did not is baked into batch=base by a
    compaction; the restart's replay must NOT re-append it into the
    new version."""

    def test_minhash_replay_after_compaction_is_noop(self, spark, tmp_path):
        p = str(tmp_path / "mh")
        write_minhash_index(_docs(spark), p)
        day = _docs(
            spark,
            [(10, "the quick brown fox jumps over the lazy dog again today!")],
        )
        append_minhash_index(day, p, batch_token="b7")
        assert compact_minhash_index(spark, p) is True
        version, payload = VersionedManifest(p).resolve(spark)
        assert payload["folded"] == ["b7"]

        probe = _docs(
            spark,
            [(99, "the quick brown fox jumps over the lazy dog again today")],
        )

        def pairs():
            return sorted(
                (r["id_a"], r["id_b"])
                for r in dedup_against_index(probe, p, threshold=0.5).collect()
            )

        before = pairs()
        assert (99, 10) in before and (99, 1) in before
        # the crashed ingest restarts and replays the folded batch:
        # must be a durable no-op — no batch=b7 dir in the new version,
        # identical probe results (duplicate band/set rows would
        # change candidate multiplicity before distinct and, worse,
        # duplicate verify rows)
        append_minhash_index(day, p, batch_token="b7")
        from datawaves_etl_airflow_spark.operators.dedup import (
            _resolve_minhash_index,
        )

        root = _resolve_minhash_index(spark, p)[1]
        assert fs_mod.glob_paths(spark, root + "/bands/batch=b7") == []
        assert pairs() == before
        # an UNSEEN token still appends normally
        append_minhash_index(
            _docs(spark, [(11, "completely new corpus text nothing shared")]),
            p,
            batch_token="b8",
        )
        assert fs_mod.glob_paths(spark, root + "/bands/batch=b8") != []

    def test_minhash_folded_tokens_accumulate_across_compactions(
        self, spark, tmp_path
    ):
        p = str(tmp_path / "mh2")
        write_minhash_index(_docs(spark), p)
        append_minhash_index(
            _docs(spark, [(10, "alpha beta gamma delta epsilon zeta")]),
            p,
            batch_token="b1",
        )
        assert compact_minhash_index(spark, p)
        append_minhash_index(
            _docs(spark, [(11, "eta theta iota kappa lambda mu")]),
            p,
            batch_token="b2",
        )
        assert compact_minhash_index(spark, p)
        _, payload = VersionedManifest(p).resolve(spark)
        assert payload["folded"] == ["b1", "b2"]

    def test_ivf_replay_after_compaction_is_noop(self, spark, tmp_path):
        p = str(tmp_path / "ivf")
        vecs = _vectors(spark)
        write_ivf_index(
            vecs.filter(F.col("vec_id") < 100), p, n_centroids=4, n_iters=1
        )
        day = vecs.filter(F.col("vec_id") >= 100)
        append_ivf_index(day, p, batch_token="d1")
        assert compact_ivf_index(spark, p) is True
        _, payload = VersionedManifest(p).resolve(spark)
        assert payload["folded"] == ["d1"]
        qs = vecs.filter(F.col("vec_id") >= 100).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        # replayed fold: no new batch dir, every query still sees its
        # exact copy exactly once (a duplicated cell row would surface
        # as a duplicate match_id at rank 1/2)
        append_ivf_index(day, p, batch_token="d1")
        root = similarity._resolve_ivf_index(spark, p)[1]
        assert fs_mod.glob_paths(spark, root + "/cells/batch=d1") == []
        top = ivf_search_index(qs, p, nprobe=4, k=2).filter(
            (F.col("query_id") == F.col("match_id"))
        )
        per_query = top.groupBy("query_id").count().collect()
        assert per_query and all(r["count"] == 1 for r in per_query)


class TestBuildMarkerSymmetry:
    """ADVICE r5 (low): the build validates _SUCCESS on BOTH written
    directories, not just the first — a committer dropping markers
    per-output must fail at build time."""

    def test_minhash_build_checks_sets_side(self, spark, tmp_path, monkeypatch):
        real = fs_mod.path_exists

        def missing_sets_marker(s, path):
            if path.endswith("_SUCCESS") and "/sets/batch=base/" in path:
                return False
            return real(s, path)

        monkeypatch.setattr(fs_mod, "path_exists", missing_sets_marker)
        with pytest.raises(RuntimeError, match="MinHash index build"):
            write_minhash_index(_docs(spark), str(tmp_path / "m"))

    def test_ivf_build_checks_centroids_side(self, spark, tmp_path, monkeypatch):
        real = fs_mod.path_exists

        def missing_centroid_marker(s, path):
            if path.endswith("_SUCCESS") and "/centroids/" in path:
                return False
            return real(s, path)

        monkeypatch.setattr(fs_mod, "path_exists", missing_centroid_marker)
        with pytest.raises(RuntimeError, match="IVF index build"):
            write_ivf_index(
                _vectors(spark), str(tmp_path / "i"), n_centroids=4, n_iters=1
            )


class TestQueriesSideBroadcast:
    """ADVICE r5 (low): the bounded query set must carry an explicit
    broadcast hint — with auto-broadcast disabled, the physical plan
    still replicates the query side instead of shuffling the corpus
    cartesian-style."""

    @pytest.fixture()
    def no_auto_broadcast(self, spark):
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        yield
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def _qs(self, spark):
        return _vectors(spark, n=3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

    def test_brute_force_topk_broadcasts_queries(self, spark, no_auto_broadcast):
        plan = brute_force_topk(
            _vectors(spark), self._qs(spark), k=2
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan

    def test_knn_label_predict_broadcasts_queries(self, spark, no_auto_broadcast):
        qs = self._qs(spark).withColumn(
            "true_label", F.lit(0).cast("bigint")
        )
        plan = knn_label_predict(
            _labeled(spark), qs, k=2
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan


def _degenerate(spark, n_crowd=300, n_normal=40):
    """A failed-embedding-job corpus: n_crowd identical vectors (one
    bucket in EVERY band) + a normal tail."""
    crowd = spark.range(n_crowd).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i % 3 - 1)) for i in range(DIM)]).alias(
            "embedding"
        ),
    )
    normal = _vectors(spark, n_normal).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    return crowd.unionByName(normal)


class TestEmbeddingSkewValves:
    def test_neardup_valve_bounds_candidates_on_degenerate_corpus(
        self, spark
    ):
        df = _degenerate(spark)
        # valved: the 300-doc crowd exceeds the cap in every band, so
        # its ~45k intra-crowd pairs never reach the verify join —
        # only the normal tail's (empty) near-dup set remains
        got = neardup_pairs_banded(
            df, dim=DIM, threshold=0.95, max_docs_per_band=50
        )
        assert got.count() == 0
        # and the windowed count really drops the crowd pre-join:
        # crank the cap above the crowd and the pairs reappear
        full = neardup_pairs_banded(
            df, dim=DIM, threshold=0.95, max_docs_per_band=1000
        )
        assert full.count() == 300 * 299 // 2

    def test_neardup_valve_off_path_unchanged(self, spark):
        """Cap above every real bucket ≡ no cap ≡ exact all-pairs (the
        oracle-pinned equivalence must survive the valve)."""
        df = _vectors(spark, n=60).withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
        )
        base = neardup_pairs(df, threshold=0.5)
        valved = neardup_pairs_banded(
            df, dim=DIM, threshold=0.5, n_bands=24, band_bits=4,
            max_docs_per_band=10_000,
        )
        cols = ["id_a", "id_b", "cosine_sim"]
        assert valved.select(cols).exceptAll(base.select(cols)).count() == 0
        assert base.select(cols).exceptAll(valved.select(cols)).count() == 0

    def test_lsh_topk_valve_is_exact_for_identical_crowd(self, spark):
        """The cap keeps the smallest-id rows per bucket — for an
        identical-vector crowd (cosine ties broken by id ASC) that is
        precisely what exact top-k returns, so valved results equal
        brute force even while the bucket join touches ≤ cap rows."""
        df = _degenerate(spark)
        qs = df.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got = lsh_topk(
            df, qs, dim=DIM, k=5, n_planes=6, max_bucket_size=20
        )
        want = brute_force_topk(df, qs, k=5)
        cols = ["query_id", "match_id", "rank", "cosine_sim"]
        assert got.select(cols).exceptAll(want.select(cols)).count() == 0
        assert want.select(cols).exceptAll(got.select(cols)).count() == 0


class TestKnnLabelPredictIndex:
    def test_full_probe_equals_brute_force(self, spark, tmp_path):
        corpus = _labeled(spark)
        p = str(tmp_path / "knn_ivf")
        write_ivf_index(corpus, p, n_centroids=4, n_iters=1)
        qs = corpus.filter(F.col("vec_id") < 30).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("true_label"),
        )
        got = knn_label_predict_index(corpus, qs, p, k=5, nprobe=4)
        want = knn_label_predict(corpus, qs, k=5)
        cols = ["query_id", "true_label", "pred_label", "correct"]
        assert got.select(cols).exceptAll(want.select(cols)).count() == 0
        assert want.select(cols).exceptAll(got.select(cols)).count() == 0

    def test_reduced_probe_agreement_stays_high(self, spark, tmp_path):
        """nprobe < n_centroids is the scale operating point; pin that
        label agreement with exact kNN stays ≥ 0.8 on the fixture (the
        vote is far more forgiving than raw neighbor recall)."""
        corpus = _labeled(spark, n=200)
        p = str(tmp_path / "knn_ivf2")
        write_ivf_index(corpus, p, n_centroids=8, n_iters=2)
        qs = corpus.filter(F.col("vec_id") < 40).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("true_label"),
        )
        approx = knn_label_predict_index(corpus, qs, p, k=5, nprobe=4)
        exact = knn_label_predict(corpus, qs, k=5)
        agree = (
            approx.select("query_id", "pred_label")
            .join(
                exact.select(
                    "query_id", F.col("pred_label").alias("exact_label")
                ),
                "query_id",
            )
            .select(
                F.avg(
                    (F.col("pred_label") == F.col("exact_label")).cast(
                        "double"
                    )
                ).alias("rate")
            )
            .collect()[0]["rate"]
        )
        assert agree >= 0.8


class TestManifestSeamIsolation:
    """Verdict task #8: the persisted-index commit path must use ONLY
    the create-if-absent primitive — never the rename-based marker
    writer — so S3 conditional writes (If-None-Match) slot in as a
    config change on exactly one seam."""

    def test_index_lifecycle_never_renames_markers(
        self, spark, tmp_path, monkeypatch
    ):
        def forbidden(*a, **k):
            raise AssertionError(
                "rename-based marker write on the index commit path"
            )

        monkeypatch.setattr(fs_mod, "write_text", forbidden)
        monkeypatch.setattr(fs_mod, "_rename", forbidden)

        p = str(tmp_path / "mh")
        write_minhash_index(_docs(spark), p)
        append_minhash_index(
            _docs(spark, [(10, "alpha beta gamma delta epsilon zeta")]),
            p,
            batch_token="b1",
        )
        assert compact_minhash_index(spark, p)
        from datawaves_etl_airflow_spark.operators.dedup import (
            vacuum_minhash_index,
        )

        vacuum_minhash_index(spark, p)

        q = str(tmp_path / "ivf")
        vecs = _vectors(spark, n=60)
        write_ivf_index(vecs, q, n_centroids=4, n_iters=1)
        append_ivf_index(
            _vectors(spark, n=10, seed=99).withColumn(
                "vec_id", F.col("vec_id") + 500
            ),
            q,
            batch_token="d1",
        )
        assert compact_ivf_index(spark, q)
        from datawaves_etl_airflow_spark.operators.similarity import (
            vacuum_ivf_index,
        )

        vacuum_ivf_index(spark, q)
