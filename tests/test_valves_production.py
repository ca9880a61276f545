"""operators.valves production operating points: with every skew valve
set to its recommended cap, each banded/bucketed operator returns
results IDENTICAL to its exact (unvalved, oracle-replayable) form on
the planted driver constructions — the caps sit three orders of
magnitude above healthy bucket sizes, so they only ever fire on
degenerate crowds (whose behavior is pinned by the per-operator skew
tests, e.g. test_advice_r6 / test_semantic_dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators import dedup, similarity
from datawaves_etl_airflow_spark.operators.valves import (
    PRODUCTION_VALVES,
    recommended,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return d.unionAll(
        d.withColumn("doc_id", F.col("doc_id") + F.lit(100000))
    )


def _planted_embs(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            i == 0, x.cast("double") * F.lit(1.2)
        ).otherwise(x.cast("double")),
    )
    return e.select("vec_id", as_double.alias("embedding")).unionByName(
        e.select(
            (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
            perturbed.alias("embedding"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestRecommendedLookups:
    def test_known_pairs(self):
        assert recommended("semantic_dedup", "max_cell_size") == 10_000
        assert recommended("lsh_topk", "max_bucket_size") == 10_000
        with pytest.raises(KeyError):
            recommended("semantic_dedup", "max_cellsize")  # typo → loud

    def test_every_valve_positive(self):
        assert all(v > 0 for v in PRODUCTION_VALVES.values())


class TestValvedEqualsExact:
    def test_minhash_pairs(self, spark):
        docs = _docs(spark)
        exact = dedup.minhash_dedup_pairs(docs, threshold=0.5)
        valved = dedup.minhash_dedup_pairs(
            docs,
            threshold=0.5,
            max_docs_per_band=recommended(
                "minhash_dedup_pairs", "max_docs_per_band"
            ),
        )
        assert _rows(valved) == _rows(exact)

    def test_neardup_banded(self, spark):
        embs = _planted_embs(spark)
        exact = similarity.neardup_pairs_banded(
            embs, dim=64, threshold=0.95
        )
        valved = similarity.neardup_pairs_banded(
            embs,
            dim=64,
            threshold=0.95,
            max_docs_per_band=recommended(
                "neardup_pairs_banded", "max_docs_per_band"
            ),
        )
        assert _rows(valved) == _rows(exact)

    def test_lsh_topk(self, spark):
        embs = _planted_embs(spark)
        qs = embs.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        exact = similarity.lsh_topk(embs, qs, dim=64, k=5)
        valved = similarity.lsh_topk(
            embs,
            qs,
            dim=64,
            k=5,
            max_bucket_size=recommended("lsh_topk", "max_bucket_size"),
        )
        assert _rows(valved) == _rows(exact)

    def test_semantic_dedup(self, spark):
        embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        corpus = embs.unionByName(
            embs.select(
                (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
                "embedding",
            )
        )
        exact = similarity.semantic_dedup(
            corpus, n_centroids=16, threshold=0.999, n_iters=1
        )
        valved = similarity.semantic_dedup(
            corpus,
            n_centroids=16,
            threshold=0.999,
            n_iters=1,
            max_cell_size=recommended("semantic_dedup", "max_cell_size"),
        )
        assert _rows(valved) == _rows(exact)
        # and the planted-oracle booleans hold on the valved form
        kept = {r["vec_id"]: r["kept"] for r in valved.collect()}
        assert all(kept[i] for i in kept if i < 100000)
        assert not any(kept[i] for i in kept if i >= 100000)


class TestBm25MaxDfRatio:
    """bm25_topk.max_df_ratio = 0.5 (r10): the one valve with a
    DOCUMENTED score-contract change when it fires — dropped
    stopword-grade query terms contribute nothing, so the valved
    ranking is BM25 over the informative terms only. Pins: identity
    when no query term crosses the cutoff, the drop contract when one
    does, and that the persisted-index probe applies the same rule."""

    def _corpus(self, spark):
        # 'the' in every doc (df ratio 1.0 — the valve's target);
        # unique{i} and topic{i%3} stay far below 0.5
        return spark.createDataFrame(
            [
                (i, f"the document unique{i} covers topic{i % 3} deeply")
                for i in range(40)
            ],
            "doc_id long, text string",
        )

    def test_identity_below_cutoff(self, spark):
        from datawaves_etl_airflow_spark.operators import text

        docs = self._corpus(spark)
        qs = spark.createDataFrame(
            [(1, "unique3 topic0"), (2, "topic1 deeply")],
            "query_id long, query_text string",
        )
        # 'deeply' is in every doc too — use only sub-cutoff terms
        qs = qs.filter(F.col("query_id") == 1)
        exact = text.bm25_topk(docs, qs, k=5)
        valved = text.bm25_topk(
            docs, qs, k=5,
            max_df_ratio=recommended("bm25_topk", "max_df_ratio"),
        )
        assert _rows(valved) == _rows(exact)

    def test_drop_contract_above_cutoff(self, spark):
        """A query mixing 'the' (df 1.0) with 'unique7': the valved
        score must equal the unvalved score of the informative term
        alone — the documented dropped-terms-contribute-nothing rule."""
        from datawaves_etl_airflow_spark.operators import text

        docs = self._corpus(spark)
        mixed = spark.createDataFrame(
            [(1, "the unique7")], "query_id long, query_text string"
        )
        informative = spark.createDataFrame(
            [(1, "unique7")], "query_id long, query_text string"
        )
        valved = text.bm25_topk(
            docs, mixed, k=5,
            max_df_ratio=recommended("bm25_topk", "max_df_ratio"),
        )
        want = text.bm25_topk(docs, informative, k=5)
        assert _rows(valved) == _rows(want)
        # and without the valve the hot term spreads score mass over
        # every document (sanity: the contract change is real)
        unvalved = text.bm25_topk(docs, mixed, k=5)
        assert unvalved.count() == 5 and valved.count() < 5 or \
            _rows(unvalved) != _rows(valved)

    def test_index_probe_applies_same_rule(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators import text

        docs = self._corpus(spark)
        p = str(tmp_path / "bmvalve")
        text.write_bm25_index(docs, p, n_buckets=8)
        mixed = spark.createDataFrame(
            [(1, "the unique7")], "query_id long, query_text string"
        )
        ratio = recommended("bm25_topk", "max_df_ratio")
        got = text.bm25_search_index(mixed, p, k=5, max_df_ratio=ratio)
        want = text.bm25_topk(docs, mixed, k=5, max_df_ratio=ratio)
        assert _rows(got) == _rows(want)


class TestR11Valves:
    """The r11 valves at their recommended caps: identical to the
    exact form on healthy corpora (the caps only fire on degenerate
    crowds — pinned separately in each operator's own skew test)."""

    def test_jaccard_prefix_valved_equals_exact(self, spark):
        d = _docs(spark)
        exact = sorted(
            map(
                tuple,
                dedup.jaccard_join_prefix(d, threshold=0.5).collect(),
            )
        )
        valved = sorted(
            map(
                tuple,
                dedup.jaccard_join_prefix(
                    d,
                    threshold=0.5,
                    max_docs_per_token=int(
                        recommended(
                            "jaccard_join_prefix", "max_docs_per_token"
                        )
                    ),
                ).collect(),
            )
        )
        assert valved == exact and len(exact) > 0

    def test_source_overlap_valved_equals_exact(self, spark):
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        exact = sorted(
            map(tuple, dedup.source_overlap(d).collect())
        )
        valved = sorted(
            map(
                tuple,
                dedup.source_overlap(
                    d,
                    max_sources_per_shingle=int(
                        recommended(
                            "source_overlap", "max_sources_per_shingle"
                        )
                    ),
                ).collect(),
            )
        )
        assert valved == exact and len(exact) > 0


class TestHardNegativesMaxDfRatio:
    """mine_hard_negatives.max_df_ratio = 0.5 (r12): hard-negative
    mining rides bm25's probe tree, so its valve is the SAME stopword
    judgment — pinned as a true PASS-THROUGH: the valved mine equals
    the _hard_negatives post-processing of the valved retrieval, the
    persisted-index form applies the same rule, and the registry
    carries bm25's value (the 100x decade measured 11.6x unvalved vs
    7.6x valved — SCALE.md hard_negatives_probe_pruned)."""

    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (i, f"the document unique{i} covers topic{i % 3} deeply")
                for i in range(40)
            ],
            "doc_id long, text string",
        )

    def _qrels(self, spark):
        # doc 7 judged positive for the query — it must be excluded
        return spark.createDataFrame(
            [(1, 7, 1)], "query_id long, doc_id long, rel long"
        )

    def test_registry_matches_bm25(self):
        assert recommended(
            "mine_hard_negatives", "max_df_ratio"
        ) == recommended("bm25_topk", "max_df_ratio")

    def test_valve_passes_through_to_probe(self, spark):
        from datawaves_etl_airflow_spark.operators import text

        docs = self._corpus(spark)
        qs = spark.createDataFrame(
            [(1, "the unique7 topic1")],
            "query_id long, query_text string",
        )
        ratio = recommended("mine_hard_negatives", "max_df_ratio")
        mined = text.mine_hard_negatives(
            docs, qs, self._qrels(spark), n_negatives=5, depth=10,
            max_df_ratio=ratio,
        )
        # the composition the operator promises: valved retrieval,
        # then the shared post-processing — value-identical
        hits = text.bm25_topk(docs, qs, k=10, max_df_ratio=ratio)
        expect = text._hard_negatives(
            hits, self._qrels(spark), 5, "query_id", "doc_id", "rel"
        )
        assert _rows(mined) == _rows(expect)
        # and the valve FIRED: 'the' (df 1.0) contributes nothing, so
        # the valved mine differs from the unvalved one
        unvalved = text.mine_hard_negatives(
            docs, qs, self._qrels(spark), n_negatives=5, depth=10
        )
        assert _rows(mined) != _rows(unvalved)

    def test_index_form_applies_same_rule(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators import text

        docs = self._corpus(spark)
        qs = spark.createDataFrame(
            [(1, "the unique7 topic1")],
            "query_id long, query_text string",
        )
        ratio = recommended("mine_hard_negatives", "max_df_ratio")
        p = str(tmp_path / "hnidx")
        text.write_bm25_index(docs, p, n_buckets=8)
        mined_idx = text.mine_hard_negatives_index(
            qs, self._qrels(spark), p, n_negatives=5, depth=10,
            max_df_ratio=ratio,
        )
        mined = text.mine_hard_negatives(
            docs, qs, self._qrels(spark), n_negatives=5, depth=10,
            max_df_ratio=ratio,
        )
        assert _rows(mined_idx) == _rows(mined)


class TestR13ExactSubstrValve:
    """exact_substring_dedup family: production cap identical to the
    unvalved (default-None, oracle-faithful) form on healthy corpora;
    registry carries the r13 value."""

    def test_registry(self):
        from datawaves_etl_airflow_spark.operators.valves import (
            recommended,
        )

        assert recommended(
            "exact_substring_dedup", "max_sites_per_anchor"
        ) == 10_000

    def test_valved_equals_exact(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            exact_substring_dedup,
        )
        from datawaves_etl_airflow_spark.operators.valves import (
            recommended,
        )

        span = "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"
        d = spark.createDataFrame(
            [
                (1, f"first document carries {span} and more text"),
                (2, f"second document carries {span} differently put"),
                (3, "third document shares nothing with the others"),
            ],
            "doc_id long, text string",
        )
        cap = recommended("exact_substring_dedup", "max_sites_per_anchor")
        exact = {
            r["id"]: (r["text_dedup"], r["n_words_removed"])
            for r in exact_substring_dedup(
                d, min_run_words=12, method="anchors"
            ).collect()
        }
        valved = {
            r["id"]: (r["text_dedup"], r["n_words_removed"])
            for r in exact_substring_dedup(
                d,
                min_run_words=12,
                method="anchors",
                max_sites_per_anchor=cap,
            ).collect()
        }
        assert exact == valved
        # the shared run is "document carries" + the 12-word span
        assert exact[2][1] == 14


class TestR14BucketPairsBoundary:
    """r14 (r13 verdict "what's wrong #3"): bucket_pairs rejects
    silent unbounded use, and the new simhash chunk valve is
    identity-preserving at its recommended production value."""

    def test_unbounded_requires_acknowledgement(self, spark):
        df = spark.createDataFrame(
            [(1, 7), (2, 7)], "id long, b long"
        )
        with pytest.raises(ValueError, match="max_per_bucket"):
            dedup.bucket_pairs(df, ["b"], ["id"])
        # explicit acknowledgement keeps exact semantics available
        got = dedup.bucket_pairs(
            df, ["b"], ["id"], allow_unbounded=True
        ).collect()
        assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]

    def test_simhash_chunk_valve_identity(self, spark):
        docs = _docs(spark)
        sigs = dedup.simhash_signatures(docs)
        exact = dedup.simhash_candidate_pairs(sigs)
        valved = dedup.simhash_candidate_pairs(
            sigs,
            max_docs_per_chunk=recommended(
                "simhash_candidate_pairs", "max_docs_per_chunk"
            ),
        )
        assert _rows(valved) == _rows(exact)
