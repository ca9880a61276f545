"""Zero-row robustness: an empty day / empty batch is routine in
production (new chain, quiet hour, first run) — every operator must
return an empty, correctly-schemaed result, not raise."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _empty(spark, fields):
    return spark.createDataFrame([], StructType([
        StructField(n, t, True) for n, t in fields
    ]))


class TestEmptyInputs:
    def test_temporal_joins(self, spark):
        from datawaves_etl_airflow_spark.operators.temporal import (
            asof_join,
            asof_join_bucketed,
            bucketed_range_join,
        )

        left = _empty(spark, [("id", LongType()), ("key", StringType()),
                              ("ts", TimestampType())])
        right = _empty(spark, [("key", StringType()),
                               ("rts", TimestampType()),
                               ("val", DoubleType())])
        out = asof_join(left, right, "key", "ts", "rts", ["val"])
        assert out.count() == 0 and "val" in out.columns
        out = asof_join_bucketed(left, right, "key", "ts", "rts", ["val"], 60)
        assert out.count() == 0 and "val" in out.columns
        facts = _empty(spark, [("ts", TimestampType())])
        ranges = _empty(spark, [("start", TimestampType()),
                                ("end", TimestampType())])
        assert bucketed_range_join(
            facts, "ts", ranges, "start", "end", 3600
        ).count() == 0

    def test_llm_text_and_packing(self, spark):
        from datawaves_etl_airflow_spark.operators import text
        from datawaves_etl_airflow_spark.operators.sampling import (
            pack_sequences,
        )

        docs = _empty(spark, [("doc_id", LongType()), ("text", StringType())])
        assert text.text_stats(docs).count() == 0
        assert text.quality_logit(docs).count() == 0
        out = pack_sequences(docs, 512, F.pmod(F.col("doc_id"), F.lit(8)))
        assert out.count() == 0
        assert out.columns == [
            "doc_id", "shard", "n_tokens", "offset", "seq_start", "seq_end",
        ]

    def test_dedup_and_similarity(self, spark):
        from datawaves_etl_airflow_spark.operators import dedup, similarity

        docs = _empty(spark, [("doc_id", LongType()), ("text", StringType())])
        sets = dedup.word_shingle_hash_sets(docs)
        assert dedup.minhash_band_rows(sets).count() == 0
        vecs = _empty(spark, [
            ("vec_id", LongType()),
            ("embedding", ArrayType(FloatType())),
        ])
        assert similarity.quantize_embeddings_int8(vecs).count() == 0

    def test_scd2_empty_updates_is_identity(self, spark):
        from datawaves_etl_airflow_spark.operators.scd import scd2_apply

        dim = spark.createDataFrame(
            [(1, "a", dt.datetime(2020, 1, 1), None)],
            StructType([
                StructField("k", LongType()),
                StructField("attr", StringType()),
                StructField("valid_from", TimestampType()),
                StructField("valid_to", TimestampType()),
            ]),
        )
        upd = _empty(spark, [("k", LongType()), ("attr", StringType()),
                             ("eff", TimestampType())])
        out = scd2_apply(dim, upd, "k", ["attr"], "eff")
        assert [tuple(r) for r in out.collect()] == [
            (1, "a", dt.datetime(2020, 1, 1), None)
        ]


class TestEmptyInputsR11:
    """Zero-row robustness for the r11 operator additions."""

    def _docs(self, spark):
        return _empty(spark, [
            ("doc_id", LongType()), ("text", StringType()),
            ("source", StringType()), ("lang", StringType()),
        ])

    def test_source_overlap(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            source_overlap,
        )

        out = source_overlap(self._docs(spark))
        assert out.count() == 0
        assert out.columns == [
            "source_a", "source_b", "n_shared", "jaccard",
        ]

    def test_jaccard_join_prefix(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            jaccard_join_prefix,
        )

        assert jaccard_join_prefix(self._docs(spark)).count() == 0

    def test_bpe(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bpe_pair_counts,
            train_bpe_merges,
        )

        assert bpe_pair_counts(self._docs(spark), top_n=5).count() == 0
        assert train_bpe_merges(self._docs(spark), n_merges=3) == []

    def test_compression_ratio(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            compression_ratio,
        )

        out = compression_ratio(self._docs(spark))
        assert out.count() == 0
        assert out.columns == ["id", "n_bytes", "n_compressed", "ratio"]

    def test_hard_negatives(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            mine_hard_negatives,
        )

        queries = _empty(spark, [
            ("query_id", LongType()), ("query_text", StringType()),
        ])
        qrels = _empty(spark, [
            ("query_id", LongType()), ("doc_id", LongType()),
            ("rel", LongType()),
        ])
        out = mine_hard_negatives(self._docs(spark), queries, qrels)
        assert out.count() == 0

    def test_epoch_upsample_and_mixture(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            epoch_upsample,
            execute_mixture,
        )

        d = self._docs(spark).select("doc_id", "source")
        assert epoch_upsample(d, "source", {"web": 5}).count() == 0
        assert execute_mixture(d, "source", 10, alpha=0).count() == 0

    def test_corpus_stats_empty_card(self, spark):
        from datawaves_etl_airflow_spark.operators.profile import (
            corpus_stats,
        )

        # the one-row card still materializes on an empty corpus —
        # zeros and NULLs, never a raise or a vanished card
        r = corpus_stats(self._docs(spark)).collect()
        assert len(r) == 1
        assert r[0]["n_docs"] == 0 and r[0]["n_tokens"] == 0
        assert r[0]["mean_doc_tokens"] is None
        assert r[0]["n_sources"] == 0 and r[0]["top_source"] is None


class TestEmptyInputsR12:
    """Zero-row robustness for the r12 operators: empty in, empty
    (never crash, never a vanished schema) out."""

    def _empty_docs(self, spark):
        return spark.createDataFrame([], "doc_id long, text string")

    def test_gopher_both_rule_sets(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            gopher_quality_flags,
            gopher_repetition_flags,
        )

        assert gopher_quality_flags(self._empty_docs(spark)).count() == 0
        df = gopher_repetition_flags(self._empty_docs(spark))
        assert df.count() == 0
        assert "pass_repetition" in df.columns

    def test_c4_clean(self, spark):
        from datawaves_etl_airflow_spark.operators.text import c4_clean

        assert c4_clean(self._empty_docs(spark)).count() == 0

    def test_bpe_encode_and_vocab(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bpe_encode,
            bpe_vocab,
        )

        assert bpe_encode(self._empty_docs(spark), [("a", "b")]).count() == 0
        # empty corpus -> empty alphabet -> vocab is merge outputs only,
        # ids from 0 (the convention degrades gracefully)
        v = bpe_vocab(self._empty_docs(spark), [("a", "b")]).collect()
        assert [(r["token"], r["token_id"]) for r in v] == [("ab", 0)]

    def test_contrastive_pairs(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            build_contrastive_pairs,
        )

        q = spark.createDataFrame([], "query_id long, doc_id long, rel long")
        n = spark.createDataFrame(
            [], "query_id long, doc_id long, neg_rank long"
        )
        assert build_contrastive_pairs(q, n).count() == 0

    def test_pack_sequences_token_col(self, spark):
        from pyspark.sql import functions as F

        from datawaves_etl_airflow_spark.operators.sampling import (
            pack_sequences,
        )

        d = spark.createDataFrame([], "doc_id long, n_tokens long")
        assert pack_sequences(
            d, budget=8, shard_col=F.lit(0), n_tokens_col="n_tokens"
        ).count() == 0


class TestEmptyInputsR13:
    """Empty-input pins for the r13 operators (the standing per-round
    convention): empty frames flow through, never crash."""

    def _empty_docs(self, spark):
        return spark.createDataFrame([], "doc_id long, text string")

    def test_exact_substr_against_corpus(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            exact_substr_against_corpus,
        )
        from pyspark.sql import functions as F

        empty = self._empty_docs(spark)
        full = spark.createDataFrame(
            [(1, "some corpus words live here")],
            "doc_id long, text string",
        )
        for method in ("grams", "anchors"):
            # empty batch → empty output
            assert exact_substr_against_corpus(
                empty, full, min_run_words=5, method=method
            ).count() == 0
            # empty corpus → batch passes through untouched
            out = exact_substr_against_corpus(
                full, empty, min_run_words=5, method=method
            ).first()
            assert out["n_words_removed"] == 0
            assert out["n_words_kept"] == 5

    def test_duplicated_gram_sites(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            duplicated_gram_sites,
        )

        assert duplicated_gram_sites(
            self._empty_docs(spark), min_run_words=5
        ).count() == 0

    def test_hashed_ngram_features_and_logit(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            hashed_ngram_features,
            hashed_ngram_logit,
        )

        empty = self._empty_docs(spark)
        assert hashed_ngram_features(empty, dim=64).count() == 0
        w = spark.createDataFrame([], "fid long, weight double")
        assert hashed_ngram_logit(empty, w, 0.0, dim=64).count() == 0

    def test_trainers_raise_loudly(self, spark):
        import pytest as _pytest

        from datawaves_etl_airflow_spark.operators.text import (
            train_hashed_ngram_classifier,
            train_quality_classifier,
        )

        d = spark.createDataFrame([], "doc_id long, text string, label int")
        with _pytest.raises(ValueError):
            train_quality_classifier(d)
        with _pytest.raises(ValueError):
            train_hashed_ngram_classifier(d)
