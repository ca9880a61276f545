"""Round-7 hardening pins — the r6 ADVICE findings:

1. quantile column names preserve decimals (0.29 → q_29 not the
   float-truncated q_28; 0.125 → q_12_5 distinct from 0.12 → q_12)
   and duplicate generated names raise instead of producing an
   ambiguous agg;
2. the streaming near-dup index batch token carries the CHECKPOINT
   identity: a fresh stream (fresh checkpoint + fresh accepted_path)
   pointed at an index another stream already folded must INDEX its
   batches, not silently no-op on the colliding token;
3. knn_label_predict_index row coverage is always |queries| — a query
   whose probed cells yield no non-self candidates comes back with
   NULL pred_label / NULL correct instead of vanishing from the eval;
4. cell_outliers routes all-zero vectors through the NULL-cell
   outlier branch (dedicated pins live in test_cell_outliers*.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.dedup import (
    compact_minhash_index,
    write_minhash_index,
)
from datawaves_etl_airflow_spark.operators.profile import (
    _quantile_col_name,
    grouped_quantiles,
)
from datawaves_etl_airflow_spark.operators.similarity import (
    knn_label_predict_index,
    write_ivf_index,
)
from datawaves_etl_airflow_spark.streaming.ingest import (
    _batch_token,
    make_neardup_ingest,
)


class TestQuantileColumnNames:
    def test_decimal_preserving_names(self):
        assert _quantile_col_name(0.25) == "q_25"
        assert _quantile_col_name(0.5) == "q_50"
        assert _quantile_col_name(0.75) == "q_75"
        # 0.29 * 100 = 28.999999999999996 — int() truncated to q_28
        assert _quantile_col_name(0.29) == "q_29"
        # distinct probabilities must not collide
        assert _quantile_col_name(0.12) == "q_12"
        assert _quantile_col_name(0.125) == "q_12_5"
        assert _quantile_col_name(0.999) == "q_99_9"
        assert _quantile_col_name(0.01) == "q_1"

    def test_grouped_quantiles_emits_preserved_names(self, spark):
        df = spark.createDataFrame(
            [("a", float(v)) for v in range(1, 101)], "g string, v double"
        )
        out = grouped_quantiles(
            df, ["g"], "v", probabilities=[0.12, 0.125, 0.29], mode="exact"
        )
        assert [c for c in out.columns if c.startswith("q_")] == [
            "q_12",
            "q_12_5",
            "q_29",
        ]
        row = out.collect()[0]
        want = df.agg(
            F.percentile("v", 0.12).alias("a"),
            F.percentile("v", 0.125).alias("b"),
            F.percentile("v", 0.29).alias("c"),
        ).collect()[0]
        assert (row["q_12"], row["q_12_5"], row["q_29"]) == (
            want["a"],
            want["b"],
            want["c"],
        )

    def test_duplicate_probabilities_raise(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with pytest.raises(ValueError, match="duplicate quantile column"):
            grouped_quantiles(
                df, ["g"], "v", probabilities=[0.5, 0.5], mode="exact"
            )


class TestCheckpointScopedBatchToken:
    def test_token_forms(self):
        assert _batch_token(None, 3) == "b3"
        a0 = _batch_token("/ck/a", 0)
        assert a0 == _batch_token("/ck/a", 0)  # stable (retry overwrite)
        assert a0 != _batch_token("/ck/b", 0)  # no cross-stream collision
        assert a0 != _batch_token("/ck/a", 1)
        assert a0.startswith("c") and "_b0" in a0

    def test_fresh_stream_on_folded_index_still_indexes(self, spark, tmp_path):
        """The r6 ADVICE scenario: stream A folds its batch 0 into a
        shared index via compaction; stream B starts FRESH (new
        checkpoint, new accepted_path) against the same index. With a
        bare ``b0`` token, B's batch 0 collides with A's folded token
        and the append silently no-ops — B's docs are accepted but
        never indexed, so B's batch 1 near-dup of them sails through.
        Checkpoint-scoped tokens keep the two streams' folds apart."""
        idx = str(tmp_path / "idx")
        seed = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog again today")],
            "doc_id long, text string",
        )
        write_minhash_index(seed, idx)

        acc_a = str(tmp_path / "acc_a")
        fn_a = make_neardup_ingest(
            idx, acc_a, threshold=0.5, checkpoint=str(tmp_path / "ck_a")
        )
        fn_a(
            spark.createDataFrame(
                [(10, "pack my box with five dozen liquor jugs before noon")],
                "doc_id long, text string",
            ),
            0,
        )
        assert compact_minhash_index(spark, idx) is True  # folds A's b0

        acc_b = str(tmp_path / "acc_b")
        fn_b = make_neardup_ingest(
            idx, acc_b, threshold=0.5, checkpoint=str(tmp_path / "ck_b")
        )
        fn_b(
            spark.createDataFrame(
                [(20, "sphinx of black quartz judge my vow said the old man")],
                "doc_id long, text string",
            ),
            0,  # batch ids restart at 0 under B's fresh checkpoint
        )
        # B's batch 1 carries a near-dup of B's OWN batch-0 doc: it is
        # only droppable if batch 0 actually reached the index
        fn_b(
            spark.createDataFrame(
                [
                    (21, "sphinx of black quartz judge my vow said the old man!"),
                    (22, "completely fresh unrelated content with no peer at all"),
                ],
                "doc_id long, text string",
            ),
            1,
        )
        accepted_b = sorted(
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(acc_b, "docs")).collect()
        )
        assert accepted_b == [20, 22]  # 21 dropped → B's b0 WAS indexed


class TestKnnIndexEvalRowCoverage:
    def test_uncovered_query_emits_null_prediction(self, spark, tmp_path):
        """Two singleton cells; a corpus-drawn query probing only its
        own cell (nprobe=1) finds nothing but itself after the
        leave-one-out self-drop. It must still appear in the output,
        with NULL pred_label / NULL correct — not vanish and shrink
        the eval denominator."""
        path = str(tmp_path / "ivf")
        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        write_ivf_index(corpus, path, n_centroids=2, n_iters=1)
        labels = spark.createDataFrame(
            [(1, 7), (2, 9)], "vec_id long, label long"
        )
        queries = spark.createDataFrame(
            [
                # corpus-drawn: own cell holds only itself → no candidates
                (1, [1.0, 0.0, 0.0, 0.0], 7),
                # fresh query near corpus id 2 → predicted label 9
                (100, [0.1, 1.0, 0.0, 0.0], 9),
            ],
            "query_id long, query_vec array<double>, true_label long",
        )
        out = {
            r["query_id"]: r
            for r in knn_label_predict_index(
                labels, queries, path, k=1, nprobe=1
            ).collect()
        }
        assert sorted(out) == [1, 100]  # coverage is ALWAYS |queries|
        assert out[1]["pred_label"] is None
        assert out[1]["correct"] is None
        assert out[1]["true_label"] == 7
        assert (out[100]["pred_label"], out[100]["correct"]) == (9, True)


class TestFoldedTokenPrune:
    """compact_*_index(folded_retention=N): the cumulative folded list
    keeps only the newest N tokens in fold order — the docstring's
    prune promise turned into code. A pruned token's replay through
    the INGEST layer is still refused by the stream's replay marker
    (loudly: a committed batch id can never reappear under one
    checkpoint identity), so pruning never re-opens the
    replay-after-compaction duplication window."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_minhash_retention_keeps_newest_in_fold_order(
        self, spark, tmp_path
    ):
        from datawaves_etl_airflow_spark.operators.dedup import (
            append_minhash_index,
            write_minhash_index,
        )
        from datawaves_etl_airflow_spark.sources.manifest import (
            VersionedManifest,
        )

        p = str(tmp_path / "mh")
        write_minhash_index(
            self._docs(spark, [(1, "alpha beta gamma delta epsilon")]), p
        )
        append_minhash_index(
            self._docs(spark, [(10, "zeta eta theta iota kappa")]),
            p, batch_token="t1",
        )
        assert compact_minhash_index(spark, p) is True
        append_minhash_index(
            self._docs(spark, [(11, "lambda mu nu xi omicron pi")]),
            p, batch_token="t2",
        )
        append_minhash_index(
            self._docs(spark, [(12, "rho sigma tau upsilon phi chi")]),
            p, batch_token="t3",
        )
        assert compact_minhash_index(spark, p, folded_retention=2) is True
        _, payload = VersionedManifest(p).resolve(spark)
        # t1 (oldest) pruned; the two newest kept in fold order
        assert payload["folded"] == ["t2", "t3"]

    def test_retention_validation(self):
        from datawaves_etl_airflow_spark.operators.dedup import (
            _fold_token_list,
        )

        with pytest.raises(ValueError, match="folded_retention"):
            _fold_token_list([], ["a"], 0)
        assert _fold_token_list(["a", "c"], ["b", "a"], None) == [
            "a", "c", "b",
        ]
        assert _fold_token_list(["a", "c"], ["b"], 2) == ["c", "b"]

    def test_pruned_token_replay_refused_by_stream_marker(
        self, spark, tmp_path
    ):
        """After pruning b0's token, replaying batch 0 through the
        ingest layer hits the stream marker's loud refusal (batch_id <
        last committed id) BEFORE any index write — accepted docs and
        probe results unchanged."""
        from datawaves_etl_airflow_spark.operators.dedup import (
            _resolve_minhash_index,
            write_minhash_index,
        )
        from datawaves_etl_airflow_spark.sources import fs as fs_mod

        idx = str(tmp_path / "idx")
        acc = str(tmp_path / "acc")
        ck = str(tmp_path / "ck")
        write_minhash_index(
            self._docs(spark, [(1, "seed corpus text goes right here")]),
            idx,
        )
        fn = make_neardup_ingest(idx, acc, threshold=0.5, checkpoint=ck)
        b0 = self._docs(
            spark, [(10, "first streamed batch document content")]
        )
        fn(b0, 0)
        fn(
            self._docs(
                spark, [(11, "second streamed batch document content!!")]
            ),
            1,
        )
        # both batch tokens folded, then pruned down to the newest one
        assert compact_minhash_index(spark, idx, folded_retention=1)
        from datawaves_etl_airflow_spark.sources.manifest import (
            VersionedManifest,
        )

        _, payload = VersionedManifest(idx).resolve(spark)
        assert len(payload["folded"]) == 1
        tok0 = _batch_token(ck, 0)
        assert tok0 not in payload["folded"]
        # replaying the pruned batch: the STREAM marker refuses loudly
        with pytest.raises(ValueError, match="can never reappear"):
            fn(b0, 0)
        # nothing re-appended: no batch dir reappeared for the pruned
        # token in the live version
        root = _resolve_minhash_index(spark, idx)[1]
        assert (
            fs_mod.glob_paths(spark, root + f"/bands/batch={tok0}") == []
        )

    def test_ivf_retention(self, spark, tmp_path):
        import random

        from datawaves_etl_airflow_spark.operators.similarity import (
            append_ivf_index,
            compact_ivf_index,
        )
        from datawaves_etl_airflow_spark.sources.manifest import (
            VersionedManifest,
        )

        rng = random.Random(5)

        def vecs(lo, n=20):
            return spark.createDataFrame(
                [
                    (lo + i, [rng.uniform(-1, 1) for _ in range(8)])
                    for i in range(n)
                ],
                "vec_id long, embedding array<double>",
            )

        p = str(tmp_path / "ivf")
        write_ivf_index(vecs(0), p, n_centroids=2, n_iters=1)
        append_ivf_index(vecs(100), p, batch_token="d1")
        assert compact_ivf_index(spark, p) is True
        append_ivf_index(vecs(200), p, batch_token="d2")
        append_ivf_index(vecs(300), p, batch_token="d3")
        assert compact_ivf_index(spark, p, folded_retention=2) is True
        _, payload = VersionedManifest(p).resolve(spark)
        assert payload["folded"] == ["d2", "d3"]
