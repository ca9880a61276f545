"""Quality-classifier TRAINING (r13 — the r12 verdict's task 5): the
stats-head trainer `train_quality_classifier` (weights round-trip into
`quality_logit` verbatim) and the fastText-style hashed-n-gram sibling
— each pinned against a pure-Python full-batch GD reference and a
planted-separation contract."""

import math

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.text import (
    QUALITY_FEATURE_COLS,
    hashed_ngram_features,
    hashed_ngram_logit,
    quality_logit,
    text_stats,
    train_hashed_ngram_classifier,
    train_quality_classifier,
)

SF_DIR = "/root/testdata/sf0.001"


def _sigmoid(v):
    return 1.0 / (1.0 + math.exp(-v))


class TestTrainQualityClassifier:
    def _labeled(self, spark):
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
            F.length("text") > 0
        )
        st = text_stats(d)
        return d.join(
            st.select(
                "doc_id",
                (F.col("n_words") >= 40).cast("int").alias("label"),
            ),
            "doc_id",
        )

    def _py_reference(self, rows, n_epochs=10, lr=0.5):
        """Pure-Python full-batch GD on the same standardized features
        — the operator's spec, independent of Spark."""
        feats = [
            [float(r[c]) for c in QUALITY_FEATURE_COLS] for r in rows
        ]
        ys = [float(r["label"]) for r in rows]
        n = len(rows)
        nf = len(QUALITY_FEATURE_COLS)
        means = [sum(f[j] for f in feats) / n for j in range(nf)]
        sqs = [sum(f[j] * f[j] for f in feats) / n for j in range(nf)]
        stds = [
            max(math.sqrt(sqs[j] - means[j] ** 2), 1e-12)
            for j in range(nf)
        ]
        z = [
            [(f[j] - means[j]) / stds[j] for j in range(nf)]
            for f in feats
        ]
        w, b = [0.0] * nf, 0.0
        for _ in range(n_epochs):
            errs = [
                _sigmoid(b + sum(w[j] * zi[j] for j in range(nf))) - y
                for zi, y in zip(z, ys)
            ]
            gb = sum(errs)
            gs = [
                sum(e * zi[j] for e, zi in zip(errs, z))
                for j in range(nf)
            ]
            b -= lr * gb / n
            w = [w[j] - lr * gs[j] / n for j in range(nf)]
        out = {
            c: w[j] / stds[j] for j, c in enumerate(QUALITY_FEATURE_COLS)
        }
        out["bias"] = b - sum(
            w[j] * means[j] / stds[j] for j in range(nf)
        )
        return out

    def test_matches_python_reference(self, spark):
        labeled = self._labeled(spark)
        got = train_quality_classifier(labeled)
        st = text_stats(labeled).join(
            labeled.select("doc_id", "label"), "doc_id"
        )
        want = self._py_reference(st.collect())
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-7, abs=1e-9), k

    def test_roundtrip_into_quality_logit_learns(self, spark):
        """The returned dict drops into quality_logit verbatim and the
        learned head beats the majority class on its own labels."""
        labeled = self._labeled(spark)
        w = train_quality_classifier(labeled)
        scored = quality_logit(labeled, weights=w).join(
            labeled.select("doc_id", "label"), "doc_id"
        )
        agg = scored.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("keep") == F.col("label")).cast("int")
            ).alias("ok"),
            F.sum("label").alias("pos"),
        ).first()
        majority = max(agg["pos"], agg["n"] - agg["pos"]) / agg["n"]
        assert agg["ok"] / agg["n"] > max(0.85, majority)

    def test_separable_toy_corpus_perfect(self, spark):
        rows = [
            (i, ("good " * 60 if i % 2 == 0 else "bad. ") + "text", i % 2 == 0)
            for i in range(40)
        ]
        d = spark.createDataFrame(
            [(i, t, int(y)) for i, t, y in rows],
            "doc_id long, text string, label int",
        )
        w = train_quality_classifier(d, n_epochs=30, lr=1.0)
        scored = quality_logit(d, weights=w).join(
            d.select("doc_id", "label"), "doc_id"
        )
        assert (
            scored.filter(F.col("keep") != F.col("label")).count() == 0
        )

    def test_empty_raises(self, spark):
        d = spark.createDataFrame(
            [], "doc_id long, text string, label int"
        )
        with pytest.raises(ValueError, match="no scoreable"):
            train_quality_classifier(d)


class TestHashedNgramClassifier:
    def _toy(self, spark):
        rows = []
        for i in range(30):
            if i % 2 == 0:
                rows.append((i, "clean prose reads well here", 1))
            else:
                rows.append((i, "spam junk click now buy", 0))
        return spark.createDataFrame(
            rows, "doc_id long, text string, label int"
        )

    @staticmethod
    def _py_hash(gram, dim):
        h = 0
        for ch in gram:
            h = (h * 31 + ord(ch)) % dim
        return h

    def _py_features(self, rows, dim):
        feats = {}
        for r in rows:
            ws = [w for w in r["text"].lower().split() if w]
            grams = ws + [
                " ".join(ws[i : i + 2]) for i in range(len(ws) - 1)
            ]
            if not grams:
                continue
            bag = {}
            for g in grams:
                f = self._py_hash(g, dim)
                bag[f] = bag.get(f, 0) + 1
            feats[r["doc_id"]] = {
                f: c / len(grams) for f, c in bag.items()
            }
        return feats

    def test_features_match_python(self, spark):
        d = self._toy(spark)
        dim = 512
        got = {
            (r["id"], r["fid"]): r["x"]
            for r in hashed_ngram_features(d, dim=dim).collect()
        }
        want = {
            (i, f): x
            for i, bag in self._py_features(d.collect(), dim).items()
            for f, x in bag.items()
        }
        assert got == want

    def test_training_matches_python(self, spark):
        d = self._toy(spark)
        dim = 512
        n_epochs, lr = 5, 1.0
        w_df, bias = train_hashed_ngram_classifier(
            d, dim=dim, n_epochs=n_epochs, lr=lr
        )
        got_w = {r["fid"]: r["weight"] for r in w_df.collect()}

        rows = d.collect()
        feats = self._py_features(rows, dim)
        ys = {r["doc_id"]: float(r["label"]) for r in rows}
        n = len(rows)
        w, b = {}, 0.0
        for _ in range(n_epochs):
            errs = {
                i: _sigmoid(
                    b
                    + sum(
                        x * w.get(f, 0.0)
                        for f, x in feats.get(i, {}).items()
                    )
                )
                - y
                for i, y in ys.items()
            }
            grads = {}
            for i, bag in feats.items():
                for f, x in bag.items():
                    grads[f] = grads.get(f, 0.0) + x * errs[i]
            b -= lr * sum(errs.values()) / n
            for f in set(w) | set(grads):
                w[f] = w.get(f, 0.0) - lr * grads.get(f, 0.0) / n
        assert bias == pytest.approx(b, rel=1e-9, abs=1e-12)
        assert set(got_w) == set(w)
        for f in w:
            assert got_w[f] == pytest.approx(w[f], rel=1e-7, abs=1e-10), f

    def test_separates_and_scores(self, spark):
        d = self._toy(spark)
        w_df, bias = train_hashed_ngram_classifier(
            d, dim=512, n_epochs=20, lr=2.0
        )
        scored = hashed_ngram_logit(d, w_df, bias, dim=512).join(
            d.select(F.col("doc_id").alias("id"), "label"), "id"
        )
        assert (
            scored.filter(F.col("keep") != F.col("label")).count() == 0
        )

    def test_gramless_doc_scores_bias(self, spark):
        d = spark.createDataFrame(
            [(1, "clean prose reads well here", 1), (2, "", 0)],
            "doc_id long, text string, label int",
        )
        w_df, bias = train_hashed_ngram_classifier(d, dim=64, n_epochs=2)
        got = {
            r["id"]: r["score"]
            for r in hashed_ngram_logit(d, w_df, bias, dim=64).collect()
        }
        assert got[2] == pytest.approx(round(bias, 6))

    def test_plans_stay_keyed(self, spark):
        d = self._toy(spark)
        w_df, bias = train_hashed_ngram_classifier(d, dim=64, n_epochs=1)
        plan = (
            hashed_ngram_logit(d, w_df, bias, dim=64)
            ._jdf.queryExecution().executedPlan().toString()
        )
        for bad in (
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "BatchEvalPython",
        ):
            assert bad not in plan
