"""Unigram-LM tokenizer training (r13 — Kudo ACL 2018, the
SentencePiece algorithm in its hard-EM public-reimplementation form)
+ Viterbi segmentation: pinned against an INDEPENDENT pure-Python
implementation of the same seeding / E / M / prune procedure, plus
the coverage, determinism, tie-break, and guard contracts."""

import math

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.text import (
    train_unigram_lm,
    unigram_segment,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- reference
def _ref_viterbi(word, logp, mpl, unk):
    """Independent DP: maximize (score, -n_pieces), ties toward the
    longer final piece at each position."""
    NEG = float("-inf")
    best = [(NEG, 0, -1)] * (len(word) + 1)
    best[0] = (0.0, 0, -1)
    for i in range(1, len(word) + 1):
        cand = None
        for j in range(max(0, i - mpl), i):
            if best[j][0] == NEG:
                continue
            piece = word[j:i]
            lp = logp.get(piece, unk if i - j == 1 else None)
            if lp is None:
                continue
            key = (best[j][0] + lp, -(best[j][1] + 1), -j)
            if cand is None or key > cand[0]:
                cand = (key, j)
        if cand is not None:
            best[i] = (cand[0][0], -cand[0][1], cand[1])
    out, i = [], len(word)
    while i > 0:
        j = best[i][2]
        out.append(word[j:i])
        i = j
    return list(reversed(out))


def _ref_train(word_freqs, vocab_size, seed_size, n_iters, mpl):
    # substring seeding
    counts = {}
    for w, fr in word_freqs.items():
        for i in range(len(w)):
            for l in range(1, min(mpl, len(w) - i) + 1):
                p = w[i : i + l]
                counts[p] = counts.get(p, 0) + fr
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:seed_size]
    seed = dict(chars)
    seed.update(dict(multis))
    total = sum(seed.values())
    logp = {p: math.log(c / total) for p, c in seed.items()}
    unk = math.log(1e-12)
    n_single = len(chars)
    for _ in range(n_iters):
        seg_counts = {}
        for w, fr in word_freqs.items():
            for p in _ref_viterbi(w, logp, mpl, unk):
                seg_counts[p] = seg_counts.get(p, 0) + fr
        new_counts = {}
        for p in logp:
            c = seg_counts.get(p, 0)
            if len(p) == 1:
                new_counts[p] = max(c, 1)
            elif c > 0:
                new_counts[p] = c
        multis2 = sorted(
            (p for p in new_counts if len(p) > 1),
            key=lambda p: (-new_counts[p], p),
        )
        for p in multis2[max(vocab_size - n_single, 0):]:
            del new_counts[p]
        tot = sum(new_counts.values())
        logp = {p: math.log(c / tot) for p, c in new_counts.items()}
    return logp


def _word_freqs(rows):
    wf = {}
    for r in rows:
        for w in (r["text"] or "").lower().split():
            if w:
                wf[w] = wf.get(w, 0) + 1
    return wf


class TestTrainUnigramLm:
    def _toy(self, spark):
        return spark.createDataFrame(
            [
                (1, "internationalization nation nations national"),
                (2, "the nation listened to international stations"),
                (3, "station nation station the the the rations"),
            ],
            "doc_id long, text string",
        )

    def test_matches_python_reference(self, spark):
        d = self._toy(spark)
        got = {
            r["piece"]: r["logprob"]
            for r in train_unigram_lm(
                d, vocab_size=24, seed_size=64, n_iters=2
            ).collect()
        }
        want = _ref_train(
            _word_freqs(d.collect()), 24, 64, 2, 8
        )
        assert set(got) == set(want)
        for p in want:
            assert got[p] == pytest.approx(want[p], rel=1e-9), p

    def test_matches_reference_on_real_corpus(self, spark):
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        got = {
            r["piece"]: r["logprob"]
            for r in train_unigram_lm(
                d, vocab_size=64, seed_size=256, n_iters=2
            ).collect()
        }
        want = _ref_train(_word_freqs(d.collect()), 64, 256, 2, 8)
        assert set(got) == set(want)
        for p in want:
            assert got[p] == pytest.approx(want[p], rel=1e-9), p

    def test_single_chars_always_survive(self, spark):
        d = self._toy(spark)
        vocab = train_unigram_lm(d, vocab_size=4, seed_size=8, n_iters=2)
        pieces = {r["piece"] for r in vocab.collect()}
        corpus_chars = set("".join(_word_freqs(d.collect())))
        assert corpus_chars <= pieces

    def test_deterministic(self, spark):
        d = self._toy(spark)
        a = sorted(map(tuple, train_unigram_lm(d, 16, 32).collect()))
        b = sorted(map(tuple, train_unigram_lm(d, 16, 32).collect()))
        assert a == b

    def test_bad_args_and_empty(self, spark):
        d = self._toy(spark)
        with pytest.raises(ValueError, match="seed_size"):
            train_unigram_lm(d, vocab_size=10, seed_size=5)
        empty = spark.createDataFrame([], "doc_id long, text string")
        with pytest.raises(ValueError, match="no words"):
            train_unigram_lm(empty)

    def test_distinct_word_guard(self, spark):
        d = self._toy(spark)
        with pytest.raises(ValueError, match="max_distinct_words"):
            train_unigram_lm(d, max_distinct_words=2)


class TestUnigramSegment:
    def test_segmentation_matches_reference(self, spark):
        d = spark.createDataFrame(
            [(1, "nation station the rations"), (2, "internationalization")],
            "doc_id long, text string",
        )
        vocab = train_unigram_lm(d, vocab_size=16, seed_size=48, n_iters=2)
        logp = {r["piece"]: r["logprob"] for r in vocab.collect()}
        mpl = max(len(p) for p in logp)
        unk = math.log(1e-12)
        got = {
            r["id"]: list(r["pieces"])
            for r in unigram_segment(d, vocab).collect()
        }
        for r in d.collect():
            want = []
            for w in r["text"].split():
                want.extend(_ref_viterbi(w, logp, mpl, unk))
            assert got[r["doc_id"]] == want, r["text"]

    def test_coverage_roundtrip(self, spark):
        """Concatenating pieces reproduces the normalized words —
        on the real corpus, under a small trained vocab."""
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
        vocab = train_unigram_lm(d, vocab_size=32, seed_size=64, n_iters=1)
        seg = unigram_segment(d, vocab)
        joined = seg.join(
            d.select(F.col("doc_id").alias("id"), "text"), "id"
        )
        bad = joined.filter(
            F.array_join(F.col("pieces"), "")
            != F.regexp_replace(
                F.trim(F.lower(F.col("text"))), r"\s+", ""
            )
        )
        assert bad.count() == 0

    def test_handcrafted_tiebreaks(self, spark):
        d = spark.createDataFrame(
            [(1, "abc")], "doc_id long, text string"
        )
        # equal scores: 'ab'+'c' vs 'a'+'bc' — both 2 pieces, tie on
        # score and count → longer FINAL piece wins: 'a'+'bc'
        vocab = spark.createDataFrame(
            [("a", -1.0), ("b", -9.0), ("c", -1.0), ("ab", -1.0),
             ("bc", -1.0)],
            "piece string, logprob double",
        )
        got = unigram_segment(d, vocab).first()
        assert list(got["pieces"]) == ["a", "bc"]
        # fewer pieces beat more at equal score: 'abc' whole
        vocab2 = spark.createDataFrame(
            [("a", -1.0), ("b", -1.0), ("c", -1.0), ("abc", -3.0)],
            "piece string, logprob double",
        )
        got2 = unigram_segment(d, vocab2).first()
        assert list(got2["pieces"]) == ["abc"]

    def test_unknown_chars_fall_back(self, spark):
        d = spark.createDataFrame(
            [(1, "naqtion")], "doc_id long, text string"
        )
        vocab = spark.createDataFrame(
            [("na", -1.0), ("tion", -1.0), ("n", -2.0), ("a", -2.0),
             ("t", -2.0), ("i", -2.0), ("o", -2.0)],
            "piece string, logprob double",
        )
        got = unigram_segment(d, vocab).first()
        assert list(got["pieces"]) == ["na", "q", "tion"]
        assert got["n_pieces"] == 3

    def test_empty_and_guards(self, spark):
        empty_docs = spark.createDataFrame([], "doc_id long, text string")
        vocab = spark.createDataFrame(
            [("a", -1.0)], "piece string, logprob double"
        )
        assert unigram_segment(empty_docs, vocab).count() == 0
        d = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="empty unigram vocab"):
            unigram_segment(
                d,
                spark.createDataFrame([], "piece string, logprob double"),
            )
        with pytest.raises(ValueError, match="max_vocab_rows"):
            unigram_segment(d, vocab, max_vocab_rows=0)

    def test_plans_are_arrow_not_row_python(self, spark):
        d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        vocab = spark.createDataFrame(
            [("a", -1.0), ("b", -1.0)], "piece string, logprob double"
        )
        plan = (
            unigram_segment(d, vocab)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" in plan
