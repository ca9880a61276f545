"""Winnowing passage fingerprints: the k+w-1 shared-run guarantee,
copied-paragraph detection between otherwise-unrelated docs, and the
boilerplate stop-fingerprint bound."""

from __future__ import annotations

import random

import pytest

from datawaves_etl_airflow_spark.operators.dedup import (
    duplicate_passages,
    minhash_dedup_pairs,
    winnow_fingerprints,
)

K, W = 8, 16


def _words(rng, n, vocab="abcdefghijklmnopqrstuvwxyz"):
    return " ".join(
        "".join(rng.choice(vocab) for _ in range(5)) for _ in range(n)
    )


class TestWinnowing:
    def test_shared_run_guarantee(self, spark):
        """Any shared run of >= k + w - 1 words shares >= 1 selected
        fingerprint — the winnowing theorem, checked on 20 random
        embeddings of a passage into unrelated prefixes/suffixes."""
        rng = random.Random(4)
        passage = _words(rng, K + W - 1)  # exactly the guarantee length
        rows = []
        for i in range(20):
            pre = _words(rng, rng.randrange(0, 60))
            post = _words(rng, rng.randrange(0, 60))
            rows.append((i, f"{pre} {passage} {post}".strip()))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        fps = winnow_fingerprints(docs, k=K, w=W)
        by_doc = {}
        for r in fps.collect():
            by_doc.setdefault(r["id"], set()).add(r["fp"])
        # every pair of docs shares at least one fingerprint
        for i in range(20):
            for j in range(i + 1, 20):
                assert by_doc[i] & by_doc[j], (i, j)

    def test_copied_paragraph_detected_where_jaccard_fails(self, spark):
        """A 40-word passage inside two long, otherwise-unrelated docs:
        document-level MinHash at 0.5 misses it (Jaccard ~0.05);
        duplicate_passages finds it."""
        rng = random.Random(9)
        passage = _words(rng, 40)
        docs = spark.createDataFrame(
            [
                (1, f"{_words(rng, 400)} {passage} {_words(rng, 100)}"),
                (2, f"{_words(rng, 250)} {passage} {_words(rng, 300)}"),
                (3, _words(rng, 500)),  # no shared passage
            ],
            "doc_id long, text string",
        )
        pairs = duplicate_passages(docs, k=K, w=W, min_shared=2)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got == {(1, 2)}
        # and document-level similarity indeed dilutes below threshold
        doc_level = minhash_dedup_pairs(docs, threshold=0.5)
        assert doc_level.count() == 0

    def test_boilerplate_fp_bound(self, spark):
        """A fingerprint shared by more than max_docs_per_fp docs (a
        license header) is dropped; genuinely-shared passages in small
        groups survive."""
        rng = random.Random(2)
        header = _words(rng, K + W - 1)
        passage = _words(rng, 40)
        rows = [(i, f"{header} {_words(rng, 80)}") for i in range(30)]
        rows += [
            (100, f"{header} {_words(rng, 80)} {passage}"),
            (101, f"{header} {passage} {_words(rng, 80)}"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = duplicate_passages(
            docs, k=K, w=W, min_shared=2, max_docs_per_fp=8
        )
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        # header fps are shared by all 32 docs -> dropped by the bound;
        # only the passage pair survives
        assert got == {(100, 101)}

    def test_short_docs_emit_nothing(self, spark):
        """Docs under k words have no k-gram run to fingerprint — they
        must emit nothing (so min_shared=1 can never pair two empty or
        tiny docs on a truncated-text hash), and never crash."""
        docs = spark.createDataFrame(
            [(1, "tiny"), (2, ""), (3, "a b c"), (4, "a b c")],
            "doc_id long, text string",
        )
        assert winnow_fingerprints(docs, k=K, w=W).count() == 0
        assert duplicate_passages(docs, k=K, w=W, min_shared=1).count() == 0
