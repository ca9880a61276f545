"""Pins for the round-11 ADVICE items (see ADVICE.md at r11):

1. `_bm25_check_append_ids` must ignore FOREIGN torn forward batches
   (data files without ``_SUCCESS``) — their rows never committed, so
   counting them spuriously raises on ids the crashed ingest's own
   retry is about to rewrite.
2. `sampling.__all__` carries every public operator (star-imports and
   __all__-driven tooling were missing the r10/r11 additions).
3. llm_split_leakage's banded-vs-exact-oracle recall caveat is
   documentation (queries/llm.py) — no test surface.
4. `image_ahash` flat-image degeneracy: a zero-variance thumbnail has
   no mean-threshold information (all bits 0 — an all-black and an
   all-white image would read as Hamming-0 duplicates), so such
   payloads emit ``simhash = NULL`` and drop out of the candidate
   join naturally (null keys never equi-join).
"""

import os

import pytest

from datawaves_etl_airflow_spark.operators import sampling
from datawaves_etl_airflow_spark.operators.dedup import (
    simhash_candidate_pairs,
)
from datawaves_etl_airflow_spark.operators.multimodal import image_ahash
from datawaves_etl_airflow_spark.operators.text import (
    _resolve_bm25_index,
    append_bm25_index,
    write_bm25_index,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id",
        "concat('tok', CAST(id % 7 AS STRING), ' tok', "
        "CAST(id % 11 AS STRING), ' filler', CAST(id AS STRING)) AS text",
    )


def _pgm(px):
    h, w = len(px), len(px[0])
    return b"P5\n%d %d\n255\n" % (w, h) + bytes(
        v for row in px for v in row
    )


class TestTornForeignAppendIgnored:
    """ADVICE #1: the identity probe keys on the _SUCCESS-marked batch
    listing (the compact/probe completeness rule), not the raw forward
    tree."""

    def test_torn_forward_batch_does_not_raise(self, spark, tmp_path):
        p = str(tmp_path / "bm25f")
        write_bm25_index(
            _docs(spark, 0, 20), p, n_buckets=16, forward=True
        )
        # commit a batch normally, then tear it: drop its _SUCCESS so
        # it reads as a crashed FOREIGN ingest's partial forward rows
        append_bm25_index(
            _docs(spark, 20, 30), p, batch_token="b1", check_ids=True
        )
        root = _resolve_bm25_index(spark, p)[1]
        marker = os.path.join(root, "forward", "batch=b1", "_SUCCESS")
        assert os.path.exists(marker)
        os.remove(marker)
        # same ids again under a new token: pre-fix this raised on the
        # torn rows; post-fix the unmarked batch is invisible to the
        # probe (its own same-token retry will rewrite it)
        append_bm25_index(
            _docs(spark, 20, 30), p, batch_token="b2", check_ids=True
        )

    def test_marked_overlap_still_raises(self, spark, tmp_path):
        p = str(tmp_path / "bm25g")
        write_bm25_index(
            _docs(spark, 0, 20), p, n_buckets=16, forward=True
        )
        with pytest.raises(ValueError, match="already\\s+present"):
            append_bm25_index(
                _docs(spark, 15, 25), p, batch_token="c1",
                check_ids=True,
            )


class TestSamplingAll:
    """ADVICE #2: __all__ is complete and truthful."""

    def test_new_operators_exported(self):
        for name in (
            "leakage_safe_split",
            "split_leakage_report",
            "budget_per_group",
            "stratified_sample",
            "epoch_upsample",
            "execute_mixture",
        ):
            assert name in sampling.__all__
            assert callable(getattr(sampling, name))

    def test_all_names_exist(self):
        for name in sampling.__all__:
            assert hasattr(sampling, name), name


class TestFlatImageNull:
    """ADVICE #4: zero-variance thumbnails emit NULL simhash and never
    pair; near-flat images still hash."""

    def test_flat_images_null_and_never_pair(self, spark):
        black = [[0] * 16 for _ in range(16)]
        white = [[255] * 16 for _ in range(16)]
        nearflat = [[128] * 16 for _ in range(16)]
        nearflat[0][0] = 129
        d = spark.createDataFrame(
            [
                (1, bytearray(_pgm(black))),
                (2, bytearray(_pgm(white))),
                (3, bytearray(_pgm(nearflat))),
            ],
            "id long, payload binary",
        )
        got = {r["id"]: r["simhash"] for r in image_ahash(d).collect()}
        assert got[1] is None and got[2] is None
        assert got[3] is not None
        # the degeneracy the advice describes: black/white must NOT
        # surface as a Hamming-0 duplicate pair
        pairs = simhash_candidate_pairs(image_ahash(d)).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == set()
