"""exact_substring_dedup (r13 — Lee et al. 2021 ExactSubstr): the
within-corpus verbatim-run dedup. The grams tier is the semantic
definition (and the driver oracle's replay); the winnowed-anchor tier
is the 100 TB path — these tests pin the two tiers value-identical on
planted spans, multi-copy corpora, within-doc repeats, and the real
sf0.001 documents table, plus the keep-one-copy and sub-L survival
contracts on each."""

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.dedup import (
    duplicated_gram_sites,
    exact_substring_dedup,
)

SF_DIR = "/root/testdata/sf0.001"

# a 12-word span, ≥ any L used below
SPAN = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"


def _collect(df):
    return {
        r["id"]: (r["text_dedup"], r["n_words_kept"], r["n_words_removed"])
        for r in df.collect()
    }


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOTH = pytest.mark.parametrize("method", ["grams", "anchors"])


class TestExactSubstringDedup:
    def _planted(self, spark):
        return _mk(spark, [
            (1, f"one unique opening here {SPAN} and a unique tail one"),
            (2, f"two other words entirely {SPAN} closing differently two"),
            (3, "three nothing duplicated in this document at all three"),
        ])

    @BOTH
    def test_keep_one_copy(self, spark, method):
        got = _collect(
            exact_substring_dedup(
                self._planted(spark), min_run_words=10, method=method
            )
        )
        # doc 1 holds the minimal site of every duplicated gram → intact
        assert got[1] == (
            f"one unique opening here {SPAN} and a unique tail one", 21, 0
        )
        # doc 2 loses exactly the span
        assert got[2] == (
            "two other words entirely closing differently two", 7, 12
        )
        # doc 3 untouched
        assert got[3][2] == 0

    @BOTH
    def test_sub_l_run_survives(self, spark, method):
        nine = "a b c d e f g h i"  # 9 shared words < L=10
        got = _collect(
            exact_substring_dedup(
                _mk(spark, [
                    (1, f"uno due tre {nine} quattro cinque sei"),
                    (2, f"sept huit neuf {nine} dix onze douze"),
                ]),
                min_run_words=10,
                method=method,
            )
        )
        assert got[1][2] == 0 and got[2][2] == 0

    @BOTH
    def test_three_copies_keep_first_only(self, spark, method):
        got = _collect(
            exact_substring_dedup(
                _mk(spark, [
                    (5, f"cinq ouvre ainsi {SPAN} cinq finit comme ca"),
                    (7, f"sept commence la {SPAN} sept termine autrement la"),
                    (9, f"neuf demarre ici {SPAN} neuf conclut differemment ici"),
                ]),
                min_run_words=12,
                method=method,
            )
        )
        assert got[5][2] == 0
        assert got[7][2] == 12 and SPAN not in got[7][0]
        assert got[9][2] == 12 and SPAN not in got[9][0]

    @BOTH
    def test_within_doc_repeat(self, spark, method):
        # the span appears twice INSIDE one doc: the first occurrence
        # is the corpus-minimal site, the second is removed
        got = _collect(
            exact_substring_dedup(
                _mk(spark, [(1, f"{SPAN} some middle padding {SPAN}")]),
                min_run_words=12,
                method=method,
            )
        )
        assert got[1] == (f"{SPAN} some middle padding", 15, 12)

    @BOTH
    def test_whole_doc_duplicate_empties_later_copy(self, spark, method):
        got = _collect(
            exact_substring_dedup(
                _mk(spark, [(1, SPAN), (2, SPAN)]),
                min_run_words=12,
                method=method,
            )
        )
        assert got[1] == (SPAN, 12, 0)
        assert got[2] == ("", 0, 12)

    @BOTH
    def test_short_and_empty_docs_pass_through(self, spark, method):
        got = _collect(
            exact_substring_dedup(
                _mk(spark, [(1, "tiny doc"), (2, ""), (3, None)]),
                min_run_words=10,
                method=method,
            )
        )
        assert got[1] == ("tiny doc", 2, 0)
        assert got[2] == ("", 0, 0)
        assert got[3] == ("", 0, 0)

    @BOTH
    def test_output_is_normalized(self, spark, method):
        got = _collect(
            exact_substring_dedup(
                _mk(spark, [(1, "  MiXeD   Case\ttext  ")]),
                min_run_words=10,
                method=method,
            )
        )
        assert got[1] == ("mixed case text", 3, 0)

    def test_tiers_identical_on_planted(self, spark):
        d = self._planted(spark)
        a = _collect(exact_substring_dedup(d, min_run_words=10))
        b = _collect(
            exact_substring_dedup(d, min_run_words=10, method="anchors")
        )
        assert a == b

    def test_tiers_identical_on_real_corpus(self, spark):
        """The llm_exact_substr_dedup plant on the sf0.001 documents
        table — incidental shared prefixes and all — must come out
        identical from both tiers."""
        from datawaves_etl_airflow_spark.queries.llm import (
            _EXACT_SUBSTR_SPAN,
        )
        from datawaves_etl_airflow_spark.operators.dedup import tokenize

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ws = tokenize(F.col("text"))
        planted = d.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat_ws(
                    " ",
                    F.array_join(F.slice(ws, 1, 6), " "),
                    F.lit(_EXACT_SUBSTR_SPAN),
                    F.array_join(F.slice(ws, 7, 4), " "),
                ),
            ).otherwise(F.col("text")).alias("text"),
        )
        a = _collect(exact_substring_dedup(planted, min_run_words=10))
        b = _collect(
            exact_substring_dedup(
                planted, min_run_words=10, method="anchors"
            )
        )
        assert a == b
        # the plant actually dedups something
        assert sum(1 for v in a.values() if v[2] > 0) > 0

    @BOTH
    def test_partial_overlap_removes_common_prefix_only(self, spark, method):
        """Two docs share only the first 10 words of a longer run —
        per-gram semantics remove exactly the shared words in the
        later doc, not its divergent continuation."""
        ten = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
        got = _collect(
            exact_substring_dedup(
                _mk(spark, [
                    (1, f"{ten} continues one way after the shared part"),
                    (2, f"{ten} diverges another way after sharing stops"),
                ]),
                min_run_words=10,
                method=method,
            )
        )
        assert got[1][2] == 0
        assert got[2] == (
            "diverges another way after sharing stops", 6, 10
        )

    def test_stop_anchor_valve(self, spark):
        """max_sites_per_anchor bounds the self-join fan-out: with the
        valve below the span's occurrence count the anchors tier keeps
        the boilerplate (documented trade), with the default it
        matches grams."""
        rows = [
            (i, f"doc number {i} says {SPAN} and then some more")
            for i in range(1, 9)
        ]
        d = _mk(spark, rows)
        full = _collect(
            exact_substring_dedup(d, min_run_words=12, method="anchors")
        )
        assert sum(1 for v in full.values() if v[2] > 0) == 7
        valved = _collect(
            exact_substring_dedup(
                d, min_run_words=12, method="anchors",
                max_sites_per_anchor=2,
            )
        )
        assert all(v[2] == 0 for v in valved.values())

    def test_bad_args_raise(self, spark):
        d = _mk(spark, [(1, "x")])
        with pytest.raises(ValueError, match="min_run_words"):
            exact_substring_dedup(d, min_run_words=1)
        with pytest.raises(ValueError, match="method"):
            exact_substring_dedup(d, method="suffix_array")

    def test_duplicated_gram_sites_positions(self, spark):
        sites = sorted(
            (r["id"], r["pos"])
            for r in duplicated_gram_sites(
                _mk(spark, [
                    (1, f"{SPAN} tail padding here"),
                    (2, f"head padding goes {SPAN}"),
                ]),
                min_run_words=12,
            ).collect()
        )
        # doc 2's span starts at word 3; doc 1 pos 0 is canonical
        assert sites == [(2, 3)]

    @BOTH
    def test_empty_input(self, spark, method):
        empty = _mk(spark, []).filter(F.lit(False))
        assert exact_substring_dedup(
            empty, min_run_words=10, method=method
        ).count() == 0


class TestExactSubstrPlans:
    """Plan pins for the queued llm_exact_substr_dedup (the sweeping
    test_plan_invariants covers it automatically once the r14
    rotation registers it): no all-pairs shapes, no row-at-a-time
    Python, and the anchors tier's one Python surface is Arrow-batched
    mapInPandas."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_registered_query_plan(self, spark):
        from datawaves_etl_airflow_spark.queries.llm import (
            llm_exact_substr_dedup,
        )

        plan = self._plan(llm_exact_substr_dedup(spark, SF_DIR))
        for bad in (
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "BatchEvalPython",
        ):
            assert bad not in plan
        # grams tier is pure JVM: no Python at all
        assert "ArrowEvalPython" not in plan
        assert "mapInPandas" not in plan.lower()

    def test_anchors_tier_plan(self, spark):
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = self._plan(
            exact_substring_dedup(d, min_run_words=10, method="anchors")
        )
        for bad in (
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "BatchEvalPython",
        ):
            assert bad not in plan
        # the verify-extend stage is the sanctioned Arrow surface, and
        # the candidate join is a keyed (fp) join
        assert "MapInPandas" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


class TestExactSubstrAgainstCorpus:
    """exact_substr_against_corpus (r13): the incremental
    orientation — batch runs shared with the settled corpus are
    removed from the BATCH regardless of id order; corpus is never
    rewritten; batch-internal duplication is out of scope."""

    def _frames(self, spark):
        batch = _mk(spark, [
            (100, f"batch opener words here {SPAN} batch closer words"),
            (101, "batch doc with nothing shared with the corpus side"),
            (102, f"{SPAN}"),
        ])
        corpus = _mk(spark, [
            (1, f"corpus context around {SPAN} differs completely here"),
            (2, "an unrelated corpus document with its own words"),
        ])
        return batch, corpus

    @BOTH
    def test_batch_loses_corpus_runs(self, spark, method):
        from datawaves_etl_airflow_spark.operators.dedup import (
            exact_substr_against_corpus,
        )

        batch, corpus = self._frames(spark)
        got = _collect(
            exact_substr_against_corpus(
                batch, corpus, min_run_words=12, method=method
            )
        )
        # only batch rows come back
        assert set(got) == {100, 101, 102}
        assert got[100] == (
            "batch opener words here batch closer words", 7, 12
        )
        assert got[101][2] == 0
        assert got[102] == ("", 0, 12)

    @BOTH
    def test_corpus_id_order_is_irrelevant(self, spark, method):
        """Unlike the within-corpus form, the corpus wins even when
        the batch doc's id is SMALLER — the corpus is canonical."""
        from datawaves_etl_airflow_spark.operators.dedup import (
            exact_substr_against_corpus,
        )

        batch = _mk(spark, [(1, SPAN)])
        corpus = _mk(spark, [(999, f"padding before {SPAN}")])
        got = _collect(
            exact_substr_against_corpus(
                batch, corpus, min_run_words=12, method=method
            )
        )
        assert got[1] == ("", 0, 12)

    @BOTH
    def test_batch_internal_dups_survive(self, spark, method):
        from datawaves_etl_airflow_spark.operators.dedup import (
            exact_substr_against_corpus,
        )

        batch = _mk(spark, [(1, SPAN), (2, SPAN)])
        corpus = _mk(spark, [(3, "unrelated corpus words only here")])
        got = _collect(
            exact_substr_against_corpus(
                batch, corpus, min_run_words=12, method=method
            )
        )
        assert got[1][2] == 0 and got[2][2] == 0

    def test_tiers_identical_on_real_corpus(self, spark):
        from datawaves_etl_airflow_spark.queries.llm import (
            llm_exact_substr_incremental,
        )
        from datawaves_etl_airflow_spark.operators.dedup import (
            exact_substr_against_corpus,
            tokenize,
        )
        from datawaves_etl_airflow_spark.queries.llm import (
            _EXACT_SUBSTR_SPAN,
        )

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ws = tokenize(F.col("text"))
        planted = d.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat_ws(
                    " ",
                    F.array_join(F.slice(ws, 1, 6), " "),
                    F.lit(_EXACT_SUBSTR_SPAN),
                    F.array_join(F.slice(ws, 7, 4), " "),
                ),
            ).otherwise(F.col("text")).alias("text"),
        )
        batch = planted.filter(F.col("doc_id") % 10 == 7)
        corpus = planted.filter(F.col("doc_id") % 10 != 7)
        a = _collect(
            exact_substr_against_corpus(batch, corpus, min_run_words=10)
        )
        b = _collect(
            exact_substr_against_corpus(
                batch, corpus, min_run_words=10, method="anchors"
            )
        )
        assert a == b
        # span carriers in the batch (doc_id = 27 mod 30) lost words
        assert any(v[2] > 0 for v in a.values())
        # and the registered query returns exactly the grams tier
        q = {
            r["doc_id"]: (
                r["text_dedup"], r["n_words_kept"], r["n_words_removed"]
            )
            for r in llm_exact_substr_incremental(spark, SF_DIR).collect()
        }
        assert q == a


class TestSubstrIndex:
    """write_substr_index / append_substr_index /
    exact_substr_against_index (r13): the persisted form of the
    incremental probe — pinned ≡ the in-session form, manifest
    pointer-flip commit, L-raise-only contract."""

    def _frames(self, spark):
        corpus = _mk(spark, [
            (1, f"corpus context around {SPAN} differs completely here"),
            (2, "an unrelated corpus document with its own words"),
        ])
        batch = _mk(spark, [
            (100, f"batch opener words here {SPAN} batch closer words"),
            (101, "batch doc with nothing shared with the corpus side"),
        ])
        return corpus, batch

    def test_probe_equals_in_session(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            exact_substr_against_corpus,
            exact_substr_against_index,
            write_substr_index,
        )

        corpus, batch = self._frames(spark)
        idx = str(tmp_path / "sidx")
        write_substr_index(corpus, idx, min_run_words=12)
        got = _collect(exact_substr_against_index(batch, idx))
        want = _collect(
            exact_substr_against_corpus(batch, corpus, min_run_words=12)
        )
        assert got == want
        assert got[100][2] == 12

    def test_probe_equals_in_session_on_real_corpus(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            exact_substr_against_corpus,
            exact_substr_against_index,
            write_substr_index,
        )
        from pyspark.sql import functions as F

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        batch = d.filter(F.col("doc_id") % 10 == 7)
        corpus = d.filter(F.col("doc_id") % 10 != 7)
        idx = str(tmp_path / "sidx")
        write_substr_index(corpus, idx, min_run_words=10)
        got = _collect(exact_substr_against_index(batch, idx))
        want = _collect(
            exact_substr_against_corpus(batch, corpus, min_run_words=10)
        )
        assert got == want

    def test_append_folds_into_probe(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            append_substr_index,
            exact_substr_against_corpus,
            exact_substr_against_index,
            write_substr_index,
        )

        corpus, batch = self._frames(spark)
        day2 = _mk(spark, [
            (3, "batch doc with nothing shared with the corpus side"),
        ])
        idx = str(tmp_path / "sidx")
        write_substr_index(corpus, idx, min_run_words=8)
        append_substr_index(day2, idx, batch_token="day2")
        got = _collect(exact_substr_against_index(batch, idx))
        want = _collect(
            exact_substr_against_corpus(
                batch, corpus.unionByName(day2), min_run_words=8
            )
        )
        assert got == want
        # doc 101 now duplicates day2's doc verbatim → emptied
        assert got[101] == ("", 0, 9)
        # append replay (same token) is idempotent
        append_substr_index(day2, idx, batch_token="day2")
        assert _collect(exact_substr_against_index(batch, idx)) == want

    def test_probe_l_contract(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            exact_substr_against_corpus,
            exact_substr_against_index,
            write_substr_index,
        )

        corpus, batch = self._frames(spark)
        idx = str(tmp_path / "sidx")
        write_substr_index(corpus, idx, min_run_words=10)
        # raising L is allowed and equals the in-session form at that L
        got = _collect(
            exact_substr_against_index(batch, idx, min_run_words=12)
        )
        want = _collect(
            exact_substr_against_corpus(batch, corpus, min_run_words=12)
        )
        assert got == want
        # lowering L below the index's is refused loudly
        with pytest.raises(ValueError, match="below the index"):
            exact_substr_against_index(batch, idx, min_run_words=8)

    def test_meta_roundtrip_and_bad_paths(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            append_substr_index,
            read_substr_index_meta,
            write_substr_index,
        )

        corpus, batch = self._frames(spark)
        idx = str(tmp_path / "sidx")
        write_substr_index(corpus, idx, min_run_words=10, anchor_k=4)
        meta = read_substr_index_meta(spark, idx)
        assert meta["min_run_words"] == 10 and meta["anchor_k"] == 4
        with pytest.raises(ValueError, match="manifest"):
            read_substr_index_meta(spark, str(tmp_path / "nope"))
        with pytest.raises(ValueError, match="path-safe"):
            append_substr_index(batch, idx, batch_token="a/b")

    def test_rebuild_is_pointer_flip(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.dedup import (
            exact_substr_against_index,
            write_substr_index,
        )

        corpus, batch = self._frames(spark)
        idx = str(tmp_path / "sidx")
        write_substr_index(corpus, idx, min_run_words=12)
        # rebuild with a different corpus: new version wins
        corpus2 = _mk(spark, [(9, "a totally different settled corpus")])
        write_substr_index(corpus2, idx, min_run_words=12)
        got = _collect(exact_substr_against_index(batch, idx))
        assert got[100][2] == 0  # span no longer in the live corpus
