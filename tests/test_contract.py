"""Driver-contract consistency: the invariants the grading driver
relies on, pinned as tests so a refactor can't silently break the
gate.

- every oracle key has a matching query (an orphan oracle is dead)
- every query is callable with (spark, sf_dir) and returns a DataFrame
  with a non-empty, stably-named schema (checked lazily — no execution)
- entry() runs the flagship end-to-end at sf0.001 and yields rows
"""

import pytest
from pyspark.sql import DataFrame

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_every_oracle_has_a_query():
    q = entrymod.queries()
    orphans = set(entrymod.oracle_sql()) - set(q)
    assert not orphans, f"oracle keys without queries: {sorted(orphans)}"


def test_queries_build_named_plans(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        assert isinstance(df, DataFrame), name
        cols = df.columns
        assert cols, name
        assert len(cols) == len(set(cols)), f"duplicate columns in {name}"
        # oracle compare sorts columns by name — auto-generated names
        # like sum(x) or round(y, 6) would hash-mismatch the SQL twin
        for c in cols:
            assert "(" not in c, f"unaliased column {c!r} in {name}"


def test_entry_flagship_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


class TestRegistrationPolicy:
    """Round-3 driver budget policy: exactly 50 registered queries,
    never-verified-first order, full corpus still reachable."""

    def test_exactly_fifty_registered(self):
        q = entrymod.queries()
        assert len(q) == 50, (
            f"driver budget is 50 queries (round-2 run stopped at the "
            f"50th); got {len(q)}"
        )

    def test_registration_order_never_verified_first(self):
        """Round-14 rotation (r13 verdict Next #3): the eight
        never-driver-verified r13 queue entries lead the llm block,
        then the two exhausted r13 llm deferrals, then the
        r13-rewritten LSH/CC/composition family (touched-last-round
        queries auto-queue ahead of the staleness cohort so the
        driver oracle certifies the rewrite), then the r11-stale
        cohort minus the sixteen documented deferrals."""
        names = list(entrymod.queries())
        # llm block: the eight never-driver-verified r13 additions
        # (the r13 ROTATION_QUEUE verbatim) lead the stale cohort
        for new in (
            "llm_exact_substr_dedup",
            "llm_exact_substr_incremental",
            "llm_exact_substr_index",
            "llm_exact_substr_decontaminate",
            "llm_unigram_segment",
            "llm_fineweb_pipeline",
            "llm_train_quality",
            "llm_hashed_quality",
        ):
            assert names.index(new) < names.index("llm_hybrid_retrieval")
        # the exhausted r13 deferrals ARE registered this round
        for exhausted in (
            "llm_hybrid_retrieval",
            "llm_ann_ivf_pq",
            "j6b_anti_join_prefiltered",
        ):
            assert exhausted in names
        # the r13-rewritten family holds r14 slots (driver re-certify)
        for rewritten in (
            "llm_minhash_dedup",
            "llm_simhash_candidates",
            "llm_jaccard_pairs",
            "llm_neardup_embeddings",
            "llm_dedup_clusters",
            "llm_cosine_topk",
            "llm_corpus_pipeline",
        ):
            assert rewritten in names
            assert names.index(rewritten) < names.index("llm_jaccard_prefix")
        # the sixteen documented r14 deferrals are NOT registered
        from datawaves_etl_airflow_spark.queries import domain, generic, llm

        deferred = (
            set(domain.ROTATION_DEFERRALS)
            | set(generic.ROTATION_DEFERRALS)
            | set(llm.ROTATION_DEFERRALS)
        )
        assert len(deferred) == 16
        assert not deferred & set(names)

    def test_freshness_gate_passes_on_current_registration(self):
        """The rotation is sufficient by construction: the mechanical
        staleness gate (r10 verdict task 8) must pass against the
        registration this file pins. REGISTRATION_ROUND (r12 verdict
        'what's wrong #1' + ADVICE r12) makes this stable across the
        round boundary: the gate projects against the round the
        registration was authored for, so the round's own CORRECTNESS
        file landing does not flip this test red; it fails only when
        a round completes without a rotation. cwd derives from this
        file, not a hardcoded checkout path."""
        import os
        import subprocess
        import sys as _sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [_sys.executable, "tools/parity.py", "--freshness"],
            capture_output=True,
            text=True,
            cwd=repo,
            timeout=300,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr

    def test_registration_round_is_current(self):
        """REGISTRATION_ROUND must point at the latest committed
        CORRECTNESS round or the one about to run — the same bounds
        the gate enforces, pinned here so a forgotten bump is a test
        failure, not just a gate message."""
        import glob
        import os

        from datawaves_etl_airflow_spark.queries import REGISTRATION_ROUND

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        rounds = [
            int(os.path.basename(f).split("_r")[1].split(".")[0])
            for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        ]
        assert rounds, "no CORRECTNESS files — driver contract broken"
        assert max(rounds) <= REGISTRATION_ROUND <= max(rounds) + 1

    def test_docstring_corpus_counts_match_reality(self):
        """ADVICE r12: the driver-contract docstring's corpus counts
        drifted (said 149/145, actual 156/152). Derive them from the
        registries so the docstring can never silently drift again."""
        import re

        total = len(entrymod.queries_all())
        oracled = len(entrymod.oracle_sql_all())
        m = re.search(
            r"\((\d+) queries as of round \d+ — (\d+)\s+oracled",
            entrymod.__doc__,
        )
        assert m, "corpus-count sentence missing from the docstring"
        assert (int(m.group(1)), int(m.group(2))) == (total, oracled), (
            f"docstring says {m.group(1)}/{m.group(2)}, registries have "
            f"{total}/{oracled} — update __spark_entry__'s docstring"
        )

    def test_driver_lists_subset_of_full_corpus(self):
        from datawaves_etl_airflow_spark.queries import domain, generic, llm

        for mod in (domain, llm, generic):
            missing = [n for n in mod.DRIVER_QUERIES if n not in mod.QUERIES]
            assert not missing, f"{mod.__name__}: {missing}"
            assert len(mod.DRIVER_QUERIES) == len(set(mod.DRIVER_QUERIES))

    def test_full_corpus_still_reachable(self):
        all_q = entrymod.queries_all()
        assert len(all_q) >= 88
        assert set(entrymod.queries()) <= set(all_q)
        orphans = set(entrymod.oracle_sql_all()) - set(all_q)
        assert not orphans

    def test_import_failure_surfaces_as_sentinel_rows(self, spark):
        """A queries-module import failure must register a visible
        sentinel query (returning the traceback as rows), never
        silently drop a family — the round-2 hazard where a missing
        pandas would have erased 49 queries without a trace."""
        sentinel = entrymod._import_failure_sentinel(
            "llm", "Traceback (most recent call last):\nboom"
        )
        df = sentinel(spark, SF_DIR)
        rows = df.collect()
        assert {r["failed_module"] for r in rows} == {"llm"}
        assert any("boom" in r["traceback_line"] for r in rows)

    def test_registered_oracle_coverage(self):
        """Round 5 (amended r14): every registered query is oracled,
        EXCEPT the explicitly documented rows-only-by-design slots
        this rotation carries: llm_minhash_dedup and
        llm_simhash_candidates (named by the r13 verdict's Next #3 —
        the r13-rewritten family must take r14 slots even though their
        candidate sets are xxhash64-seed-dependent and rows-only by
        design) and llm_unigram_segment (the r13 ROTATION_QUEUE's
        rows-only segmentation head, taking its first driver row)."""
        q = entrymod.queries()
        o = entrymod.oracle_sql()
        assert set(q) - set(o) == {
            "llm_minhash_dedup",
            "llm_simhash_candidates",
            "llm_unigram_segment",
        }
