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
        """Round-11 rotation: the never-driver-verified queries lead
        their module block, then the stalest cohorts (freshness
        policy: no driver green older than two rounds) — a budget cut
        still lands on the freshest evidence first."""
        names = list(entrymod.queries())
        # domain block: the three r8-stale deferrals lead
        assert names[0] == "d_enrich_transactions"
        # llm block: the seven r11 additions + fourteen r10
        # post-rotation additions (all never driver-verified) lead,
        # then the r8-stale cohort, then the r9 anchors
        for new in (
            "llm_minhash_sync",
            "llm_hard_negatives",
            "llm_source_overlap",
            "llm_bpe_pairs",
            "llm_epoch_upsample",
            "llm_corpus_stats",
            "llm_jaccard_prefix",
            "llm_ann_ivf_deleted",
            "llm_bm25_sync",
            "llm_token_budget",
        ):
            assert names.index(new) < names.index("llm_ann_ivf_2level")
        # generic block: the five r8-stale deferrals lead
        for stale in (
            "aj2_asof_bucketed",
            "g1_rollup_returnflag",
            "h2_range_pruned_scan",
            "j5_composite_key_join",
            "w4_rolling_range_window",
        ):
            assert names.index(stale) < names.index("a1_count_existence")

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
        """Round 5: ALL 50 registered queries are oracled — the three
        rows-only xxhash64 candidate sets got their driver rows in r4
        and rotate out (their recall/equivalence stays pinned in
        test_dedup/test_similarity/test_advice_r3)."""
        q = entrymod.queries()
        o = entrymod.oracle_sql()
        assert set(q) - set(o) == set()
