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
        """Round-12 rotation: the never-driver-verified queries lead
        their module block, then the r9-stale cohort (freshness
        policy, now enforced mechanically by tools/parity.py
        --freshness: no oracled query's projected green older than
        two rounds) — a budget cut still lands on the freshest
        evidence first."""
        names = list(entrymod.queries())
        # domain block: three r10-green picks (domain went green
        # wall-to-wall in r11; its slots fund the stale llm cohort)
        assert names[0] == "d_new_tokens"
        # llm block: the eight never-driver-verified queries (four
        # r11 post-registration additions + three r12 compositions +
        # the rows-only compression signal) lead the stale cohort
        for new in (
            "llm_image_phash",
            "llm_passage_decontaminate",
            "llm_bigram_logprob",
            "llm_split_leakage",
            "llm_mmr_index",
            "llm_bpe_encode",
            "llm_prf_vs_bm25_eval",
            "llm_compression_ratio",
        ):
            assert names.index(new) < names.index("llm_ann_ivf")
        # generic block: the full r9-stale cohort leads its r10 pick
        for stale in (
            "aj1_asof_clicks",
            "e1_except_parts",
            "w2_running_sum",
            "x2_above_global_avg",
        ):
            assert names.index(stale) < names.index("f_scalar_surface")

    def test_freshness_gate_passes_on_current_registration(self):
        """The rotation is sufficient by construction: the mechanical
        staleness gate (r10 verdict task 8) must pass against the
        registration this file pins."""
        import subprocess
        import sys as _sys

        proc = subprocess.run(
            [_sys.executable, "tools/parity.py", "--freshness"],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=300,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr

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
        """Round 5 (amended r12): every registered query is oracled,
        EXCEPT an explicitly documented rows-only-by-design slot
        taking its first driver row — r12 registers
        llm_compression_ratio once (compressed size is a zlib-build
        property, pytest-pinned vs the interpreter's zlib; the driver
        records rows-only, exactly like the three r4 candidate-set
        rows). The three r4 rows-only sets stay rotated out."""
        q = entrymod.queries()
        o = entrymod.oracle_sql()
        assert set(q) - set(o) == {"llm_compression_ratio"}
