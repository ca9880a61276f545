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
