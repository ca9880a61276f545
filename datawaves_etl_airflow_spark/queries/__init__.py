"""Driver-facing query corpus.

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL twins). The
repo-root ``__spark_entry__.py`` aggregates them; names missing from
``ORACLES`` get the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible ops).
"""
