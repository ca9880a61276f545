"""Driver-facing query corpus.

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL twins). The
repo-root ``__spark_entry__.py`` aggregates them; names missing from
``ORACLES`` get the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible ops).
"""

#: The round the current DRIVER_QUERIES registration was authored FOR
#: (r12 verdict "What's wrong #1"): the freshness gate projects ages
#: against THIS round, not against max(committed CORRECTNESS)+1 — so
#: the repo stays green when the round's own driver file lands, and
#: turns red only when a round actually completes WITHOUT a rotation
#: (CORRECTNESS_r{N}.json on disk with N > REGISTRATION_ROUND). Each
#: round's rotation must bump this together with the re-registration.
REGISTRATION_ROUND = 14
