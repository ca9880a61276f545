"""Index-maintenance task shape — the IMPORT-LIGHT half of the
scheduled maintenance tick.

Airflow re-parses DAG files continuously in the scheduler, and a
DAG-definition call (`airflow_compat.build_maintenance_dag`) needs only
task names, parameters and dependencies — so this module imports
nothing heavier than the stdlib. The pyspark-heavy maintainers
(`operators.similarity/dedup/text`) resolve at task RUN time through
`_maintainer`; the single-session runner (`runner.maintenance_pipeline`)
builds on the same specs.
"""

from __future__ import annotations

import os

#: index kind → maintain callable (resolved lazily at RUN time)
_MAINTAINERS = {
    "ivf": ("..operators.similarity", "maintain_ivf_index"),
    "minhash": ("..operators.dedup", "maintain_minhash_index"),
    "bm25": ("..operators.text", "maintain_bm25_index"),
}


def maintenance_task_specs(
    ivf_indexes=(), minhash_indexes=(), bm25_indexes=()
) -> list[tuple[str, str, str, dict]]:
    """``[(task_name, kind, path, opts), ...]`` — the maintenance
    tick's task shape. Each index entry is a path or
    ``(path, options_dict)``; basename collisions disambiguate with a
    positional suffix, re-checked until unique (a literal basename that
    happens to match a generated suffix must not silently collide —
    a duplicate task id either overwrites an operator or raises,
    depending on the consumer)."""
    specs: list[tuple[str, str, str, dict]] = []
    seen: set[str] = set()
    for kind, entries in (
        ("ivf", ivf_indexes),
        ("minhash", minhash_indexes),
        ("bm25", bm25_indexes),
    ):
        for entry in entries:
            path, opts = (
                entry if isinstance(entry, tuple) else (entry, {})
            )
            base = os.path.basename(str(path).rstrip("/")) or "index"
            name = f"maintain_{kind}_{base}"
            suffix = len(specs)
            while name in seen:
                name = f"maintain_{kind}_{base}_{suffix}"
                suffix += 1
            seen.add(name)
            specs.append((name, kind, path, dict(opts)))
    return specs


def _maintainer(kind: str):
    """Resolve the maintain callable for ``kind`` at RUN time."""
    import importlib

    mod_name, fn_name = _MAINTAINERS[kind]
    return getattr(
        importlib.import_module(mod_name, package=__package__), fn_name
    )
