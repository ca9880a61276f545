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


def sync_task_specs(
    bm25_syncs=(), ivf_syncs=(), minhash_syncs=()
) -> list[tuple[str, str, str, object, object, dict]]:
    """``[(task_name, kind, index_path, old_src, new_src, opts), ...]``
    — the sync release tick's task shape, shared by
    `runner.sync_pipeline` (DataFrame sources) and
    `airflow_compat.build_sync_dag` (parquet-path sources): one
    naming/dedup rule so the single-session runner and the Airflow DAG
    produce identical task ids for the same inputs (callers correlate
    reports by name). Sources are opaque here — this module stays
    import-light for the scheduler's parse loop. Entries must be
    ``(index_path, old, new)`` or ``(index_path, old, new, opts)``;
    anything else (e.g. a bare path, the maintenance entry shape)
    fails fast instead of being silently character-sliced."""
    specs: list[tuple[str, str, str, object, object, dict]] = []
    seen: set[str] = set()
    for kind, entries in (
        ("bm25", bm25_syncs),
        ("ivf", ivf_syncs),
        ("minhash", minhash_syncs),
    ):
        for entry in entries:
            if not isinstance(entry, (tuple, list)) or len(entry) not in (
                3,
                4,
            ):
                raise ValueError(
                    "sync entry must be (index_path, old, new) or "
                    f"(index_path, old, new, opts); got {entry!r}"
                )
            path, old, new = entry[0], entry[1], entry[2]
            opts = dict(entry[3]) if len(entry) == 4 else {}
            base = os.path.basename(str(path).rstrip("/")) or "index"
            name = f"sync_{kind}_{base}"
            suffix = len(specs)
            while name in seen:
                name = f"sync_{kind}_{base}_{suffix}"
                suffix += 1
            seen.add(name)
            specs.append((name, kind, path, old, new, opts))
    return specs
