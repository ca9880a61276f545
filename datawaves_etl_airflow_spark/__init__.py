"""datawaves_etl_airflow_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, every computation the reference
(datawaves-xyz/datawaves-etl-airflow) delegates to an external SQL-runner
jar and external etl CLI packages: schema-on-read staging scans, the
enrich join/projection family, partitioned idempotent sinks, data-quality
verification, and ABI-driven event/call decoding — plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal column plumbing) a 100 TB pipeline needs.

Design stance (SURVEY.md §7): DataFrame/SQL declarative plans, explicit
StructType schemas, Catalyst does the optimizing; pandas UDFs only where
builtins genuinely cannot express the semantics (ABI decode, multimodal).
"""

__version__ = "0.2.0"

#: Lazy re-exports (PEP 562): `session` imports pyspark at module
#: level, and the top package must stay importable from an Airflow
#: scheduler's DAG-parse loop (pipeline.airflow_compat is
#: deliberately import-light) without paying the pyspark import on
#: every parse. ``from datawaves_etl_airflow_spark import get_spark``
#: still works — resolution just happens on first attribute access.
_LAZY_EXPORTS = {
    "CHAINS": "chains",
    "ETHEREUM": "chains",
    "POLYGON": "chains",
    "get_spark": "session",
}

__all__ = list(_LAZY_EXPORTS)


def __getattr__(name: str):
    if name in _LAZY_EXPORTS:
        import importlib

        mod = importlib.import_module(
            f".{_LAZY_EXPORTS[name]}", package=__name__
        )
        return getattr(mod, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )
