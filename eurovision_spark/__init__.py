"""eurovision_spark — a PySpark-native analytics engine.

A ground-up, idiomatic Spark SQL / DataFrame rebuild of the query and
data-processing capabilities of the reference (dhakajack/Eurovision):
registry text ingestion, per-trial consolidation, predicate search,
denormalized export — plus scale-ready dedup / similarity / text-analysis
operators for large training-data pipelines.

Layout
------
- ``session``     : SparkSession construction tuned for this engine.
- ``fieldspec``   : the declarative field-spec table (SURVEY §1.4) that
                    drives parser columns, schemas, and oracle DDL.
- ``sources``     : scans — registry text, parquet star schema, fetcher.
- ``operators``   : parse/merge/dedup/similarity/text ops (SURVEY §2).
- ``functions``   : scalar column helpers shared across operators.
- ``plans``       : query builders (search semi-join pruning, export).
- ``streaming``   : Structured Streaming parity (incremental ingest).
"""

from eurovision_spark.session import get_spark

__all__ = [
    "get_spark",
    "parse_registry",
    "promote_types",
    "search_and_export",
    "search_trials",
    "registry",
    "write_parquet",
    "write_bucketed",
    "write_sqlite",
    "write_excel",
    "write_csv",
]
__version__ = "0.1.0"

_LAZY = {
    "parse_registry": ("eurovision_spark.operators.parse", "parse_registry"),
    "promote_types": ("eurovision_spark.operators.parse", "promote_types"),
    "search_and_export": ("eurovision_spark.plans.search", "search_and_export"),
    "search_trials": ("eurovision_spark.plans.search", "search_trials"),
    "registry": ("eurovision_spark.catalog", "registry"),
    "write_parquet": ("eurovision_spark.sinks", "write_parquet"),
    "write_bucketed": ("eurovision_spark.sinks", "write_bucketed"),
    "write_sqlite": ("eurovision_spark.sinks", "write_sqlite"),
    "write_excel": ("eurovision_spark.sinks", "write_excel"),
    "write_csv": ("eurovision_spark.sinks", "write_csv"),
}


def __getattr__(name: str):
    # lazy so `import eurovision_spark` stays light (pulling the
    # operator modules eagerly would also trigger catalog registration)
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
