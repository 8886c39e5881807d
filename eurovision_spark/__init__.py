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

__all__ = ["get_spark"]
__version__ = "0.1.0"
