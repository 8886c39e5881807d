"""Parquet star-schema source (the engine's native store, SURVEY §7).

The testdata layout is one parquet file per table under an sf dir
(TESTDATA.md). Loading goes through ``spark.read.parquet`` so Catalyst
gets vectorized scans, predicate pushdown, and column pruning for free —
the replacement for the reference's SQLite B-tree scans
(reference toexcel.py:29, 97-98).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet is written with INT64 TIMESTAMP(NANOS); a default
    # SparkSession (e.g. the driver harness's) refuses it with
    # PARQUET_TYPE_ILLEGAL unless this legacy conf is on.  It is
    # runtime-settable and idempotent, so set it here instead of relying
    # on session.get_spark having built the session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
