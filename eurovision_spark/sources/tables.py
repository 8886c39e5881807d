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

from eurovision_spark.timeaxis import ensure_readable, with_ts_us

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
    # events.ts's physical type is producer-controlled (TIMESTAMP NANOS
    # needs the nanosAsLong legacy conf or a default session — e.g. the
    # driver harness's — refuses it with PARQUET_TYPE_ILLEGAL; MICROS
    # needs nothing). Probe the footer and set the conf only when the
    # data actually demands it (timeaxis.ensure_readable).
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        ensure_readable(spark, path)
    return spark.read.parquet(path)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with the canonical epoch-µs bigint ``ts_us`` column
    appended — the ONLY time axis temporal/streaming operators consume
    (see timeaxis.py for the dtype contract)."""
    return with_ts_us(load_table(spark, sf_dir, "events"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
