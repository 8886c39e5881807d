"""SparkSession construction for the engine.

One place to set the configs that matter for both the local[32] test
harness and a real multi-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast demotion) — the scale levers SURVEY §4 calls out.
- shuffle.partitions sized to cores locally; on a cluster this is
  AQE-managed via the coalesce initialPartitionNum.
- Arrow enabled for every pandas interchange (Pandas UDFs, toPandas).
- Session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "eurovision_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, then all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 24g: at 8g the local[32] bench showed GC-pressure jitter — one
        # text-heavy query per run randomly 5-10x slower warm; 24g holds
        # the whole suite spike-free (the box carries 128 GiB)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE: no nanosAsLong here — events.ts's physical type is
        # producer-controlled, so timeaxis.ensure_readable probes the
        # parquet footer and sets that legacy conf only when the data
        # actually carries TIMESTAMP(NANOS).
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
