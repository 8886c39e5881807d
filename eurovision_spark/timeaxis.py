"""Dtype-adaptive event-time axis.

``events.ts`` can legitimately arrive as any of:

- INT64 TIMESTAMP(NANOS)  -> Spark reads bigint ns, but only with
  ``spark.sql.legacy.parquet.nanosAsLong`` on (otherwise
  PARQUET_TYPE_ILLEGAL);
- TIMESTAMP(MICROS)       -> ``timestamp`` or ``timestamp_ntz``
  depending on isAdjustedToUTC / inferTimestampNTZ;
- a plain BIGINT column the producer already wrote as epoch ns.

A real user's parquet could carry either, and hard-coding one physical
type breaks the moment the producer changes (exactly what happened when
the testdata regenerated from NANOS to MICROS). So the engine
normalizes ONCE at the source into a canonical **epoch-microsecond
bigint** column ``ts_us``; every temporal and streaming operator
consumes only that. Microseconds is the right canonical unit because it
is DuckDB's native TIMESTAMP resolution (oracles speak ``epoch_us(ts)``
unchanged) and it survives round-trips through
``timestamp_micros``/``unix_micros`` losslessly.

Timezone: converting a ``timestamp_ntz`` through ``unix_micros``
implicitly casts via the session timezone, and DuckDB's ``epoch_us``
reads the naive value as-is (i.e. as UTC). NTZ values are therefore
converted with session-timezone-FREE arithmetic —
``timestampdiff(MICROSECOND, epoch_ntz, ts)`` is pure wall-clock math —
so a non-UTC user session gets correct values WITHOUT the engine
mutating ``spark.sql.session.timeZone`` behind the user's back
(verified under America/New_York in tests/test_timeaxis_contract.py).

Scale note: the footer probe reads ONE parquet footer on the driver
(~KBs) — not a data scan — and is cached per path. At 100 TB the
normalization itself is a per-row projection fused into the scan by
whole-stage codegen; it never adds a shuffle.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, LongType, TimestampNTZType, TimestampType

# 60-minute inactivity gap, in canonical microseconds.
SESSION_GAP_US = 60 * 60 * 1_000_000

US_PER_DAY = 86_400_000_000


def _one_parquet_file(path: str) -> str | None:
    """``path`` may be a single parquet file, a directory of parts, or a
    Hive-partitioned tree (key=value subdirectories) — the probe walks
    to the first part file wherever it nests, since a NANOS producer is
    just as likely to partition its output."""
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for root, dirs, names in sorted(os.walk(path)):
            dirs.sort()
            for entry in sorted(names):
                if entry.endswith(".parquet"):
                    return os.path.join(root, entry)
    return None


def parquet_ts_unit(path: str, col: str = "ts") -> str | None:
    """Physical timestamp unit ('ns'/'us'/'ms'/'s') of ``col`` from the
    parquet footer, or None if absent / not a timestamp. Driver-side
    footer read only — no data scan. Cached per (file, mtime, size), so
    a file REGENERATED in place with a different physical type — the
    exact producer flip this module absorbs — invalidates naturally
    instead of serving the stale unit for the life of the process."""
    try:
        f = _one_parquet_file(path)
        if f is None:
            return None
        st = os.stat(f)
        return _ts_unit_cached(f, st.st_mtime_ns, st.st_size, col)
    except Exception:
        return None


@lru_cache(maxsize=256)
def _ts_unit_cached(f: str, mtime_ns: int, size: int, col: str) -> str | None:
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    schema = pq.read_schema(f)
    if col not in schema.names:
        return None
    typ = schema.field(col).type
    return typ.unit if pat.is_timestamp(typ) else None


def ensure_readable(spark: SparkSession, path: str, col: str = "ts") -> None:
    """Set the nanosAsLong legacy conf IFF the footer shows a NANOS
    timestamp (a default session refuses those). Micros/plain-bigint
    files need no conf, and setting it unconditionally would imply a
    contract the data doesn't honor."""
    if parquet_ts_unit(path, col) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def ts_us_col(dtype: DataType, col: str = "ts") -> Column:
    """Canonical epoch-µs bigint expression for a loaded ``ts`` column.

    bigint = epoch ns (the nanosAsLong read, or a producer-written ns
    column) -> integer-divide; ltz timestamps -> unix_micros (already a
    UTC instant, session-tz-independent); ntz -> wall-clock µs since the
    ntz epoch via timestampdiff — tz-free, no session conf touched
    (see module docstring).
    """
    if isinstance(dtype, LongType):
        return F.expr(f"{col} div 1000")
    if isinstance(dtype, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )
    if isinstance(dtype, TimestampType):
        return F.unix_micros(F.col(col))
    raise TypeError(f"unsupported time-axis dtype for {col!r}: {dtype}")


def event_ts_col(dtype: DataType, col: str = "ts") -> Column:
    """TIMESTAMP-typed expression (for watermarks / window() /
    session_window()), same µs values as ``ts_us_col``. The ntz branch
    re-renders the naive-as-UTC instant through current_timezone()
    before the ltz cast, so the two tz applications cancel and the
    instant is session-tz-independent."""
    if isinstance(dtype, LongType):
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    if isinstance(dtype, TimestampNTZType):
        return F.expr(
            f"cast(convert_timezone('UTC', current_timezone(), {col}) as timestamp)"
        )
    if isinstance(dtype, TimestampType):
        return F.col(col)
    raise TypeError(f"unsupported time-axis dtype for {col!r}: {dtype}")


def with_ts_us(df: DataFrame, col: str = "ts") -> DataFrame:
    """Append the canonical ``ts_us`` column, whatever ``ts``'s dtype."""
    return df.withColumn(
        "ts_us", ts_us_col(df.schema[col].dataType, col)
    )


def load_events_dir(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read an events parquet file/dir, dtype-safely."""
    ensure_readable(spark, path)
    return spark.read.parquet(path)


def stream_events_source(spark: SparkSession, path: str) -> DataFrame:
    """Streaming read of an events dir, dtype-safely (file streams need
    an explicit schema; take it from a batch footer read)."""
    ensure_readable(spark, path)
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)
