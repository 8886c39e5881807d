"""Local mirror of the driver's correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle at a given sf,
compares row count, sorted column names, and an order-insensitive
value hash (rows canonicalized to strings, column-name-sorted, row
multiset hashed). Prints one line per query + a summary.

Usage: python tools/verify_local.py [--bare] [--driver-only] [sf_dir] [query ...]

--bare: build a DEFAULT SparkSession (no engine configs) instead of
get_spark — exactly the driver harness's environment. --driver-only:
verify only the driver-facing surface (QuerySpec.driver). Together they
replicate the driver's CORRECTNESS run.
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eurovision_spark.sources.tables import TABLES  # noqa: E402 — single source of truth


def canon_value(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        # non-finite first: int(inf) raises OverflowError
        if not math.isfinite(v):
            return "NaN" if math.isnan(v) else ("Inf" if v > 0 else "-Inf")
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def esc(v: str) -> str:
        # escape the joiner: without it, ('a|b','c') and ('a','b|c')
        # hash identically and a real mismatch can read as OK
        return v.replace("\\", "\\\\").replace("|", "\\|")

    lines = sorted("|".join(esc(canon_value(r[i])) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    args = [a for a in sys.argv[1:]]
    bare = "--bare" in args
    driver_only = "--driver-only" in args
    args = [a for a in args if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from eurovision_spark.catalog import registry, resolve_oracle

    if bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("verify_bare")
            .getOrCreate()
        )
    else:
        from eurovision_spark import get_spark

        spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    specs = registry()
    failures = []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        if driver_only and not spec.driver:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name:24s} spark error: {e}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"ok-   {name:24s} rows-only: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            oracle_sql = resolve_oracle(spec, sf_dir)
        except Exception as e:  # noqa: BLE001
            # mirror the driver harness: a DYNAMIC oracle failing to
            # resolve degrades that query to rows-only (the driver's
            # oracle_sql() swallows resolve errors), it does not fail
            print(f"ok-   {name:24s} rows-only (oracle unresolvable: {e}) "
                  f"{len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracle_sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name:24s} oracle error: {e}")
            failures.append(name)
            continue
        sn, sh = table_hash(scols, srows)
        on, oh = table_hash(ocols, orows)
        schema_ok = sorted(scols) == sorted(ocols)
        if sn == on and sh == oh and schema_ok:
            print(f"OK    {name:24s} {sn} rows hash={sh} ({time.time()-t0:.1f}s)")
        else:
            print(
                f"FAIL  {name:24s} spark=({sn},{sh},{sorted(scols)}) "
                f"duck=({on},{oh},{sorted(ocols)})"
            )
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
