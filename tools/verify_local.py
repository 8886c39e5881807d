"""Local mirror of the driver's correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle at a given sf,
compares row count, sorted column names, and an order-insensitive
value hash (rows canonicalized to strings, column-name-sorted, row
multiset hashed). Prints one line per query + a summary.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_value(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
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
    lines = sorted("|".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from eurovision_spark import get_spark
    from eurovision_spark.catalog import registry

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
            res = con.execute(spec.oracle)
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
