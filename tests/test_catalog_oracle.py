"""Catalog-vs-DuckDB oracle checks at smoke scale (sf0.001).

Mirrors the driver's t2 gate: row count + schema + order-insensitive
value hash per query (SURVEY §5 strategy item 2). The full sf0.01 run
is tools/verify_local.py; this keeps `pytest -x -q` fast while still
executing every registered query end-to-end.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.verify_local import TABLES, table_hash


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


def _all_specs():
    from eurovision_spark.catalog import registry

    return sorted(registry().items())


@pytest.mark.parametrize("name,spec", _all_specs(), ids=[n for n, _ in _all_specs()])
def test_query_matches_oracle(spark, sf_dir, duck, name, spec):
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert srows is not None  # rows-only contract: runs and yields a result
        return
    res = duck.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), "schema mismatch"
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)
