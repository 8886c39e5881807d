"""Catalog-vs-DuckDB oracle checks at smoke scale (sf0.001).

Mirrors the driver's t2 gate: row count + schema + order-insensitive
value hash per query (SURVEY §5 strategy item 2). The full sf0.01 run
is tools/verify_local.py; this keeps `pytest -x -q` fast while still
executing every registered query end-to-end.
"""

from __future__ import annotations

import duckdb
import pytest

from eurovision_spark.catalog import resolve_oracle
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
    res = duck.execute(resolve_oracle(spec, sf_dir))
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), "schema mismatch"
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)


def test_approx_variants_bounded_by_exact(spark):
    """The sketch queries carry deterministic-bound oracles (the in-SQL
    claim column hash-gated at every sf); this test additionally pins
    the raw MAGNITUDES at sf0.001 — the sketches recomputed inline must
    sit within the documented bounds of the exact twins, and every
    bound-claim column must be True (a False would also hash-fail the
    oracle row, but failing here names the offending group)."""
    from pyspark.sql import functions as F

    from eurovision_spark.catalog import registry
    from eurovision_spark.sources import load_table

    r = registry()
    sf = "/root/testdata/sf0.001"
    rows = r["distinct_users_approx"].fn(spark, sf).collect()
    assert rows and all(x.approx_err_le_10pct for x in rows)
    exact = {x.event_type: x.n_users for x in r["distinct_users"].fn(spark, sf).collect()}
    assert {x.event_type: x.n_users for x in rows} == exact
    hll = {
        x.event_type: x.a
        for x in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("a"))
        .collect()
    }
    for k in exact:
        assert abs(hll[k] - exact[k]) <= max(2, 0.10 * exact[k])

    prow = r["percentile_prices_approx"].fn(spark, sf).collect()
    assert prow and all(x.approx_err_le_1pct for x in prow)
    pe = {x.l_returnflag: x.median_price for x in r["percentile_prices"].fn(spark, sf).collect()}
    pa = {
        x.l_returnflag: x.a
        for x in load_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("a"))
        .collect()
    }
    for k in pe:
        assert abs(pa[k] - pe[k]) / pe[k] < 0.01


def test_coverage_md_counts_match_registry():
    """COVERAGE.md's summary line drifted twice (r05: 120 vs 123 —
    VERDICT r06 item #4); pin it to the registry so it cannot drift
    silently again."""
    from pathlib import Path

    from eurovision_spark.catalog import registry

    r = registry()
    n, n_oracled = len(r), sum(1 for s in r.values() if s.oracle is not None)
    text = (Path(__file__).resolve().parent.parent / "COVERAGE.md").read_text()
    assert f"{n} catalog queries total, {n_oracled} with DuckDB oracles" in text
    assert f"catalog is {n}/{n_oracled} machine-gated" in text
