"""Invariant tests for the event-analytics operators
(operators/analytics.py) and mixture_weights beyond their DuckDB hash
gates.

The oracle proves each op computes its own definition; these pin the
semantics an analyst relies on:

- funnel_steps: stage timestamps strictly increase, depth matches the
  null pattern, one row per user, and a pure-Python recomputation of
  the staged minima agrees exactly;
- retention_cohorts: offset-0 count equals cohort size, offsets are
  non-negative, and the triangle's total mass equals the number of
  distinct (user, day) pairs;
- mixture_weights: weights are positive, sum to ~1, and are monotone
  in source token counts.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from eurovision_spark.catalog import registry
from eurovision_spark.operators.analytics import DAY_US
from eurovision_spark.sources import load_events

SF = "/root/testdata/sf0.001"


def test_funnel_stage_order_depth_and_python_recompute(spark):
    rows = registry()["funnel_steps"].fn(spark, SF).collect()
    by_user = {}
    for r in rows:
        assert r.user_id not in by_user, "one row per user"
        by_user[r.user_id] = r
        # stage timestamps strictly increase where present
        if r.t_click_us is not None:
            assert r.t_view_us is not None and r.t_click_us > r.t_view_us
        if r.t_purchase_us is not None:
            assert r.t_click_us is not None and r.t_purchase_us > r.t_click_us
        expected_depth = (
            0 if r.t_view_us is None else 1 if r.t_click_us is None else 2
            if r.t_purchase_us is None else 3
        )
        assert r.funnel_depth == expected_depth

    # independent Python recomputation of the staged minima
    ev = load_events(spark, SF).select("user_id", "ts_us", "event_type").collect()
    per_user = defaultdict(list)
    for e in ev:
        per_user[e.user_id].append((e.ts_us, e.event_type))
    assert set(per_user) == set(by_user)
    for uid, evs in per_user.items():
        t1 = min((t for t, k in evs if k == "view"), default=None)
        t2 = (
            min((t for t, k in evs if k == "click" and t > t1), default=None)
            if t1 is not None
            else None
        )
        t3 = (
            min((t for t, k in evs if k == "purchase" and t > t2), default=None)
            if t2 is not None
            else None
        )
        r = by_user[uid]
        assert (r.t_view_us, r.t_click_us, r.t_purchase_us) == (t1, t2, t3)


def test_retention_triangle_mass_and_cohort_day0(spark):
    rows = registry()["retention_cohorts"].fn(spark, SF).collect()
    assert all(r.day_offset >= 0 for r in rows)
    ud = (
        load_events(spark, SF)
        .select("user_id", F.expr(f"ts_us div {DAY_US}").alias("day"))
        .distinct()
    )
    n_user_days = ud.count()
    cohort_sizes = {
        r.cohort_day: r.n
        for r in ud.groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(r.n_users for r in rows) == n_user_days
    day0 = {r.cohort_day: r.n_users for r in rows if r.day_offset == 0}
    assert day0 == cohort_sizes  # everyone is active on their first day


def test_mixture_weights_normalized_and_monotone(spark):
    rows = registry()["mixture_weights"].fn(spark, SF).collect()
    assert all(r.weight > 0 for r in rows)
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-3  # rounded to 6dp per row
    by_tokens = sorted(rows, key=lambda r: r.src_tokens)
    for a, b in zip(by_tokens, by_tokens[1:]):
        assert a.weight <= b.weight


def test_ohlc_hour_bucket_integer_exact_at_edges(spark):
    """ohlc_rollup's hour bucket is integer `div` (truncate toward zero)
    — it must agree with DuckDB's integer `//` at every bigint,
    including exactly ±1 µs around a bucket edge, pre-epoch negatives,
    and beyond-2^53 values where a double divide would lose integer
    exactness (the r04 advice item)."""
    import duckdb

    from eurovision_spark.operators.temporal import HOUR_US

    edges = [0, HOUR_US, 7 * HOUR_US, -HOUR_US, 2**53 - 2**53 % HOUR_US]
    ts = sorted(
        {e + d for e in edges for d in (-1, 0, 1)} | {2**53 + 1, -(2**53) - 1}
    )
    got = dict(
        spark.createDataFrame([(t,) for t in ts], "ts_us bigint")
        .select("ts_us", F.expr(f"ts_us div {HOUR_US}").alias("b"))
        .collect()
    )
    want = dict(
        duckdb.sql(
            "SELECT ts_us, ts_us // {h} FROM (SELECT unnest({ts}::BIGINT[]) "
            "AS ts_us)".format(h=HOUR_US, ts=ts)
        ).fetchall()
    )
    assert got == want
    # the old double-divide formulation genuinely diverges past 2^53
    # (this is what the fix buys, beyond the float-margin nit)
    assert float(2**53 + 1) / HOUR_US * HOUR_US != 2**53 + 1
