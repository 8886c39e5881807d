"""Time-dtype contract: the engine must produce identical results
whatever physical type the producer wrote for ``events.ts``.

Round 3 regression class: the testdata flipped from INT64
TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and every hard-coded ns-long
comparison threw DATATYPE_MISMATCH. This suite writes the SAME logical
events three ways —

  (a) TIMESTAMP(NANOS)  (needs the nanosAsLong legacy conf to read),
  (b) TIMESTAMP(MICROS) (loads as timestamp_ntz),
  (c) plain BIGINT epoch-ns (a producer-written long column)

— and asserts sessionize / session_stats / interval_overlap_join and
the stateful streaming sessionizer agree byte-for-byte across all
three, on a session that did NOT pre-set the legacy conf. It also runs
under a deliberately non-UTC session timezone, which would silently
shift every NTZ-read microsecond if timeaxis didn't pin UTC itself
(ADVICE r03).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE_US = 1_704_067_200_000_000  # 2024-01-01 UTC == campaign 0 start
MIN_US = 60 * 1_000_000

# (user_id, offset from BASE in minutes) — user 1: gap >60min splits
# into 2 sessions; user 2: exactly-61min gap opens a session (strict >
# on the 60-min bound); user 3: single event. Offsets also place every
# session inside interval_overlap_join's campaign 0 window.
EVENTS = [
    (1, 0),
    (1, 10),
    (1, 130),
    (1, 140),
    (2, 5),
    (2, 66),
    (3, 42),
]
EXPECTED_SESSIONS = {1: 2, 2: 2, 3: 1}

FLAVORS = ("ns_ts", "us_ts", "ns_long")


def _write_events(dir_path, flavor: str) -> str:
    us = [BASE_US + m * MIN_US for _, m in EVENTS]
    ns = [u * 1000 for u in us]
    if flavor == "ns_ts":
        ts = pa.array(ns, pa.timestamp("ns"))
    elif flavor == "us_ts":
        ts = pa.array(us, pa.timestamp("us"))
    else:
        ts = pa.array(ns, pa.int64())
    table = pa.table(
        {
            "event_id": pa.array(range(len(EVENTS)), pa.int64()),
            "ts": ts,
            "user_id": pa.array([u for u, _ in EVENTS], pa.int64()),
            "event_type": pa.array(["click"] * len(EVENTS)),
            "value": pa.array([float(i) for i in range(len(EVENTS))]),
            "props": pa.array(["{}"] * len(EVENTS)),
        }
    )
    dir_path.mkdir(parents=True, exist_ok=True)
    # version 2.6 is what permits TIMESTAMP(NANOS) physical storage
    pq.write_table(table, str(dir_path / "events.parquet"), version="2.6")
    return str(dir_path)


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ts_dtypes")
    return {fl: _write_events(root / fl, fl) for fl in FLAVORS}


def _fresh_session(spark):
    """A session that did NOT pre-set nanosAsLong/timeZone at runtime —
    approximates the driver harness's bare session (builder-level confs
    are shared; runtime ones are not)."""
    return spark.newSession()


@pytest.mark.parametrize("query", ["sessionize", "session_stats", "interval_overlap_join"])
def test_batch_results_identical_across_ts_dtypes(spark, fixture_dirs, query):
    from eurovision_spark.catalog import registry

    fn = registry()[query].fn
    results = {}
    for flavor, sf_dir in fixture_dirs.items():
        s = _fresh_session(spark)
        df = fn(s, sf_dir)
        results[flavor] = sorted(tuple(r) for r in df.collect())
    assert results["ns_ts"] == results["us_ts"] == results["ns_long"]
    assert results["us_ts"]  # non-vacuous


def test_sessionize_counts_match_hand_expectation(spark, fixture_dirs):
    from pyspark.sql import functions as F

    from eurovision_spark.catalog import registry

    for sf_dir in fixture_dirs.values():
        got = {
            r.user_id: r.n
            for r in registry()["sessionize"]
            .fn(_fresh_session(spark), sf_dir)
            .groupBy("user_id")
            .agg(F.max("session_id").alias("n"))
            .collect()
        }
        assert got == EXPECTED_SESSIONS


def test_non_utc_session_timezone_does_not_shift_us_values(spark, fixture_dirs):
    """An NTZ ts read through unix_micros casts via the session tz; the
    helper must pin UTC or every microsecond shifts by the tz offset."""
    from eurovision_spark.timeaxis import load_events_dir, with_ts_us

    s = _fresh_session(spark)
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    ev = with_ts_us(load_events_dir(s, fixture_dirs["us_ts"] + "/events.parquet"))
    got = sorted(r.ts_us for r in ev.select("ts_us").collect())
    assert got == sorted(BASE_US + m * MIN_US for _, m in EVENTS)


def test_stream_sessionize_agrees_across_ts_dtypes(spark, fixture_dirs, tmp_path):
    from eurovision_spark.streaming.ingest import stream_sessionize

    results = {}
    for flavor, sf_dir in fixture_dirs.items():
        s = _fresh_session(spark)
        q = stream_sessionize(
            s,
            sf_dir,
            str(tmp_path / f"ckpt_{flavor}"),
            query_name=f"dtype_sess_{flavor}",
        )
        try:
            q.processAllAvailable()
            results[flavor] = {
                (r.user_id, r.n_events, r.n_sessions)
                for r in s.sql(f"SELECT * FROM dtype_sess_{flavor}").collect()
            }
        finally:
            q.stop()
    assert results["ns_ts"] == results["us_ts"] == results["ns_long"]
    assert {u: n for u, _, n in results["us_ts"]} == EXPECTED_SESSIONS
