"""Product-analytics operators over the ``events`` table.

The reference's export answers "which trials match these predicates"
(toexcel.py:100-162); a modern analytics engine over event streams also
answers "what did users DO, in what order" — ordered multi-stage funnel
conversion and cohort retention. Both are classic event-analytics
shapes a warehouse user would expect from the engine, and both reuse
the canonical epoch-µs time axis (timeaxis.py) so the DuckDB oracles
line up exactly via ``epoch_us(ts)``.

Scale notes (100 TB design):

- ``funnel_steps``      : three chained min-over-user windows share ONE
                          exchange on user_id (the stage-k timestamp
                          depends on stage-k-1's, so it cannot be a
                          single groupBy — but all three window passes
                          and the final dedup run on the same
                          partitioning, so rows move once);
- ``retention_cohorts`` : distinct (user, day) first — the raw event
                          volume collapses by ~events-per-user-day
                          before anything else shuffles; the cohort
                          (first-day) aggregate and the join back both
                          key on user_id, co-partitioned with the
                          distinct's exchange. No window over a global
                          order anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from eurovision_spark.catalog import register
from eurovision_spark.sources import load_events

DAY_US = 86_400_000_000

# funnel stage sequence: first view -> first click after it -> first
# purchase after that (strictly increasing timestamps; a click at the
# exact same µs as the view does not count — matches the oracle's >)
FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "funnel_steps",
    """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tu, event_type FROM events),
    s1 AS (
        SELECT user_id, tu, event_type,
               min(CASE WHEN event_type = 'view' THEN tu END)
                   OVER (PARTITION BY user_id) AS t_view
        FROM e),
    s2 AS (
        SELECT user_id, tu, event_type, t_view,
               min(CASE WHEN event_type = 'click' AND tu > t_view THEN tu END)
                   OVER (PARTITION BY user_id) AS t_click
        FROM s1),
    s3 AS (
        SELECT user_id, t_view, t_click,
               min(CASE WHEN event_type = 'purchase' AND tu > t_click THEN tu END)
                   OVER (PARTITION BY user_id) AS t_purchase
        FROM s2)
    SELECT DISTINCT user_id,
           CAST(t_view AS BIGINT) AS t_view_us,
           CAST(t_click AS BIGINT) AS t_click_us,
           CAST(t_purchase AS BIGINT) AS t_purchase_us,
           CAST(CASE WHEN t_view IS NULL THEN 0
                     WHEN t_click IS NULL THEN 1
                     WHEN t_purchase IS NULL THEN 2
                     ELSE 3 END AS INT) AS funnel_depth
    FROM s3
    """,
    "ordered funnel conversion per user: first view, first click "
    "strictly after it, first purchase strictly after that. Stage k's "
    "timestamp depends on stage k-1's, so this is three chained "
    "min-over-user windows — all on the same partitioning, so the plan "
    "shuffles events on user_id ONCE and the window passes + final "
    "per-user dedup are partition-local. The naive per-stage self-join "
    "formulation shuffles three times and blows up on power users; "
    "this shape is linear and skew-tolerant (a user's events fit one "
    "partition's memory iff they fit the window operator's buffer, "
    "same bound sessionize already carries).",
    # driver-facing: hash-certified in CORRECTNESS (swapped in for a rows-only sketch)
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_core(load_events(spark, sf_dir).select("user_id", "ts_us", "event_type"))


def funnel_core(ev: DataFrame) -> DataFrame:
    """The staged-minima funnel over any (user_id, ts_us, event_type)
    DataFrame — split out so property tests (tests/test_properties.py)
    and callers with non-catalog event sources drive the same plan."""
    wu = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(wu)
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t_view")),
                F.col("ts_us"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("t_click")),
                F.col("ts_us"),
            )
        ).over(wu),
    )
    depth = (
        F.when(F.col("t_view").isNull(), 0)
        .when(F.col("t_click").isNull(), 1)
        .when(F.col("t_purchase").isNull(), 2)
        .otherwise(3)
    )
    return s3.select(
        "user_id",
        F.col("t_view").cast("bigint").alias("t_view_us"),
        F.col("t_click").cast("bigint").alias("t_click_us"),
        F.col("t_purchase").cast("bigint").alias("t_purchase_us"),
        depth.cast("int").alias("funnel_depth"),
    ).distinct()


@register(
    "dau_wau",
    f"""
    WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day FROM events),
    dau AS (
        SELECT day, count(*) AS n_dau FROM ud GROUP BY day),
    contrib AS (
        SELECT DISTINCT user_id, day + o AS day
        FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o)),
    wau AS (
        SELECT day, count(*) AS n_wau FROM contrib GROUP BY day)
    SELECT CAST(d.day AS BIGINT) AS day,
           CAST(d.n_dau AS BIGINT) AS n_dau,
           CAST(w.n_wau AS BIGINT) AS n_wau
    FROM dau d JOIN wau w USING (day)
    """,
    "daily + trailing-7-day active users per day. WAU is a count "
    "DISTINCT over a sliding range — inexpressible as a window frame "
    "without holding per-day user sets — so the scalable formulation "
    "EXPLODES each (user, day) into the ≤7 target days it contributes "
    "to, dedups, and counts: a fixed 7x row fan-out of id-pairs (no "
    "text, no sets in flight) and two key-partitioned exchanges, vs "
    "the naive per-day self-join that rescans the activity table 7 "
    "times. Days are emitted only where DAU exists (inner join back).",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    ud = ev.select("user_id", F.expr(f"ts_us div {DAY_US}").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("n_dau"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"),
        )
        .distinct()
    )
    wau = contrib.groupBy("day").agg(F.count("*").alias("n_wau"))
    return dau.join(wau, "day").select(
        F.col("day").cast("bigint").alias("day"),
        F.col("n_dau").cast("bigint").alias("n_dau"),
        F.col("n_wau").cast("bigint").alias("n_wau"),
    )


HOUR_US = 3_600_000_000


@register(
    "gapfill_locf",
    f"""
    WITH b AS (
        SELECT event_type, epoch_us(ts) // {HOUR_US} AS bucket,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS v
        FROM events GROUP BY event_type, epoch_us(ts) // {HOUR_US}),
    rng AS (
        SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
        FROM b GROUP BY event_type),
    spine AS (
        SELECT event_type, unnest(generate_series(lo, hi)) AS bucket FROM rng),
    j AS (
        SELECT s.event_type, s.bucket,
               CAST(coalesce(b.n_events, 0) AS BIGINT) AS n_events, b.v
        FROM spine s LEFT JOIN b USING (event_type, bucket))
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket, n_events,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_sum_filled
    FROM j
    """,
    "gap-filled hourly rollup with last-observation-carried-forward "
    "(the time_bucket_gapfill + locf shape of time-series stores, which "
    "Spark has no native operator for): per-series hourly sums, a dense "
    "bucket spine generated per series from its own [min, max] range, "
    "left-join + ordered fill-down for empty hours. Events collapse to "
    "(series, bucket) aggregates BEFORE the spine join, so the explode "
    "is bounded by series-count x hours, independent of raw event "
    "volume; the fill-down reuses the engine's ordered-window machinery "
    "(operators/filldown.py lineage) partitioned per series — at 100 TB "
    "series-count carries the parallelism, exactly like sessionize's "
    "user_id.",
    # driver-facing: hash-certified in CORRECTNESS (swapped in for a rows-only sketch)
)
def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    b = (
        ev.groupBy("event_type", F.expr(f"ts_us div {HOUR_US}").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("v"),
        )
    )
    rng = b.groupBy("event_type").agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    spine = rng.select(
        "event_type", F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("bucket")
    )
    j = spine.join(b, ["event_type", "bucket"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "event_type",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.last("v", ignorenulls=True).over(w).alias("value_sum_filled"),
    )


ANOM_WIN = 24  # trailing window (hours), current hour excluded
ANOM_Z = 3.0  # |z| alert threshold on the 4dp-rounded score


@register(
    "rate_anomaly",
    f"""
    WITH b AS (
        SELECT event_type, epoch_us(ts) // {HOUR_US} AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, epoch_us(ts) // {HOUR_US}),
    rng AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
            FROM b GROUP BY event_type),
    spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS bucket
              FROM rng),
    g AS (SELECT s.event_type, s.bucket, CAST(coalesce(b.n, 0) AS BIGINT) AS n
          FROM spine s LEFT JOIN b USING (event_type, bucket)),
    w AS (SELECT event_type, bucket, n,
                 CAST(count(*) OVER win AS BIGINT) AS k,
                 CAST(sum(n) OVER win AS BIGINT) AS wsum,
                 CAST(sum(n * n) OVER win AS BIGINT) AS wsumsq
          FROM g
          WINDOW win AS (PARTITION BY event_type ORDER BY bucket
                         ROWS BETWEEN {ANOM_WIN} PRECEDING AND 1 PRECEDING)),
    zc AS (SELECT event_type, bucket, n, k, wsum,
                  {ANOM_WIN} * wsumsq = wsum * wsum AS flat,
                  CASE WHEN k = {ANOM_WIN} THEN round(wsum / {ANOM_WIN}.0, 4)
                       END AS mean_24h,
                  CASE WHEN k = {ANOM_WIN}
                            AND {ANOM_WIN} * wsumsq <> wsum * wsum
                       THEN round((n - wsum / {ANOM_WIN}.0)
                                  / sqrt(greatest(
                                        (wsumsq - wsum * wsum / {ANOM_WIN}.0)
                                            / {ANOM_WIN - 1}.0, 0.0)), 4)
                       END AS z
           FROM w)
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket, n AS n_events,
           mean_24h, z,
           CASE WHEN k < {ANOM_WIN} THEN NULL
                WHEN flat THEN CAST(n * {ANOM_WIN} <> wsum AS INT)
                ELSE CAST(abs(z) > {ANOM_Z!r} AS INT) END AS anomaly
    FROM zc
    """,
    "event-RATE anomaly monitor — the stream-hygiene alert beside "
    "event_health's structural audit: per (event_type, hour), the "
    f"z-score of the hour's event count against its own trailing "
    f"{ANOM_WIN}-hour window (current hour excluded), anomaly = "
    f"|z| > {ANOM_Z} — catching BOTH spikes (a retry storm) and "
    "silent dropouts (a dead producer), because the spine is gapfilled "
    "to explicit zero-count hours first (gapfill_locf's spine — a "
    "missing hour IS the anomaly, and a raw GROUP BY would never emit "
    "it). Warm-up hours (k < window) report NULL, never a fake score. "
    "The all-equal window (variance exactly 0) is decided in INTEGER "
    "arithmetic (window*sumsq = sum^2 — no epsilon, no FP-negative-"
    "variance sqrt(NaN)), where a deviating count alerts by exact "
    "integer compare: the constant-traffic dropout fires without a "
    "defined z. Scale shape: events collapse to (type, hour) counts "
    "BEFORE anything else (one partial/final exchange bounded by "
    "types x hours); the window runs per type over those bounded "
    "rows, types carry the parallelism (the gapfill_locf posture). "
    "Cross-engine: counts/window sums are exact integers, mean/z are "
    "single divisions + one sqrt rounded at 4dp, the alert compares "
    "the ROUNDED z.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rate_anomaly_core(load_events(spark, sf_dir))


def rate_anomaly_core(ev: DataFrame) -> DataFrame:
    """The anomaly grid over any (event_type, ts_us, ...) frame — split
    out so planted spike/dropout tests drive the same plan."""
    # bucket arithmetic is exact cross-engine at EVERY bigint, negative
    # (pre-epoch) ts included: Spark's integer `div` truncates toward
    # zero and DuckDB's integer `//` does too (-5//2 = -2 there, unlike
    # Python's floor) — pinned with a planted pre-1970 frame in
    # tests/test_analytics_ops.py, so the oracle pairing carries no
    # unguarded ts >= epoch assumption (ohlc_rollup's rule)
    b = ev.groupBy(
        "event_type", F.expr(f"ts_us div {HOUR_US}").alias("bucket")
    ).agg(F.count("*").cast("bigint").alias("n"))
    rng = b.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = rng.select(
        "event_type", F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("bucket")
    )
    g = spine.join(b, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
    )
    win = (
        W.partitionBy("event_type").orderBy("bucket").rowsBetween(-ANOM_WIN, -1)
    )
    k = F.count(F.lit(1)).over(win)
    wsum = F.sum("n").over(win)
    wsumsq = F.sum(F.col("n") * F.col("n")).over(win)
    w = g.select(
        "event_type",
        "bucket",
        "n",
        k.cast("bigint").alias("k"),
        wsum.cast("bigint").alias("wsum"),
        wsumsq.cast("bigint").alias("wsumsq"),
    )
    flat = F.lit(ANOM_WIN) * F.col("wsumsq") == F.col("wsum") * F.col("wsum")
    mean = F.col("wsum") / float(ANOM_WIN)
    var = (
        F.col("wsumsq") - F.col("wsum") * F.col("wsum") / float(ANOM_WIN)
    ) / float(ANOM_WIN - 1)
    z = F.round((F.col("n") - mean) / F.sqrt(F.greatest(var, F.lit(0.0))), 4)
    zc = w.select(
        "event_type",
        "bucket",
        "n",
        "k",
        "wsum",
        flat.alias("flat"),
        F.when(F.col("k") == ANOM_WIN, F.round(mean, 4)).alias("mean_24h"),
        F.when((F.col("k") == ANOM_WIN) & ~flat, z).alias("z"),
    )
    return zc.select(
        "event_type",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("n").alias("n_events"),
        "mean_24h",
        "z",
        F.when(F.col("k") < ANOM_WIN, F.lit(None).cast("int"))
        .when(F.col("flat"), (F.col("n") * ANOM_WIN != F.col("wsum")).cast("int"))
        .otherwise((F.abs(F.col("z")) > ANOM_Z).cast("int"))
        .alias("anomaly"),
    )


@register(
    "retention_cohorts",
    f"""
    WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day FROM events),
    c AS (
        SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
    SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
           CAST(ud.day - c.cohort_day AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM ud JOIN c USING (user_id)
    GROUP BY c.cohort_day, ud.day - c.cohort_day
    """,
    "cohort retention: users grouped by first-active day (cohort), "
    "counted on each subsequent active day offset — the classic "
    "retention triangle. The plan collapses raw events to distinct "
    "(user, day) FIRST (one exchange; volume drops by the "
    "events-per-user-day factor before anything else runs), then the "
    "first-day aggregate and the join back are both user_id-keyed and "
    "reuse that partitioning. count(*) is exact because (user, day) "
    "rows are already distinct — no count_distinct shuffle needed.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_core(load_events(spark, sf_dir))


def retention_core(ev: DataFrame) -> DataFrame:
    """The cohort triangle over any (user_id, ts_us, ...) DataFrame —
    split out so property tests drive the same plan as the catalog."""
    ud = ev.select("user_id", F.expr(f"ts_us div {DAY_US}").alias("day")).distinct()
    cohort = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ud.join(cohort, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .select(
            F.col("cohort_day").cast("bigint").alias("cohort_day"),
            F.col("day_offset").cast("bigint").alias("day_offset"),
            "n_users",
        )
    )


@register(
    "user_value_trend",
    f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tu, value FROM events),
    x AS (
        SELECT user_id, value,
               (tu - min(tu) OVER (PARTITION BY user_id)) / 3600000000.0 AS xh
        FROM e),
    g AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               sum(xh) AS sx, sum(value) AS sy,
               sum(xh * value) AS sxy, sum(xh * xh) AS sxx
        FROM x GROUP BY user_id)
    SELECT user_id, n,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 4) AS slope,
           round((sy - ((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0)) * sx) / n, 4)
               AS intercept
    FROM g
    """,
    "per-user engagement trend: least-squares slope/intercept of event "
    "value over hours-since-first-event, computed in CLOSED FORM from "
    "five aggregate sums — regression without MLlib, a UDF, or a "
    "second pass. The min-over-user window and the groupBy share one "
    "user_id exchange (same pattern as funnel_steps); both engines "
    "evaluate the identical formula from their own sums, so the only "
    "cross-engine drift is summation order, absorbed by round(4). "
    "Zero-variance users (all events in one instant) yield NULL via "
    "nullif, never a divide-by-zero.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "ts_us", "value")
    wu = W.partitionBy("user_id")
    x = ev.select(
        "user_id",
        "value",
        ((F.col("ts_us") - F.min("ts_us").over(wu)) / 3_600_000_000.0).alias("xh"),
    )
    g = x.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xh").alias("sx"),
        F.sum("value").alias("sy"),
        F.sum(F.col("xh") * F.col("value")).alias("sxy"),
        F.sum(F.col("xh") * F.col("xh")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    denom = F.nullif(n * sxx - sx * sx, F.lit(0))
    slope = (n * sxy - sx * sy) / denom
    return g.select(
        "user_id",
        "n",
        F.round(slope, 4).alias("slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
    )


TOP_TRIGRAMS = 20


@register(
    "event_trigrams",
    f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events),
    t AS (
        SELECT event_type,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
    tri AS (
        SELECT event_type || '>' || t1 || '>' || t2 AS trigram
        FROM t WHERE t2 IS NOT NULL)
    SELECT trigram, CAST(count(*) AS BIGINT) AS n
    FROM tri GROUP BY trigram
    ORDER BY n DESC, trigram LIMIT {TOP_TRIGRAMS}
    """,
    "behavioral path mining: the most common 3-step event sequences "
    "across users (per-user order, event_id tiebreak on simultaneous "
    "events). Two lead() windows share ONE user_id exchange; trigram "
    "counting is a partial+final aggregate; the top-k is "
    "TakeOrderedAndProject (never a global sort). The per-user ordered "
    "buffer is the same bound sessionize carries — no collect_list of "
    "whole user histories into one row.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts_us", "event_id")
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    t = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    tri = t.filter(F.col("t2").isNotNull()).select(
        F.concat_ws(">", "event_type", "t1", "t2").alias("trigram")
    )
    return (
        tri.groupBy("trigram")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "trigram")
        .limit(TOP_TRIGRAMS)
    )


# --- data-quality audit family (deequ/dbt-test-style checks) ---------------

DQ_COLUMNS = ("event_id", "ts_us", "user_id", "event_type", "value", "props")


@register(
    "dq_profile",
    """
    WITH e AS (
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
        FROM events),
    u AS (
        SELECT 'event_id' AS col_name, count(*) - count(event_id) AS n_nulls,
               count(DISTINCT event_id) AS n_distinct FROM e
        UNION ALL
        SELECT 'ts_us', count(*) - count(ts_us), count(DISTINCT ts_us) FROM e
        UNION ALL
        SELECT 'user_id', count(*) - count(user_id), count(DISTINCT user_id) FROM e
        UNION ALL
        SELECT 'event_type', count(*) - count(event_type),
               count(DISTINCT event_type) FROM e
        UNION ALL
        SELECT 'value', count(*) - count(value), count(DISTINCT value) FROM e
        UNION ALL
        SELECT 'props', count(*) - count(props), count(DISTINCT props) FROM e)
    SELECT col_name, CAST(n_nulls AS BIGINT) AS n_nulls,
           CAST(n_distinct AS BIGINT) AS n_distinct
    FROM u
    """,
    "data-quality column profile (the deequ/dbt-test audit shape): "
    "null count + distinct count per events column in ONE pass — all "
    "six columns' aggregates ride a single scan + aggregate (Spark "
    "plans count_distinct over multiple columns as one expand + "
    "aggregate, not six scans). At 100 TB swap the exact distincts "
    "for approx_count_distinct, same output contract.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(*DQ_COLUMNS)
    agg = ev.agg(
        *[
            f
            for c in DQ_COLUMNS
            for f in (
                (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
                F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            )
        ]
    )
    stacked = agg.select(
        F.expr(
            "stack({n}, {args}) AS (col_name, n_nulls, n_distinct)".format(
                n=len(DQ_COLUMNS),
                args=", ".join(
                    f"'{c}', {c}__nulls, {c}__distinct" for c in DQ_COLUMNS
                ),
            )
        )
    )
    return stacked.select(
        "col_name",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


@register(
    "ri_check",
    """
    SELECT 'lineitem->orders' AS relation,
           CAST(count(*) AS BIGINT) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer',
           CAST(count(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem->part',
           CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    """,
    "referential-integrity audit: orphan counts per foreign-key "
    "relation via anti-joins (the check the reference's by-construction "
    "integrity never verifies, SURVEY §1.2 'no FK constraint'). Parent "
    "key sets broadcast when small; each relation is one anti-join + "
    "count, unioned — no row data moves, only keys.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def ri_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eurovision_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")

    def orphans(child, key, parent, pkey, name):
        return (
            child.select(F.col(key))
            .join(parent.select(F.col(pkey).alias(key)), key, "left_anti")
            .agg(F.count("*").cast("bigint").alias("n_orphans"))
            .select(F.lit(name).alias("relation"), "n_orphans")
        )

    return (
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(orphans(o, "o_custkey", c, "c_custkey", "orders->customer"))
        .unionByName(orphans(li, "l_partkey", p, "p_partkey", "lineitem->part"))
    )


@register(
    "event_health",
    """
    WITH e AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS tu FROM events),
    flagged AS (
        SELECT event_type, event_id, tu,
               CASE WHEN tu < max(tu) OVER (
                        PARTITION BY user_id ORDER BY event_id, tu
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS ooo
        FROM e)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS n_dup_ids,
           CAST(sum(ooo) AS BIGINT) AS n_out_of_order,
           CAST(max(tu) - min(tu) AS BIGINT) AS span_us
    FROM flagged GROUP BY event_type
    """,
    "event-stream hygiene audit (the events-side twin of dq_profile): "
    "per event_type, duplicate-id count, out-of-order arrivals (event "
    "time regressing vs the running max in event_id arrival order, per "
    "user — the signal that sizes a streaming watermark), and time "
    "span. One user_id exchange feeds the arrival-order window; the "
    "per-type rollup then moves only per-type partials. This is the "
    "report you run BEFORE picking withWatermark bounds at 100 TB.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def event_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    # ts_us tie-break: duplicate event_ids (the dirty-stream case this
    # audit exists to count) would otherwise make the ROWS frame — and
    # so the ooo flag — ordering-nondeterministic across engines/reruns
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id", "ts_us")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ooo = (
        F.when(F.col("ts_us") < F.max("ts_us").over(w), 1).otherwise(0)
    )
    return (
        ev.select("event_id", "event_type", "ts_us", ooo.alias("ooo"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.count("*") - F.countDistinct("event_id")).cast("bigint").alias("n_dup_ids"),
            F.sum("ooo").cast("bigint").alias("n_out_of_order"),
            (F.max("ts_us") - F.min("ts_us")).cast("bigint").alias("span_us"),
        )
    )


@register(
    "user_top_event",
    """
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type),
    r AS (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rn
        FROM c)
    SELECT user_id, event_type AS top_event, n AS n_events
    FROM r WHERE rn = 1
    """,
    "per-group mode (each user's most frequent event type): count per "
    "(user, type), then rank within user — integer counts with a "
    "lexicographic tie-break, so the winner is deterministic in both "
    "engines (SQL mode() has engine-specific ties and is avoided). The "
    "count pre-aggregation map-side-combines, so the user_id exchange "
    "moves at most |event_types| rows per user, never raw events.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def user_top_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event"), F.col("n").alias("n_events"))
    )
