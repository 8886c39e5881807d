"""Temporal operators over the ``events`` table.

The reference's parser is an order-driven state machine (record
boundaries scan.py:341-351, in-block flags scan.py:378-397); its Spark
mapping is ordered windows (SURVEY §2.5). This module generalizes those
two window shapes into the event-time operators every large pipeline
needs and the reference cannot express:

- gap sessionization : boundary-detect (lag) + running sum — the same
  fill-down/flag machinery as the parser, keyed by time gaps;
- as-of join         : "latest right-side row at or before each left
  row" via the union + ordered fill-down trick — ONE shuffle on
  (user_id), no per-row lookups, no pandas. This is the scalable
  formulation: a sort-merge of both streams in a single window pass,
  vs the naive per-left-row subquery.

Time axis: every operator here consumes the canonical epoch-µs bigint
``ts_us`` column from ``sources.load_events`` (timeaxis.py) — the
producer may write TIMESTAMP(NANOS), TIMESTAMP(MICROS), or raw bigint
ns, and the normalization happens once at the source. Gap/duration
arithmetic in µs matches DuckDB's native TIMESTAMP resolution, so the
oracles' ``epoch_us``/INTERVAL expressions line up exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from eurovision_spark.catalog import register
from eurovision_spark.sources import load_events, load_table
from eurovision_spark.timeaxis import SESSION_GAP_US


@register(
    "sessionize",
    """
    WITH g AS (
        SELECT event_id, user_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 60 MINUTE
                    THEN 1 ELSE 0 END AS is_new,
               ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
    FROM g
    """,
    "gap-based sessionization (60-min inactivity closes a session): "
    "lag-detect boundaries, running-sum them into session ids — the "
    "reference's record-boundary state machine (scan.py:341-351) "
    "generalized to event time. One shuffle on user_id serves both "
    "windows; batch twin of the streaming session window in "
    "streaming/ingest.py.",
    driver=False,  # driver gate: certified via session_stats (same window)
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(is_new).over(wrun).cast("bigint").alias("session_id"),
    )


@register(
    "asof_join",
    """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
         errs AS (SELECT event_id AS err_id, user_id, ts FROM events
                  WHERE event_type = 'error')
    SELECT c.event_id AS click_id, c.user_id, e.err_id AS last_error_id
    FROM clicks c ASOF LEFT JOIN errs e
      ON c.user_id = e.user_id AND e.ts <= c.ts
    """,
    "as-of join (latest error at-or-before each click, per user) as a "
    "union + ordered fill-down: tag both streams, one window pass "
    "carries the last right-side id forward, keep left rows. Cost = one "
    "shuffle on user_id + a partition-local sort; never a per-row "
    "lookup. Rights sort before lefts at equal ts to match ASOF's "
    "inclusive bound.",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    u = ev.filter(F.col("event_type").isin("click", "error")).select(
        "event_id",
        "user_id",
        "ts_us",
        "event_type",
        # 0 sorts the right stream first on ts ties -> inclusive <=
        F.when(F.col("event_type") == "error", 0).otherwise(1).alias("side"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.withColumn(
        "last_error_id",
        F.last(
            F.when(F.col("event_type") == "error", F.col("event_id")), ignorenulls=True
        ).over(w),
    )
    return filled.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "last_error_id"
    )


DAY_US = 86_400_000_000
CAMPAIGN_BASE_US = 1_704_067_200_000_000  # 2024-01-01 UTC
N_CAMPAIGNS = 10
CAMPAIGN_DAYS = 3


@register(
    "interval_overlap_join",
    f"""
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 60 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM g),
    sessions AS (
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               epoch_us(min(ts)) AS s_start, epoch_us(max(ts)) AS s_end
        FROM s GROUP BY user_id, session_id),
    campaigns AS (
        SELECT CAST(j AS INT) AS campaign_id,
               {CAMPAIGN_BASE_US} + j * {CAMPAIGN_DAYS} * {DAY_US} AS c_start,
               {CAMPAIGN_BASE_US} + (j + 1) * {CAMPAIGN_DAYS} * {DAY_US} AS c_end
        FROM (SELECT unnest(generate_series(0, {N_CAMPAIGNS - 1})) AS j))
    SELECT s.user_id, s.session_id, c.campaign_id
    FROM sessions s JOIN campaigns c
      ON s.s_start < c.c_end AND c.c_start <= s.s_end
    """,
    "interval-overlap join: user sessions (gap-sessionized intervals) x "
    "half-open campaign windows. The Spark side demonstrates the "
    "SCALABLE big-big formulation: both interval sets expand to the day "
    "buckets they cover, equi-join on bucket, and each overlapping pair "
    "matches exactly once — the join keeps only the bucket containing "
    "the LATER of the two starts (that day lies in both intervals, so "
    "no post-join dedup). Shuffle cost is O(rows x days-spanned) on an "
    "equi-key — no quadratic range probe, no broadcast requirement; "
    "the oracle states the plain overlap predicate.",
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    # ts_us is already the µs DuckDB's epoch_us sees, whatever the
    # parquet physical type (ns reads are truncated the same way)
    sessions = (
        ev.select("user_id", "ts_us", F.sum(is_new).over(wrun).cast("bigint").alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("s_start"),
            F.max("ts_us").alias("s_end"),
        )
    )
    camps = spark.range(N_CAMPAIGNS).select(
        F.col("id").cast("int").alias("campaign_id"),
        (F.lit(CAMPAIGN_BASE_US) + F.col("id") * CAMPAIGN_DAYS * DAY_US).alias("c_start"),
        (F.lit(CAMPAIGN_BASE_US) + (F.col("id") + 1) * CAMPAIGN_DAYS * DAY_US).alias("c_end"),
    )
    sess_b = sessions.withColumn(
        "s_bucket", F.explode(F.sequence(F.expr(f"s_start div {DAY_US}"), F.expr(f"s_end div {DAY_US}")))
    )
    camp_b = camps.withColumn(
        "c_bucket", F.explode(F.sequence(F.expr(f"c_start div {DAY_US}"), F.expr(f"(c_end - 1) div {DAY_US}")))
    )
    return (
        sess_b.join(
            camp_b,
            (F.col("s_bucket") == F.col("c_bucket"))
            & (F.col("s_start") < F.col("c_end"))
            & (F.col("c_start") <= F.col("s_end"))
            # dedup-free anchor: only the bucket holding the later start
            & (F.col("s_bucket") == F.expr(f"greatest(s_start, c_start) div {DAY_US}")),
        )
        .select("user_id", "session_id", "campaign_id")
    )


@register(
    "session_stats",
    """
    WITH g AS (
        SELECT event_id, user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 60 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT event_id, user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM g)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST((epoch_us(max(ts)) - epoch_us(min(ts))) AS BIGINT) AS duration_us,
           round(sum(value), 2) AS value_sum
    FROM s GROUP BY user_id, session_id
    """,
    "per-session rollup on top of gap sessionization: event count, "
    "duration, value sum. The session assignment reuses the sessionize "
    "window (one user_id exchange serves windows AND the final "
    "aggregation — same key, no extra shuffle).",
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    s = ev.select(
        "user_id",
        "ts_us",
        "value",
        F.sum(is_new).over(wrun).cast("bigint").alias("session_id"),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        # ts_us is truncated to µs BEFORE subtraction (DuckDB reads any
        # ns parquet truncated to µs, so floor(a)-floor(b), never
        # floor(a-b) — off by one when sub-µs fractions differ)
        (F.max("ts_us") - F.min("ts_us")).cast("bigint").alias("duration_us"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


HOUR_US = 3_600_000_000


@register(
    "time_weighted_avg",
    """
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS ts_us, value,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_us
        FROM events),
    w AS (SELECT user_id, value, next_us - ts_us AS w_us
          FROM o WHERE next_us IS NOT NULL)
    SELECT user_id,
           round(sum(value * w_us) / sum(w_us), 2) AS twa_value,
           CAST(sum(w_us) AS BIGINT) AS span_us
    FROM w GROUP BY user_id HAVING sum(w_us) > 0
    """,
    "time-weighted average (the TimescaleDB `time_weight` shape): each "
    "observation holds until the next one, so its weight is the gap to "
    "its successor — the honest mean for irregularly-sampled state "
    "(a plain AVG over-counts burst periods). One lead() window and "
    "the final rollup share a single user_id exchange; the last "
    "observation of each series carries no weight (nothing after it to "
    "hold over) and single-event series drop (zero span). Weights come "
    "from the canonical µs axis, so the oracle's epoch_us arithmetic "
    "lines up exactly.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01/0.1 (verify)
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    o = ev.select(
        "user_id",
        "value",
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("w_us"),
    ).filter(F.col("w_us").isNotNull())
    return (
        o.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("w_us")) / F.sum("w_us"), 2
            ).alias("twa_value"),
            F.sum("w_us").cast("bigint").alias("span_us"),
        )
        .filter(F.col("span_us") > 0)
    )


@register(
    "ohlc_rollup",
    f"""
    SELECT event_type,
           CAST(epoch_us(ts) // {HOUR_US} AS BIGINT) AS hour_bucket,
           arg_min(value, CAST(epoch_us(ts) AS HUGEINT) * 1000000000
                          + event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 1000000000
                          + event_id) AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type, CAST(epoch_us(ts) // {HOUR_US} AS BIGINT)
    """,
    "OHLC candlestick rollup (the financial/monitoring downsample): "
    "per (series, hour) the first, max, min, and last observation plus "
    "the sample count — first/last are min_by/max_by under the "
    "deterministic (ts, event_id) order, so ties can't flip between "
    "engines, and the open/high/low/close floats are pass-through "
    "values (no re-associated arithmetic to round). ONE partial+final "
    "aggregation: min_by/max_by combine map-side like any other agg, "
    "so a series' full history never gathers on one node — the "
    "downsampling shape that replaces per-bucket sorting windows at "
    "100 TB.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01/0.1 (verify)
)
def ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    # composite scalar order key (DuckDB arg_min/arg_max take a scalar,
    # not a struct): ts_us * 1e9 + event_id needs 128-bit headroom, so
    # decimal(38,0) here mirrors the oracle's HUGEINT — event ids are
    # bounded far below the 1e9 multiplier
    order = (
        F.col("ts_us").cast("decimal(38,0)") * 1000000000 + F.col("event_id")
    )
    # integer `div` (truncate toward zero) mirrors DuckDB's integer `//`
    # exactly at every bigint — including negative pre-epoch ts and
    # beyond-2^53 values where a double divide loses integer exactness
    return ev.groupBy(
        "event_type",
        F.expr(f"ts_us div {HOUR_US}").alias("hour_bucket"),
    ).agg(
        F.min_by("value", order).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", order).alias("close"),
        F.count("*").cast("bigint").alias("n_events"),
    )


@register(
    "scd2_history",
    """
    WITH o AS (
        SELECT o_custkey, o_orderstatus,
               strftime(o_orderdate, '%Y-%m-%d') AS od, o_orderkey
        FROM orders),
    marked AS (
        SELECT o_custkey, o_orderstatus, od, o_orderkey,
               lag(o_orderstatus) OVER w AS prev
        FROM o
        WINDOW w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey)),
    runs AS (
        SELECT o_custkey, o_orderstatus, od,
               CAST(sum(CASE WHEN prev IS NULL OR prev <> o_orderstatus
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS version
        FROM marked),
    segs AS (
        SELECT o_custkey, o_orderstatus AS status, version,
               min(od) AS valid_from,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM runs GROUP BY o_custkey, o_orderstatus, version)
    SELECT o_custkey, status, version, valid_from,
           lead(valid_from) OVER w2 AS valid_to,
           CAST(CASE WHEN lead(valid_from) OVER w2 IS NULL THEN 1 ELSE 0 END
                AS INT) AS is_current,
           n_orders
    FROM segs
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY version)
    """,
    "SCD type-2 history build (the warehouse dimension-maintenance "
    "shape): per customer, collapse the order-status sequence into "
    "versioned validity segments — change-detect with lag, number runs "
    "with a running sum, aggregate each run to (valid_from, n_orders), "
    "close each segment with lead(valid_from) and flag the open one "
    "as current. EVERY stage clusters on o_custkey, and Spark's "
    "ClusteredDistribution subset rule lets the run-grouping and both "
    "window passes reuse the FIRST exchange (group/partition keys are "
    "supersets of the incoming hashpartitioning(o_custkey)) — the whole "
    "history build moves each row across the wire exactly once, which "
    "is what makes it viable as a daily rebuild over a 100 TB fact "
    "table. Dates ride as 'yyyy-MM-dd' strings (lexicographic == "
    "chronological) so both engines order and emit identically.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01/0.1 (verify)
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderstatus",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
    )
    w = W.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    runs = o.withColumn("prev", F.lag("o_orderstatus").over(w)).withColumn(
        "version",
        F.sum(
            F.when(
                F.col("prev").isNull()
                | (F.col("prev") != F.col("o_orderstatus")),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    segs = runs.groupBy(
        "o_custkey", F.col("o_orderstatus").alias("status"), "version"
    ).agg(
        F.min("od").alias("valid_from"),
        F.count("*").alias("n_orders"),
    )
    w2 = W.partitionBy("o_custkey").orderBy("version")
    return segs.select(
        "o_custkey",
        "status",
        "version",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.when(F.lead("valid_from").over(w2).isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_current"),
        "n_orders",
    )
