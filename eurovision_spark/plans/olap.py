"""OLAP reshaping + analytic-window queries (beyond-reference family).

The reference's export already denormalizes 1:N children into wide rows
(toexcel.py:124-162); pivot/unpivot complete that reshaping family as
first-class relational operators, and the moving-average / correlated
comparison shapes complete SURVEY §2.5's window inventory with frames
the parser rebuild didn't need.

Scale notes (100 TB design):
- pivot with an EXPLICIT value list is one partial+final aggregate pass
  (no extra distinct-scan to discover columns — never call pivot()
  without the list at scale);
- unpivot is a zero-shuffle per-row flatMap (expand in the project,
  rows never move);
- both window queries share one exchange on their partition key; frames
  are bounded (ROWS k PRECEDING) so state per key is O(k), not O(n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from eurovision_spark.catalog import register
from eurovision_spark.operators.textstats import md5_long, md5_long_sql
from eurovision_spark.sources import load_table


@register(
    "pivot_priority_status",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
    "pivot (long->wide): order counts per priority split by status "
    "column. The value list is explicit, so Spark plans ONE aggregate "
    "pass (pivot without the list adds a distinct-scan job to discover "
    "columns — never at 100 TB). Oracle = conditional aggregation, which "
    "is exactly Spark's physical rewrite (PivotFirst).",
)
def pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
    )
    # pivot leaves absent cells null; the conditional-agg oracle yields 0
    n = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("bigint")  # noqa: E731
    # overall avg recombined from the per-status partial sums/counts
    # (sum/count algebra survives the pivot; avg would not)
    total = sum(F.coalesce(F.col(f"{s}_s"), F.lit(0.0)) for s in "OFP")
    cnt = sum(F.coalesce(F.col(f"{s}_n"), F.lit(0)) for s in "OFP")
    return wide.select(
        "o_orderpriority",
        n("O_n").alias("n_open"),
        n("F_n").alias("n_finished"),
        n("P_n").alias("n_pending"),
        F.round(total / cnt, 4).alias("avg_price"),
    )


@register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    """,
    "unpivot/melt (wide->long): per-part metrics to (key, metric, value) "
    "triples — the inverse reshaping of the export's denormalization. "
    "Zero shuffle: Expand runs inside the scan's project, rows never "
    "move; output is 2x rows of 3 columns, not 1x rows of wide columns.",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    ).unpivot(["p_partkey"], ["retailprice", "size"], "metric", "value")


@register(
    "moving_avg_price",
    """
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
    FROM orders WHERE o_custkey % 50 = 0
    """,
    "bounded-frame moving average (3-order trailing window) per "
    "customer — the sliding-frame shape missing from the parser's "
    "window inventory (SURVEY §2.5 has only unbounded-preceding "
    "frames). Bounded ROWS frame => O(k) state per key in the window "
    "operator regardless of group size; one exchange on o_custkey.",
    driver=False,  # driver gate: certified via window_suite (same columns)
)
def moving_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("ma3"),
    )


@register(
    "above_customer_avg",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    """,
    "correlated-subquery comparison ('orders 50% above their "
    "customer's average') decorrelated by hand into a window "
    "aggregate: ONE pass over orders with one exchange on o_custkey, "
    "instead of the naive plan's self-join (scan twice, shuffle "
    "twice). The oracle keeps the correlated form — DuckDB's "
    "decorrelation produces the same relation.",
    driver=False,  # driver gate: certified via window_suite (above_cust_avg col)
)
def above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    return (
        o.withColumn("_cavg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("_cavg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "below_avg_qty_revenue",
    """
    WITH pa AS (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS thresh
        FROM lineitem GROUP BY l_partkey)
    SELECT CAST(count(*) AS BIGINT) AS n_small,
           round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < pa.thresh
    """,
    "TPC-H Q17 shape (small-quantity-order revenue): revenue of "
    "lineitems below half their part's average quantity. The "
    "correlated scalar subquery is decorrelated into an aggregate + "
    "self-join on l_partkey: the groupBy's exchange and the join's "
    "exchange share the same key, so AQE co-partitions them — lineitem "
    "shuffles on l_partkey once for the agg and once for the probe, "
    "never a per-row subquery and never a broadcast assumption (the "
    "per-part aggregate has part-table cardinality, NOT broadcastable "
    "at 100 TB). avg(l_quantity) is exact (integral quantities sum "
    "exactly in doubles), so the threshold comparison is deterministic "
    "across engines.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def below_avg_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg((0.5 * F.avg("l_quantity")).alias("thresh"))
    return (
        li.join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("thresh"))
        .agg(
            F.count("*").cast("bigint").alias("n_small"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


@register(
    "window_suite",
    """
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER wma, 4) AS ma3,
           CAST(rank() OVER w AS BIGINT) AS order_rank,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate)
                AS BIGINT) AS days_since_prev,
           strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS next_order_date,
           round(sum(o_totalprice) OVER wr, 4) AS rev_30d,
           CAST(CASE WHEN o_totalprice > 1.5 * avg(o_totalprice) OVER wc
                     THEN 1 ELSE 0 END AS INT) AS above_cust_avg,
           CAST(ntile(4) OVER wq AS INT) AS price_quartile
    FROM orders WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wma AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
           wr AS (PARTITION BY o_custkey
                  ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW),
           wq AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
           wc AS (PARTITION BY o_custkey)
    """,
    "the full analytic-window inventory in one pass — bounded ROWS-"
    "frame moving average, rank, lag-difference, lead, a value-based "
    "RANGE frame (trailing-30-day revenue: frame membership by ORDER "
    "value, not row count — ties share frames), ntile bucketing, and "
    "the decorrelated above-partition-average flag (the driver-facing "
    "certification twin of moving_avg_price / order_gaps / "
    "ntile_quartiles / above_customer_avg, same expressions). All "
    "customer-keyed windows share ONE exchange on o_custkey; only the "
    "ntile adds a second exchange on its different partition key.",
)
def window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wma = w.rowsBetween(-2, 0)
    # RANGE frame needs a numeric order key: days since epoch
    days = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1970-01-01")))
    wr = W.partitionBy("o_custkey").orderBy(days).rangeBetween(-30, 0)
    wq = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = W.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(wma), 4).alias("ma3"),
        F.rank().over(w).cast("bigint").alias("order_rank"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("days_since_prev"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias("next_order_date"),
        F.round(F.sum("o_totalprice").over(wr), 4).alias("rev_30d"),
        # the two o_custkey windows (w/wma and wc) are kept ADJACENT in
        # the projection so Catalyst plans them back-to-back over ONE
        # o_custkey exchange; interleaving the ntile window between them
        # re-shuffles o_custkey a second time (measured in the plan)
        F.when(F.col("o_totalprice") > 1.5 * F.avg("o_totalprice").over(wc), 1)
        .otherwise(0)
        .cast("int")
        .alias("above_cust_avg"),
        F.ntile(4).over(wq).cast("int").alias("price_quartile"),
    )


# Fixed-width histogram bounds for l_extendedprice (TPC-H's generator
# keeps prices in [900, 105000]); out-of-range values clamp into the
# edge bins, so a drifted producer widens a bin instead of dropping
# rows. Bin arithmetic is plain double ops (sub/div/floor), which both
# engines evaluate IEEE-identically — no width_bucket dialect needed.
HIST_LO = 0.0
HIST_W = 10_000.0
HIST_NBINS = 11


@register(
    "price_histogram",
    f"""
    SELECT CAST(least(greatest(floor((l_extendedprice - {HIST_LO}) / {HIST_W}), 0),
                      {HIST_NBINS - 1}) AS BIGINT) AS bin,
           round({HIST_LO} + least(greatest(floor((l_extendedprice - {HIST_LO}) / {HIST_W}), 0),
                      {HIST_NBINS - 1}) * {HIST_W}, 2) AS bin_lo,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 2) AS price_sum
    FROM lineitem
    GROUP BY 1, 2
    """,
    f"fixed-width histogram of line-item prices ({HIST_NBINS} bins of "
    f"width {HIST_W:.0f}, edges clamped): the profiling primitive behind "
    "every distribution dashboard and skew diagnosis. Per-row bin "
    "arithmetic + one partial/final aggregate over ≤nbins groups — the "
    "shuffle moves nbins rows per map task regardless of input size, so "
    "the plan is identical at 100 TB. Data-derived bounds would add a "
    "min/max pre-pass; fixed bounds keep it one scan (and the approx "
    "twin of that pre-pass already exists: percentile_prices_approx).",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bin_ = (
        F.least(
            F.greatest(F.floor((F.col("l_extendedprice") - HIST_LO) / HIST_W), F.lit(0)),
            F.lit(HIST_NBINS - 1),
        )
    ).cast("bigint")
    return (
        li.select(bin_.alias("bin"), "l_extendedprice")
        .groupBy("bin", F.round(HIST_LO + F.col("bin") * HIST_W, 2).alias("bin_lo"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
        )
    )


@register(
    "rank_suite",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           round(percent_rank() OVER w, 6) AS prnk,
           round(cume_dist() OVER w, 6) AS cdist,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WHERE o_totalprice > 250000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "the ranking-window family on ONE exchange: rank / dense_rank / "
    "percent_rank / cume_dist / ntile over the same "
    "(priority, price-desc) window — five ranking semantics, one "
    "hashpartitioning on o_orderpriority, one partition-local sort. "
    "The unique o_orderkey tie-break keeps every rank deterministic "
    "cross-engine; percent_rank/cume_dist are exact rational divisions "
    "of row counts, rounded per the float convention.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "quantiles_by_priority",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS med_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    "EXACT grouped quantiles (median + p90 order value per priority) — "
    "the per-group counterpart of percentile_prices, and the exact twin "
    "the approx sketch (percentile_prices_approx) is error-bounded "
    "against. Both engines use the same linear-interpolation "
    "percentile_cont semantics, so the doubles agree to rounding. "
    "Honest scale note stated by the plan itself: exact percentile "
    "materializes each group's values (ObjectHashAggregate), so memory "
    "is O(group size) — per-priority groups are bounded here; for "
    "unbounded groups the t-digest sketch IS the scale path.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("med_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.count("*").alias("n_orders"),
    )


# per-group bound-estimation sample size: bounded buffer, and kept <=
# spark.sql.optimizer.windowGroupLimitThreshold (default 1000) so the
# rn<=k predicate plans as WindowGroupLimit instead of a full window
WIN_SAMPLE = 1000
_WIN_KEY_SQL = md5_long_sql("concat('win-', CAST(o_orderkey AS VARCHAR))")


def win_sample(o: DataFrame) -> DataFrame:
    """The shared bounded deterministic estimation sample of the
    robust-stats tier (winsorized_stats, mad_outliers): md5-ordered
    row_number <= WIN_SAMPLE per o_orderpriority group. The rn <= k
    predicate plans as Partial+Final WindowGroupLimit (per-group
    bounded heap on the map side, pinned in tests/test_plans.py), so
    no executor ever buffers a whole group."""
    key = md5_long(F.concat(F.lit("win-"), F.col("o_orderkey").cast("string")))
    sw = W.partitionBy("o_orderpriority").orderBy(key.asc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(sw))
        .filter(F.col("rn") <= WIN_SAMPLE)
        .select("o_orderpriority", "o_totalprice")
    )


@register(
    "winsorized_stats",
    f"""
    WITH s AS (
        SELECT o_orderpriority, o_totalprice FROM (
            SELECT o_orderpriority, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY {_WIN_KEY_SQL}, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= {WIN_SAMPLE}),
    g AS (
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.05) AS p05,
               quantile_cont(o_totalprice, 0.95) AS p95
        FROM s GROUP BY o_orderpriority)
    SELECT o.o_orderpriority,
           round(g.p05, 4) AS p05,
           round(g.p95, 4) AS p95,
           round(avg(o.o_totalprice), 4) AS avg_raw,
           round(avg(least(greatest(o.o_totalprice, g.p05), g.p95)), 4)
               AS avg_winsor,
           CAST(sum(CASE WHEN o.o_totalprice < g.p05
                           OR o.o_totalprice > g.p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o JOIN g USING (o_orderpriority)
    GROUP BY o.o_orderpriority, g.p05, g.p95
    """,
    "winsorized robust statistics (the outlier-clamp every metrics "
    "pipeline runs before averaging heavy-tailed values): per group, "
    "clamp values into a [p05, p95] band and report raw vs winsorized "
    "means plus the clip count. SEMANTICS NOTE (r06 advice): p05/p95 "
    "are SAMPLE-ESTIMATED order statistics, not exact group "
    "percentiles — exact for groups up to the sample bound, estimates "
    "beyond it (deterministic and cross-engine identical either way; "
    "consumers needing exact order statistics at any group size use "
    "quantiles_by_priority and accept its O(group) buffer warning). "
    "The clamp bounds are order statistics "
    f"estimated from a BOUNDED deterministic sample (≤{WIN_SAMPLE} "
    "rows/group by md5-ordered row_number — Spark plans the rn<=k "
    "predicate as WindowGroupLimit, a bounded per-group heap kept "
    "map-side BEFORE the exchange, pinned in tests/test_plans.py), so "
    "the exact-percentile buffer is O(sample), never O(group): the "
    "unbounded-group formulation quantiles_by_priority warns about is "
    "structurally impossible here. Both engines draw the IDENTICAL "
    "sample (same md5 key, same tie-break) and share linear-"
    "interpolation percentile semantics, so the bounds — and therefore "
    "every downstream clamp, mean, and clip count — remain fully "
    "hash-gated exact values. The fact rows then shuffle once for the "
    "final aggregate with the 5-row bound table broadcast back; at "
    "100 TB the alternative bounds pass is the t-digest sketch "
    "(percentile_prices_approx), traded off here to keep the full "
    "cross-engine hash gate.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01/0.1 (verify)
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    samp = win_sample(o)
    bounds = samp.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    o = o.select("o_orderpriority", "o_totalprice")
    clamped = o.join(F.broadcast(bounds), "o_orderpriority").withColumn(
        "w_price",
        F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95")),
    )
    return clamped.groupBy("o_orderpriority", "p05", "p95").agg(
        F.round(F.avg("o_totalprice"), 4).alias("avg_raw"),
        F.round(F.avg("w_price"), 4).alias("avg_winsor"),
        F.sum(
            F.when(
                (F.col("o_totalprice") < F.col("p05"))
                | (F.col("o_totalprice") > F.col("p95")),
                1,
            ).otherwise(0)
        ).alias("n_clipped"),
        F.count("*").alias("n_orders"),
    ).select(
        "o_orderpriority",
        F.round("p05", 4).alias("p05"),
        F.round("p95", 4).alias("p95"),
        "avg_raw",
        "avg_winsor",
        "n_clipped",
        "n_orders",
    )


MAD_K = 3.0  # flag threshold in robust sigmas
MAD_SCALE = 1.4826  # MAD -> sigma consistency constant (normal data)


@register(
    "mad_outliers",
    f"""
    WITH s AS (
        SELECT o_orderpriority, o_totalprice FROM (
            SELECT o_orderpriority, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY {_WIN_KEY_SQL}, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= {WIN_SAMPLE}),
    med AS (
        SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
        FROM s GROUP BY o_orderpriority),
    mad AS (
        SELECT s.o_orderpriority,
               quantile_cont(abs(s.o_totalprice - med.med), 0.5) AS mad
        FROM s JOIN med USING (o_orderpriority)
        GROUP BY s.o_orderpriority),
    st AS (SELECT med.o_orderpriority, med.med, mad.mad
           FROM med JOIN mad USING (o_orderpriority))
    SELECT o.o_orderpriority,
           round(st.med, 4) AS med,
           round(st.mad, 4) AS mad,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN abs(o.o_totalprice - st.med)
                              > {MAD_K} * {MAD_SCALE} * st.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM orders o JOIN st USING (o_orderpriority)
    GROUP BY o.o_orderpriority, st.med, st.mad
    """,
    "median/MAD robust outlier detection (the data-quality gate run "
    "on metric columns before training-data aggregation — unlike "
    "mean/stddev z-scores, the estimators themselves cannot be pulled "
    "by the outliers they hunt): per group, median and median-absolute-"
    f"deviation estimated from the SAME bounded md5-ordered <={WIN_SAMPLE}"
    "-row/group sample as winsorized_stats (WindowGroupLimit — bounded "
    f"per-group heap map-side), rows beyond {MAD_K} robust sigmas "
    f"(|x - med| > {MAD_K} x {MAD_SCALE} x MAD) counted per group. "
    "SEMANTICS NOTE: med/MAD are sample estimates beyond the bound, "
    "exact below it (deterministic and cross-engine identical either "
    "way). The two sample passes run on the materialized bounded "
    "sample; the 5-row stats table broadcasts back for one corpus "
    "scan with a partial+final count aggregate.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    # the bounded sample is read twice (median, then deviations):
    # materialize it once instead of re-running the window pass
    samp = win_sample(o).localCheckpoint(eager=False)  # lazy (r10)
    med = samp.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    stats = (
        samp.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority", "med")
        .agg(
            F.expr("percentile(abs(o_totalprice - med), 0.5)").alias("mad")
        )
    )
    dev = F.abs(F.col("o_totalprice") - F.col("med"))
    return (
        o.join(F.broadcast(stats), "o_orderpriority")
        .groupBy("o_orderpriority", "med", "mad")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(
                F.when(dev > MAD_K * MAD_SCALE * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "o_orderpriority",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_orders",
            "n_outliers",
        )
    )
