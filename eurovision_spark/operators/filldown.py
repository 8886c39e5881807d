"""Scalable fill-down (last-non-null carry-forward) over a global order.

The reference's record-boundary state — "the current trial id" carried
line to line (scan.py:341-351) — is a fill-down of the anchor value over
the global line order. The naive Spark formulation is
``last(value, ignorenulls) OVER (ORDER BY line_no)`` which sorts the
whole table in ONE partition (SURVEY §7 hard item 1). This module
implements the scalable form:

1. anchors (lines that carry a value) are a small fraction of lines —
   one per record. ``lead`` over anchors yields non-overlapping
   [start, end) intervals per value. Only the anchor table is sorted,
   and only to compute interval ends.
2. intervals are exploded onto fixed-width line-number buckets; lines
   join on their bucket + a range filter. This is an equi-join shuffle
   on the bucket id — no global sort of the data ever happens, and
   bucket width bounds the explode factor (records span few buckets).

At 100 TB: lines stay hash-partitioned by bucket; anchors are ~2% of
input and their window can itself be range-partitioned if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DEFAULT_BUCKET = 4096  # lines per bucket; records are <= a few hundred lines


def fill_down(
    lines: DataFrame,
    order_col: str,
    anchor_col: str,
    out_col: str,
    bucket: int = DEFAULT_BUCKET,
) -> DataFrame:
    """Add ``out_col`` = the last non-null ``anchor_col`` at or before each
    row (by ``order_col``). Rows before the first anchor get NULL.
    """
    # open-ended last interval is capped at the real max order value
    # (tiny agg, broadcast into the interval build)
    max_order = lines.agg(F.max(order_col).alias("_max_order"))

    anchors = lines.filter(F.col(anchor_col).isNotNull()).select(
        F.col(order_col).alias("_start"), F.col(anchor_col).alias(out_col)
    )
    w = W.orderBy("_start")
    intervals = (
        anchors.withColumn("_next", F.lead("_start").over(w))
        .crossJoin(F.broadcast(max_order))
        .select(
            "_start",
            out_col,
            F.coalesce(F.col("_next"), F.col("_max_order") + 1).alias("_end"),
        )
    )
    spans = intervals.select(
        "_start",
        "_end",
        out_col,
        # integer div, not double division + cast: doubles lose integer
        # precision past 2^53, which a 100 TB line count can reach
        F.explode(
            F.sequence(
                F.expr(f"_start div {bucket}"),
                F.expr(f"(_end - 1) div {bucket}"),
            )
        ).alias("_sbucket"),
    )
    keyed = lines.withColumn("_bucket", F.expr(f"{order_col} div {bucket}"))
    joined = keyed.join(
        spans,
        (F.col("_bucket") == F.col("_sbucket"))
        & (F.col(order_col) >= F.col("_start"))
        & (F.col(order_col) < F.col("_end")),
        "left",
    )
    return joined.drop("_bucket", "_sbucket", "_start", "_end")
