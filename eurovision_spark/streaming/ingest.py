"""Structured Streaming parity (SURVEY §2.9, M5).

The reference is batch-only but structurally incremental: pages are
appended over hours (scrape.py:63-67) and per-trial state flushes at
record boundaries (scan.py:341-351). Two streaming surfaces:

1. ``stream_registry_ingest`` — file-source stream over the scrape
   landing directory (one text file per page = one micro-batch input);
   each micro-batch runs the SAME parse pipeline as batch
   (parse_registry_lines) inside ``foreachBatch``, then upserts into
   parquet with first-wins dedup — the exactly-once rebuild of the
   reference's "database wraps" duplicate-PK tolerance
   (scan.py:129-132). Records spanning a micro-batch boundary resolve
   on the next batch's merge (same first-non-empty rule, since the
   sink merge is keyed on eudract_id).

2. ``stream_events_rollup`` — watermarked tumbling-window aggregation
   over the events table shape: the standard late-data-tolerant rollup
   the reference lacks entirely (SURVEY §2.9 "no watermarks exist").

Both run to completion on local parquet/text dirs via
``processAllAvailable`` in tests (no external broker needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from eurovision_spark.operators.parse import number_lines, parse_registry_lines
from eurovision_spark.timeaxis import (
    SESSION_GAP_US,
    event_ts_col,
    stream_events_source,
    ts_us_col,
)


def stream_registry_ingest(
    spark: SparkSession, landing_dir: str, out_dir: str
) -> StreamingQuery:
    """Incremental registry ingest: landing dir of page files -> 4-table
    parquet, merging per micro-batch with first-wins semantics."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from eurovision_spark.sinks import upsert_parquet

        caches: list = []
        lines = number_lines(batch_df, caches=caches)
        tables = parse_registry_lines(lines, caches=caches)
        try:
            for name, df in tables.items():
                path = f"{out_dir}/{name}"
                if name == "trial":
                    # first batch wins per trial id (scan.py:129-132: later
                    # duplicate inserts are dropped) — the keyed MERGE edge
                    upsert_parquet(df, path, ["eudract_id"], keep="existing")
                else:
                    # child tables are sets of whole rows: the "key" is the
                    # full row, so the same first-wins upsert is a set union
                    upsert_parquet(df.dropDuplicates(), path, df.columns, keep="existing")
        finally:
            # release the batch's persisted intermediates: a long-running
            # stream otherwise pins three cached datasets PER micro-batch
            for c in caches:
                c.unpersist()

    stream = spark.readStream.format("text").load(landing_dir)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def stream_events_rollup(
    spark: SparkSession, events_dir: str, query_name: str = "events_rollup"
) -> StreamingQuery:
    """Watermarked 1-hour tumbling rollup of the events stream
    (counts + value sums per event_type), 10-minute late-data bound."""
    stream = stream_events_source(spark, events_dir)
    # dtype-adaptive: ns-bigint or timestamp(_ntz) ts both land on the
    # same µs-resolution TIMESTAMP axis (timeaxis.event_ts_col)
    ts = event_ts_col(stream.schema["ts"].dataType, spark)
    agg = (
        stream.withColumn("event_ts", ts)
        .withWatermark("event_ts", "10 minutes")
        .groupBy(F.window("event_ts", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    query_name: str = "stream_sessions",
    gap_us: int = SESSION_GAP_US,
) -> StreamingQuery:
    """Custom stateful streaming operator: per-user gap sessionization
    via ``applyInPandasWithState`` (SURVEY §2.9 / M5: the reference's
    per-trial mutable state generalized to keyed streaming state).

    State per user = (last event ts, sessions so far); each micro-batch
    folds its events into that state and emits the updated per-user
    totals. The batch twin is ``operators/temporal.sessionize`` — the
    test asserts both agree on the same data, which is the streaming/
    batch-parity property the engine guarantees.

    Scale: state is two longs per user key, hash-partitioned by user_id
    across executors; micro-batch cost is one shuffle of the new events
    on user_id — identical shape to the batch window's exchange.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    raw = stream_events_source(spark, events_dir)
    # normalize to canonical µs BEFORE the stateful operator so state
    # (a bigint) is dtype-independent
    stream = raw.withColumn(
        "ts_us", ts_us_col(raw.schema["ts"].dataType, spark)
    ).select("user_id", "ts_us")

    def update(key, pdfs, state: GroupState):  # noqa: ANN001
        (user_id,) = key
        last_ts, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        # materialize ALL chunks before sorting: applyInPandasWithState
        # delivers a group's micro-batch rows as multiple pandas chunks
        # in arbitrary order (boundary = arrow.maxRecordsPerBatch), and
        # a per-chunk sort over-counts sessions whenever one user's
        # events straddle a chunk boundary out of time order
        all_ts = [int(t) for pdf in pdfs for t in pdf["ts_us"]]
        for ts in sorted(all_ts):
            if last_ts is None or ts - last_ts > gap_us:
                n_sessions += 1
            last_ts = ts
        n_events += len(all_ts)
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            [(user_id, n_events, n_sessions)],
            columns=["user_id", "n_events", "n_sessions"],
        )

    sessions = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, n_sessions bigint",
        stateStructType="last_ts bigint, n_sessions bigint, n_events bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_funnel(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    query_name: str = "stream_funnel",
) -> StreamingQuery:
    """Stateful streaming funnel: per-user view→click→purchase stage
    tracking via ``applyInPandasWithState`` — the streaming twin of
    ``operators/analytics.funnel_steps``.

    State per user = the three stage timestamps (bigint µs, unset =
    None). Each micro-batch folds its events in ts order: the first
    view sets stage 1; the first click strictly after stage 1 sets
    stage 2; the first purchase strictly after stage 2 sets stage 3.
    Under in-order arrival this greedy fold equals the batch query's
    staged minima exactly (the parity test feeds time-split
    micro-batches); stage timestamps only ever move from None to a
    value, so emitted depths are monotone across batches.

    Scale: state is three longs per user, hash-partitioned on user_id —
    the same exchange shape as the batch funnel's single window
    partitioning; the input projection keeps only the three funnel
    event types, so the stateful shuffle carries a fraction of the
    stream.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    raw = stream_events_source(spark, events_dir)
    stream = (
        raw.withColumn("ts_us", ts_us_col(raw.schema["ts"].dataType, spark))
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts_us", "event_type")
    )

    def update(key, pdfs, state: GroupState):  # noqa: ANN001
        (user_id,) = key
        t_view, t_click, t_purchase = state.get if state.exists else (None, None, None)
        evs = []
        for pdf in pdfs:
            evs.extend(zip((int(t) for t in pdf["ts_us"]), pdf["event_type"]))
        for ts, kind in sorted(evs):
            if kind == "view" and t_view is None:
                t_view = ts
            elif kind == "click" and t_click is None and t_view is not None and ts > t_view:
                t_click = ts
            elif (
                kind == "purchase"
                and t_purchase is None
                and t_click is not None
                and ts > t_click
            ):
                t_purchase = ts
        state.update((t_view, t_click, t_purchase))
        depth = 0 if t_view is None else 1 if t_click is None else 2 if t_purchase is None else 3
        yield pd.DataFrame(
            [(user_id, t_view, t_click, t_purchase, depth)],
            columns=["user_id", "t_view_us", "t_click_us", "t_purchase_us", "funnel_depth"],
        )

    funnel = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, t_view_us bigint, t_click_us bigint, "
            "t_purchase_us bigint, funnel_depth int"
        ),
        stateStructType="t_view bigint, t_click bigint, t_purchase bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        funnel.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_dedup_events(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    query_name: str = "deduped_events",
) -> StreamingQuery:
    """Exactly-once event intake: watermarked dropDuplicates on the
    event key — the streaming rebuild of the reference's swallowed
    duplicate-PK inserts ("database wraps on last page",
    scan.py:129-132 / SURVEY §2.9). The watermark bounds the dedup
    state: keys older than 1 hour of event time are expired instead of
    accumulating forever — the piece that makes dedup state O(window)
    instead of O(stream) at scale."""
    stream = stream_events_source(spark, events_dir)
    deduped = (
        stream.withColumn(
            "event_ts", event_ts_col(stream.schema["ts"].dataType, spark)
        )
        .withWatermark("event_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "value")
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_click_error_join(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    query_name: str = "click_errors",
) -> StreamingQuery:
    """Watermarked stream-stream interval join: each click matched to
    the same user's errors within the preceding 30 minutes.

    The time-bound predicate plus watermarks on BOTH sides is what
    bounds join state: rows older than watermark + interval are evicted
    instead of buffering the full history — the property that keeps a
    stream-stream join runnable forever at scale. State is
    hash-partitioned on user_id, the same exchange shape as the batch
    twin (an as-of/interval join, operators/temporal.py)."""
    base = stream_events_source(spark, events_dir)
    ts_ev = event_ts_col(base.schema["ts"].dataType, spark)
    clicks = (
        base.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            ts_ev.alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    errors = (
        stream_events_source(spark, events_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("err_user"),
            ts_ev.alias("err_ts"),
        )
        .withWatermark("err_ts", "1 hour")
    )
    joined = clicks.join(
        errors,
        (F.col("user_id") == F.col("err_user"))
        & (F.col("err_ts") <= F.col("click_ts"))
        & (F.col("err_ts") >= F.col("click_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("click_id", "user_id", "err_id")
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_session_rollup(
    spark: SparkSession,
    events_dir: str,
    query_name: str = "session_rollup",
    gap: str = "60 minutes",
) -> StreamingQuery:
    """Native session windows (the built-in alternative to the custom
    applyInPandasWithState sessionizer): watermarked
    ``session_window(event_ts, gap)`` merges events into dynamic
    per-user sessions engine-side — state bounded by the watermark,
    sessions close when the gap passes. Complete-vs-update semantics
    and late-event merging come for free; the custom stateful operator
    remains for logic session_window can't express (e.g. counters that
    never expire)."""
    stream = stream_events_source(spark, events_dir)
    ts = event_ts_col(stream.schema["ts"].dataType, spark)
    agg = (
        stream.withColumn("event_ts", ts)
        .withWatermark("event_ts", "1 hour")
        .groupBy(F.session_window("event_ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "value_sum",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def stream_chunk_documents(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming twin of the sample-production chunker: a parquet file
    stream of (doc_id, text, n_chars) documents through the SAME
    per-row chunking expressions as the batch path
    (operators/pipeline.chunk_documents). Stateless — no watermark, no
    state store: each arriving file's docs chunk independently, which
    is exactly why the batch plan composes with ``readStream``
    unchanged. Returns the unstarted streaming DataFrame; callers pick
    the sink (tests use a memory sink + processAllAvailable)."""
    from eurovision_spark.operators.pipeline import chunk_documents

    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return chunk_documents(stream.filter(F.col("n_chars") > 0))


def stream_redact_documents(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming twin of the PII scrub: documents arriving as a parquet
    file stream go through the SAME plant+redact expressions as the
    batch path (operators/pipeline.redact_documents). Stateless like
    the chunker — per-row regex only, so compliance scrubbing composes
    with ``readStream`` at ingest time instead of as a later batch
    sweep over landed (still-unscrubbed) data."""
    from eurovision_spark.operators.pipeline import redact_documents

    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return redact_documents(stream.filter(F.col("n_chars") > 0))


def stream_prep_pipeline(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming twin of the composed prep pass: every stage of
    prep_pipeline (scrub -> chunk -> split -> digest) is a stateless
    per-row map, so the WHOLE pipeline composes with ``readStream``
    unchanged — arriving documents leave as split-labeled training
    chunks in the same micro-batch, no state store, no watermark.
    The body IS the batch core (operators/pipeline.prep_documents) —
    one definition, so the stream/batch parity test certifies a shared
    plan rather than two copies that could drift."""
    from eurovision_spark.operators.pipeline import prep_documents

    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return prep_documents(stream.filter(F.col("n_chars") > 0))
