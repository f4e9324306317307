"""Streaming operators over the ``events`` table.

The reference has no data-stream abstraction (its "streaming" is
chunked HTTP of agent events, reference: final/app.py:157-164); this is
the §2.E gap surface built on Structured Streaming. Every transformation
here is written against a plain DataFrame — the *same* function works on
``spark.read`` (batch, used by the oracle gate) and ``spark.readStream``
(incremental); that unification is the point of Structured Streaming.

Streaming-only concerns (watermarks, output modes, memory-sink tests)
live in tests/test_streaming.py; ``with_watermark=True`` adds the event-
time watermark needed for append-mode aggregation state cleanup.

Scale: windowed aggregations shuffle on (window, key) — state store
size is bounded by the watermark horizon; ``session_window`` merges
per-key sessions with the same bound. The lag/cumsum sessionization is
the batch-backfill twin of the streaming session_window path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from project_graphdb_spark.operators.exact import dec

SESSION_GAP_SECONDS = 1800


def _maybe_watermark(df: DataFrame, with_watermark: bool) -> DataFrame:
    return df.withWatermark("ts", "1 hour") if with_watermark else df


def tumbling_window_stats(
    events: DataFrame, with_watermark: bool = False
) -> DataFrame:
    """Hourly tumbling window x event_type: count + exact value sum."""
    out = (
        _maybe_watermark(events, with_watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def sliding_window_counts(
    events: DataFrame, with_watermark: bool = False
) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2)."""
    out = (
        _maybe_watermark(events, with_watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
    )
    return out.select(
        F.col("w.start").alias("window_start"), "n_events"
    )


def sessionize(events: DataFrame) -> DataFrame:
    """Batch sessionization: per-user sessions split on >30 min gaps
    (lag + cumulative sum — the classic windowed formulation).

    The streaming twin is ``session_window(ts, '30 minutes')``; this
    batch form exists so sessions are oracle-checkable and backfills
    use the same semantics.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = (
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1)
        .otherwise(0)
    )
    cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    return (
        events.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def streaming_session_counts(events: DataFrame) -> DataFrame:
    """Native streaming session windows (30-minute gap) per user."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (§2.E): running per-user event
    count + max event time via ``applyInPandasWithState``.

    This is the escape hatch for operators Spark's windowed aggregations
    can't express (arbitrary per-key state machines). State is one tiny
    row per user; the grouping shuffle partitions by user_id so state
    stores scale horizontally with keys.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, last_ts timestamp"
    state_schema = "n bigint, last bigint"

    def update(key, pdfs, state: GroupState):
        n, last = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                last = max(last, int(pd.to_datetime(pdf["ts"]).astype("int64").max()))
        state.update((n, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "last_ts": [pd.Timestamp(last, unit="ns")],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_STAGE_TYPES = ("view", "click", "purchase")


def funnel_stage_tracker(
    events: DataFrame, window_hours: int | None = None
) -> DataFrame:
    """Per-user ordered-funnel progression as a custom stateful
    streaming operator (``applyInPandasWithState``): state is the three
    stage entry times, advanced by the strict-after state machine the
    batch face (`event_analytics.funnel_conversion`) computes with
    joins — stage k enters on the first stage-k event strictly after
    the stage-(k-1) entry, and (with ``window_hours``) within the
    conversion window of it, mirroring the time-bounded batch face
    ``ev_funnel_conversion_windowed`` (r11).

    Each micro-batch's rows are processed in (event-time, event_id)
    order — the same total order the batch face's (ts, event_id)
    convention uses, so same-timestamp events are replayed
    deterministically even if stage semantics are ever loosened from
    strictly-after (ADVICE r10). Like the sessionization twin,
    cross-batch exactness assumes the stream arrives in roughly
    event-time order (the watermarked deployment regime; the
    equivalence test stages time-sliced files). State is three longs
    per user — horizontal in keys, constant per key.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, stage int"
    state_schema = "t1 bigint, t2 bigint, t3 bigint"  # ns since epoch; 0 = unset
    # the batch face's conversion window (prev < ts <= prev + w) as ns
    win_ns = (
        None if window_hours is None else int(window_hours) * 3_600 * 10**9
    )

    def _within(ts_ns: int, prev_ns: int) -> bool:
        return win_ns is None or ts_ns <= prev_ns + win_ns

    def update(key, pdfs, state: GroupState):
        t1, t2, t3 = state.get if state.exists else (0, 0, 0)
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            rows = pd.concat(frames)
            rows = rows.assign(
                __ts=pd.to_datetime(rows["ts"]).astype("int64")
            ).sort_values(["__ts", "event_id"])
            for ts_ns, etype in zip(rows["__ts"], rows["event_type"]):
                if t1 == 0:
                    if etype == FUNNEL_STAGE_TYPES[0]:
                        t1 = int(ts_ns)
                elif t2 == 0:
                    if (
                        etype == FUNNEL_STAGE_TYPES[1]
                        and ts_ns > t1
                        and _within(ts_ns, t1)
                    ):
                        t2 = int(ts_ns)
                elif t3 == 0:
                    if (
                        etype == FUNNEL_STAGE_TYPES[2]
                        and ts_ns > t2
                        and _within(ts_ns, t2)
                    ):
                        t3 = int(ts_ns)
        state.update((t1, t2, t3))
        stage = 3 if t3 else 2 if t2 else 1 if t1 else 0
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_upsert_nodes(
    stream: DataFrame,
    target_path: str,
    checkpoint: str,
    key: str,
    agg_cols: dict[str, str],
) -> "object":
    """Continuous graph maintenance: a stream micro-batch upserts into a
    parquet node-label directory via :func:`merge_upsert` inside
    ``foreachBatch`` — the streaming twin of the batch graph build.

    ``agg_cols`` maps output column -> aggregate ('count' | 'max' |
    'sum') computed per key within each micro-batch before the merge.
    Exactly-once per micro-batch comes from the checkpointed source
    offsets; the merge itself is idempotent on the key. Returns the
    started StreamingQuery (caller awaits/stops).
    """
    import os

    from pyspark.sql import functions as F

    from project_graphdb_spark.graph.builder import merge_upsert

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        aggs = []
        for out, kind in agg_cols.items():
            src = out.split("__")[0]
            if kind == "count":
                aggs.append(F.count("*").alias(out))
            elif kind == "max":
                aggs.append(F.max(src).alias(out))
            else:
                aggs.append(F.sum(src).alias(out))
        updates = batch.groupBy(key).agg(*aggs)
        if os.path.exists(target_path):
            existing = spark.read.parquet(target_path)
            merged = merge_upsert(existing, updates, key)
        else:
            merged = updates
        # write to a temp dir then swap: the read above streams from the
        # same location we overwrite
        tmp = target_path + f".__batch{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(
            target_path
        )
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def distinct_user_events(events: DataFrame) -> DataFrame:
    """(user_id, event_type) distinct — batch twin of
    ``dropDuplicatesWithinWatermark`` streaming dedup."""
    return events.select("user_id", "event_type").distinct()


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 60,
    with_watermark: bool = False,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the same
    user's click(s) in the preceding ``horizon_minutes``.

    The canonical Structured Streaming two-stream shape: both sides
    watermarked, equi-key on ``user_id`` plus an event-time RANGE
    condition — which is exactly what lets the engine bound join state
    (a click older than the horizon past the watermark can never match
    a future purchase and is evicted; without the time bound the state
    store grows forever, the #1 operational failure of streaming joins
    at scale). Batch/stream unification: the same function body runs
    as a plain interval join on batch frames, and the streaming test
    asserts the two results are identical.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if with_watermark:
        c = c.withWatermark("click_ts", "10 minutes")
        p = p.withWatermark("purchase_ts", "10 minutes")
    horizon = F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES")
    # how="left_outer" emits unattributed clicks with null purchase
    # columns — in streaming mode the engine holds each click until the
    # watermark proves no in-horizon purchase can still arrive, then
    # flushes the null-padded row as it EVICTS the state (the outer
    # result is itself the state-expiry signal; inner joins just drop
    # the state silently)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + horizon),
        how,
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def purchase_revenue_by_segment(
    purchases: DataFrame,
    customers: DataFrame,
    with_watermark: bool = False,
) -> DataFrame:
    """Stream-static enrichment + aggregation: join the purchase stream
    against a STATIC customer dimension (user_id -> market segment),
    then aggregate revenue per segment.

    The third canonical Structured Streaming join shape (after
    stream-stream and the windowed self-aggregations): the static side
    carries no watermark and holds no state — each micro-batch hash-
    joins against it, and at scale the dimension is broadcast (or
    bucket-co-located) exactly as in batch. The same body runs on
    batch frames for the oracle gate. Money sums go through
    DECIMAL(18,2) so the result hash-matches DuckDB regardless of
    accumulation order.
    """
    p = _maybe_watermark(purchases, with_watermark)
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    # no forced broadcast: customer grows linearly with SF (the repo's
    # no-forced-broadcast-of-SF-scaled-tables policy) — the planner
    # broadcasts the pruned 2-column dim while it fits and falls back
    # to a shuffle join past the threshold
    return (
        p.join(dim, "user_id")
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )
