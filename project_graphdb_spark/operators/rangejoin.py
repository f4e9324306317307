"""Binned interval (range) join — the non-equi join scale technique.

A plain ``point BETWEEN lo AND hi`` join with no equality key compiles
to a nested-loop join (O(points × intervals) — unusable at scale).
Binning restores an equi join: bucket points by a fixed time bin,
explode each interval into the bins it covers, hash-join on the bin,
then apply the exact range predicate. Work becomes
O(points + intervals × bins-per-interval + true-matches).

Verified against DuckDB doing the naive BETWEEN join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.workload import register

BIN_SECONDS = 3600


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_seconds: int = BIN_SECONDS,
) -> DataFrame:
    """Inner join of points to half-open intervals [lo, hi) via time
    binning. Pick ``bin_seconds`` near the median interval width so
    each interval explodes into a handful of bins."""
    us = F.lit(bin_seconds * 1_000_000)
    p = points.withColumn(
        "__bin", F.floor(F.unix_micros(F.col(point_col)) / us)
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(lo_col)) / us),
                F.floor((F.unix_micros(F.col(hi_col)) - 1) / us),
            )
        ),
    )
    return (
        p.join(iv, "__bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("__bin")
    )


def _campaign_windows(spark: SparkSession, events: DataFrame) -> DataFrame:
    """50 deterministic 7-hour windows every 14 hours from min(ts)."""
    min_ts = events.agg(F.min("ts").alias("min_ts"))
    start_us = F.unix_micros(F.col("min_ts")) + F.col("window_id") * F.lit(
        14 * 3600 * 1_000_000
    )
    return (
        spark.range(50)
        .withColumnRenamed("id", "window_id")
        .join(F.broadcast(min_ts))
        .select(
            "window_id",
            F.timestamp_micros(start_us).alias("lo"),
            F.timestamp_micros(
                start_us + F.lit(7 * 3600 * 1_000_000)
            ).alias("hi"),
        )
    )


@register(
    "ev_interval_join_campaigns",
    oracle="""
    WITH wins AS (
      SELECT k AS window_id,
             min_ts + k * (INTERVAL 14 HOUR) AS lo,
             min_ts + k * (INTERVAL 14 HOUR) + INTERVAL 7 HOUR AS hi
      FROM range(50) t(k), (SELECT min(ts) AS min_ts FROM events)
    )
    SELECT w.window_id, COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN wins w ON e.ts >= w.lo AND e.ts < w.hi
    GROUP BY 1 ORDER BY 1
    """,
    description="binned interval join (non-equi range join made an equi "
    "hash join): events x derived campaign windows, vs DuckDB's naive "
    "BETWEEN join",
    headline=True,
)
def ev_interval_join_campaigns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    wins = _campaign_windows(spark, events)
    joined = interval_join_binned(events, wins, "ts", "lo", "hi")
    return (
        joined.groupBy("window_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_id")
    )


@register(
    "ev_click_attribution",
    oracle="""
    WITH c AS (
      SELECT user_id, ts AS click_ts, event_id AS click_id
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts,
           purchase_value
    FROM c JOIN p ON c.user_id = p.user_id
      AND p.purchase_ts >= c.click_ts
      AND p.purchase_ts <= c.click_ts + INTERVAL 60 MINUTES
    ORDER BY click_id, purchase_id
    """,
    description="click->purchase attribution interval join (60-minute "
    "horizon) — the batch face of streaming/ops.py's stream-stream "
    "join (same function body; batch/stream equality asserted in "
    "tests/test_streaming.py, where both sides are watermarked streams "
    "and the event-time range condition bounds the join state)",
)
def ev_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_graphdb_spark.streaming.ops import (
        click_purchase_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    return click_purchase_attribution(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    ).orderBy("click_id", "purchase_id")


@register(
    "ev_click_attribution_outer",
    oracle="""
    WITH c AS (
      SELECT user_id, ts AS click_ts, event_id AS click_id
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts,
           purchase_value
    FROM c LEFT JOIN p ON c.user_id = p.user_id
      AND p.purchase_ts >= c.click_ts
      AND p.purchase_ts <= c.click_ts + INTERVAL 60 MINUTES
    ORDER BY click_id, purchase_id
    """,
    description="left-outer click->purchase attribution: unattributed "
    "clicks surface with null purchase columns — the accounting query "
    "real pipelines run on top of the inner face. Streaming twin: in "
    "streaming/ops.py the outer row is flushed exactly when the "
    "watermark EVICTS the click's join state (asserted across "
    "micro-batches in tests/test_streaming.py)",
)
def ev_click_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_graphdb_spark.streaming.ops import (
        click_purchase_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    return click_purchase_attribution(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    ).orderBy("click_id", "purchase_id")
