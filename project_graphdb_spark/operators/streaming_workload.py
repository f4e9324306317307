"""Oracle-gated workload entries for the streaming operators (run on
the batch path — identical code serves ``readStream`` in
tests/test_streaming.py; Structured Streaming's batch/stream unification
makes the DuckDB comparison meaningful)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.streaming.ops import (
    distinct_user_events,
    sessionize,
    sliding_window_counts,
    tumbling_window_stats,
)
from project_graphdb_spark.workload import register


@register(
    "ev_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    description="tumbling 1h window x event_type aggregation "
    "(streaming op, batch-verified)",
    headline=True,
)
def ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return tumbling_window_stats(events).orderBy("window_start", "event_type")


@register(
    "ev_sliding_counts",
    oracle="""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - o * INTERVAL '30 minutes' AS window_start
      FROM events, (SELECT unnest([0, 1]) AS o)
    )
    SELECT window_start, COUNT(*) AS n_events
    FROM expanded GROUP BY 1 ORDER BY 1
    """,
    description="sliding windows (1h every 30min) — each event in 2 "
    "windows",
)
def ev_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sliding_window_counts(events).orderBy("window_start")


@register(
    "ev_sessionization",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             -- CAST: DuckDB windowed SUM yields HUGEINT; driver value-hash is
             -- type-sensitive, Spark emits BIGINT (r7 verdict root cause)
             CAST(SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM seq
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY 1, 2 ORDER BY 1, 2
    """,
    description="sessionization: >30min-gap split via lag+cumsum "
    "(batch twin of session_window)",
)
def ev_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sessionize(events).orderBy("user_id", "session_id")


@register(
    "ev_distinct_user_events",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
    """,
    description="streaming-dedup batch twin "
    "(dropDuplicatesWithinWatermark semantics)",
)
def ev_distinct_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return distinct_user_events(events).orderBy("user_id", "event_type")


@register(
    "ev_json_props_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
    FROM events WHERE event_id < 1000 ORDER BY event_id
    """,
    description="semi-structured JSON property extraction from the "
    "event payload",
)
def ev_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "props")
    return (
        events.filter(F.col("event_id") < 1000)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        )
        .orderBy("event_id")
    )


@register(
    "ev_rolling_hour_value",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_value,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS rolling_n
    FROM events WHERE user_id < 10 ORDER BY user_id, ts, event_id
    """,
    description="RANGE-frame rolling window: per-user trailing-1h sum "
    "and count over event time (time-range frame, not row frame)",
)
def ev_rolling_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from project_graphdb_spark.operators.exact import dec

    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < 10
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            F.sum(dec("value")).over(w).cast("double").alias("rolling_value"),
            F.count("*").over(w).alias("rolling_n"),
        )
        .orderBy("user_id", "ts", "event_id")
    )
