"""Event-analytics shapes over the ``events`` table: ordered funnel
conversion, cohort retention, and top event paths.

These extend the event-stream surface (SURVEY.md §2.E) with the three
classic product-analytics queries a warehouse user runs daily. All
three are plain DataFrame plans — window functions, conditional
aggregation, and user-keyed joins — with DuckDB oracles, so they ride
the driver's hash gate like every other registered query.

Scale notes (100 TB):

* Every heavy shuffle below keys on ``user_id`` — the natural event
  partitioning — so the funnel's stage joins, retention's
  first-seen/activity join, and the path window all co-partition and
  reuse exchanges; nothing sorts or groups globally until the frames
  are cohort/path-bounded (weeks x offsets, |event_type|^k paths).
* Stage filters (``event_type = 'view'``) are literal predicates that
  reach the parquet scan (PushedFilters).
* The funnel's three stage counts are 1-row aggregates combined with
  bounded broadcast nested loops — the pinned ``bnlj_bounded`` class,
  not real cartesians.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.workload import register

#: ordered funnel stage definitions: (stage_ord, label, event_type)
FUNNEL_STAGES = (
    (1, "view", "view"),
    (2, "click_after_view", "click"),
    (3, "purchase_after_click", "purchase"),
)


#: conversion window (hours) for the time-bounded funnel variant: a
#: stage-k event only counts if it lands within this many hours of the
#: stage-(k-1) entry. 48 h binds on the generated corpus (view->click
#: gap median 32 h, p90 120 h), so the windowed counts genuinely differ
#: from the open-ended funnel's.
FUNNEL_CONVERSION_WINDOW_HOURS = 48


def funnel_conversion(
    events: DataFrame, window_hours: int | None = None
) -> DataFrame:
    """Strict ordered funnel view -> click -> purchase.

    A user reaches stage k when an event of stage k's type occurs
    STRICTLY AFTER the user's stage-(k-1) entry time (first qualifying
    event) — the textbook "did they come back and click after the first
    view" semantics, not mere per-type presence. Each stage is a
    monotonically shrinking user-keyed frame: filter the typed slice,
    join to the previous stage's entry times, keep later events, take
    the per-user minimum.

    With ``window_hours`` set, each stage transition additionally
    requires the qualifying event to land WITHIN that many hours of the
    previous stage's entry (``prev_ts < ts <= prev_ts + window``) — the
    real product-analytics contract ("clicked within 2 days of the
    first view"), one extra sargable predicate per stage join; the
    plan shape and shuffle keys are identical to the open-ended form
    (r11, VERDICT r10 ask #5).
    """
    ev = events.select("user_id", "event_type", "ts")
    prev: DataFrame | None = None
    stage_counts = []
    for ord_, label, etype in FUNNEL_STAGES:
        sliced = ev.filter(F.col("event_type") == etype)
        if prev is None:
            entered = sliced.groupBy("user_id").agg(
                F.min("ts").alias("entry_ts")
            )
        else:
            cond = F.col("ts") > F.col("prev_ts")
            if window_hours is not None:
                cond = cond & (
                    F.col("ts")
                    <= F.col("prev_ts")
                    + F.expr(f"INTERVAL {int(window_hours)} HOURS")
                )
            entered = (
                sliced.join(
                    prev.select("user_id", F.col("entry_ts").alias("prev_ts")),
                    "user_id",
                )
                .filter(cond)
                .groupBy("user_id")
                .agg(F.min("ts").alias("entry_ts"))
            )
        stage_counts.append(
            entered.agg(F.count("*").alias(f"n{ord_}"))
        )
        prev = entered
    # three 1-row frames -> one 1-row frame (bounded BNLJ class), then
    # ONE explode into the 3 stage rows — a union of per-stage selects
    # would re-evaluate the whole stage chain per branch (3x the fact
    # scan at scale), the explode touches the 1-row frame once
    from functools import reduce

    n = reduce(DataFrame.crossJoin, stage_counts)
    stage_structs = []
    for ord_, label, _ in FUNNEL_STAGES:
        conv = (
            F.lit(1.0)
            if ord_ == 1
            else F.when(
                F.col(f"n{ord_ - 1}") > 0,
                F.round(F.col(f"n{ord_}") / F.col(f"n{ord_ - 1}"), 6),
            )
        )
        stage_structs.append(
            F.struct(
                F.lit(ord_).alias("stage_ord"),
                F.lit(label).alias("stage"),
                F.col(f"n{ord_}").alias("n_users"),
                conv.cast("double").alias("conv_from_prev"),
            )
        )
    return (
        n.select(F.explode(F.array(*stage_structs)).alias("s"))
        .select("s.*")
        .orderBy("stage_ord")
    )


@register(
    "ev_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
    ), n AS (
      SELECT (SELECT COUNT(*) FROM v) AS n1,
             (SELECT COUNT(*) FROM c) AS n2,
             (SELECT COUNT(*) FROM p) AS n3
    )
    SELECT * FROM (
      SELECT 1 AS stage_ord, 'view' AS stage,
             CAST(n1 AS BIGINT) AS n_users,
             CAST(1.0 AS DOUBLE) AS conv_from_prev FROM n
      UNION ALL
      SELECT 2, 'click_after_view', CAST(n2 AS BIGINT),
             CAST(CASE WHEN n1 > 0
                       THEN ROUND(n2 * 1.0 / n1, 6) END AS DOUBLE) FROM n
      UNION ALL
      SELECT 3, 'purchase_after_click', CAST(n3 AS BIGINT),
             CAST(CASE WHEN n2 > 0
                       THEN ROUND(n3 * 1.0 / n2, 6) END AS DOUBLE) FROM n
    ) ORDER BY stage_ord
    """,
    description="strict ordered funnel view->click->purchase: stage k "
    "counts users whose first qualifying event is strictly after their "
    "stage-(k-1) entry (3 user-keyed shrinking joins, type filters in "
    "PushedFilters; stage totals combine as 1-row bnlj_bounded frames)",
)
def ev_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_conversion(load_table(spark, sf_dir, "events"))


@register(
    "ev_funnel_conversion_windowed",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL {FUNNEL_CONVERSION_WINDOW_HOURS} HOURS
      GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL {FUNNEL_CONVERSION_WINDOW_HOURS} HOURS
      GROUP BY 1
    ), n AS (
      SELECT (SELECT COUNT(*) FROM v) AS n1,
             (SELECT COUNT(*) FROM c) AS n2,
             (SELECT COUNT(*) FROM p) AS n3
    )
    SELECT * FROM (
      SELECT 1 AS stage_ord, 'view' AS stage,
             CAST(n1 AS BIGINT) AS n_users,
             CAST(1.0 AS DOUBLE) AS conv_from_prev FROM n
      UNION ALL
      SELECT 2, 'click_after_view', CAST(n2 AS BIGINT),
             CAST(CASE WHEN n1 > 0
                       THEN ROUND(n2 * 1.0 / n1, 6) END AS DOUBLE) FROM n
      UNION ALL
      SELECT 3, 'purchase_after_click', CAST(n3 AS BIGINT),
             CAST(CASE WHEN n2 > 0
                       THEN ROUND(n3 * 1.0 / n2, 6) END AS DOUBLE) FROM n
    ) ORDER BY stage_ord
    """,
    description="time-bounded ordered funnel (r11): stage k requires "
    "the qualifying event WITHIN "
    f"{FUNNEL_CONVERSION_WINDOW_HOURS} h of the stage-(k-1) entry "
    "(prev_ts < ts <= prev_ts + window) — the real conversion-window "
    "contract; same user-keyed shrinking joins and PushedFilters as "
    "the open-ended face, one extra sargable predicate per stage",
)
def ev_funnel_conversion_windowed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return funnel_conversion(
        load_table(spark, sf_dir, "events"),
        window_hours=FUNNEL_CONVERSION_WINDOW_HOURS,
    )


def funnel_time_to_convert(events: DataFrame) -> DataFrame:
    """Conversion-latency stats per funnel transition (r11): among
    users who converted (same strict-after entry times as
    :func:`funnel_conversion`), how long did each stage transition
    take — count, mean, min, max in whole seconds.

    Exactness contract: latencies are integer seconds derived from
    exact microsecond timestamps (``floor(us_diff / 1e6)``, identical
    in Spark and DuckDB); the mean is one double division of two exact
    integers, so the 6-dp rounding can never straddle an engine gap
    (the sums stay far inside 2^53 — that is WHY seconds, not
    microseconds, are the aggregation unit).
    """
    ev = events.select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        # t1 is functionally determined by user_id; min() picks the
        # one value deterministically without a second join back
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t2"), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t2").alias("t2"))
    )

    def stats(frame: DataFrame, a: str, b: str, label: str) -> DataFrame:
        # integral DIV, not `/`+cast: a double true-division can land
        # an epsilon under the integer and truncate differently than
        # DuckDB's integer floor-div (both diffs are positive, so
        # DIV's truncation == // 's floor)
        secs = F.expr(
            f"(unix_micros({b}) - unix_micros({a})) DIV 1000000"
        )
        return frame.select(secs.alias("s")).agg(
            F.lit(label).alias("transition"),
            F.count("*").alias("n_converted"),
            F.round(F.sum("s") / F.count("*"), 6)
            .cast("double")
            .alias("avg_seconds"),
            F.min("s").alias("min_seconds"),
            F.max("s").alias("max_seconds"),
        )

    return (
        stats(c, "t1", "t2", "view_to_click")
        .unionAll(stats(p, "t2", "t3", "click_to_purchase"))
        # a global agg over an empty converter set yields one
        # n_converted=0 row; the oracle's GROUP BY yields none — emit
        # rows only for transitions somebody actually completed
        .filter(F.col("n_converted") > 0)
        .orderBy("transition")
    )


@register(
    "ev_funnel_time_to_convert",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2, MIN(v.t1) AS t1
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3, MIN(c.t2) AS t2
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
    ), lat AS (
      SELECT 'view_to_click' AS transition,
             (epoch_us(t2) - epoch_us(t1)) // 1000000 AS s FROM c
      UNION ALL
      SELECT 'click_to_purchase',
             (epoch_us(t3) - epoch_us(t2)) // 1000000 FROM p
    )
    SELECT transition, COUNT(*) AS n_converted,
           CAST(ROUND(SUM(s) * 1.0 / COUNT(*), 6) AS DOUBLE)
             AS avg_seconds,
           MIN(s) AS min_seconds, MAX(s) AS max_seconds
    FROM lat GROUP BY transition ORDER BY transition
    """,
    description="conversion-latency profile per funnel transition "
    "(r11): count / mean / min / max whole seconds between strict-"
    "after stage entries, integer-exact cross-engine (floor of the "
    "microsecond diff; mean = one double division of exact integers). "
    "Same user-keyed shrinking joins as the funnel faces",
)
def ev_funnel_time_to_convert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return funnel_time_to_convert(load_table(spark, sf_dir, "events"))


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly cohort retention matrix.

    Cohort = ISO week (Monday) of a user's first event; a cohort's
    week-``k`` retention is the fraction of its users active in
    cohort_week + k weeks. Both aggregations and the join key on
    ``user_id``; the output grain is (cohort_week x week_offset) —
    bounded by the calendar, tiny at any corpus size.
    """
    ev = events.select("user_id", "ts")
    coh = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user_id",
            F.date_trunc("week", "first_ts").alias("cohort_week"),
        )
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    ret = (
        coh.join(act, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        # plain count, not countDistinct: act is distinct per
        # (user_id, week) and cohort_week is functionally determined by
        # user_id, so a user contributes at most one row per group —
        # count(*) is value-identical and skips the distinct expand
        .agg(F.count("*").alias("n_active"))
    )
    sizes = coh.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users")
    )
    return (
        ret.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_users"), 6)
            .cast("double")
            .alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "ev_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1
    ), coh AS (
      SELECT user_id,
             date_trunc('week', first_ts) AS cohort_week
      FROM first_seen
    ), act AS (
      SELECT DISTINCT user_id,
             date_trunc('week', ts) AS week
      FROM events
    ), sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_users FROM coh GROUP BY 1
    ), ret AS (
      SELECT c.cohort_week,
             CAST(date_diff('day', c.cohort_week, a.week) / 7 AS BIGINT)
               AS week_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM coh c JOIN act a ON c.user_id = a.user_id
      GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.week_offset, r.n_active,
           CAST(ROUND(r.n_active * 1.0 / s.cohort_users, 6) AS DOUBLE)
             AS retention
    FROM ret r JOIN sizes s ON r.cohort_week = s.cohort_week
    ORDER BY r.cohort_week, r.week_offset
    """,
    description="weekly cohort retention: cohort = week of first event, "
    "retention = fraction of the cohort active k weeks later (all "
    "shuffles keyed on user_id, output grain calendar-bounded)",
)
def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_cohorts(load_table(spark, sf_dir, "events"))


PATH_LEN = 3
PATH_TOP_K = 10


def top_event_paths(
    events: DataFrame, path_len: int = PATH_LEN, k: int = PATH_TOP_K
) -> DataFrame:
    """Top-k most common first-``path_len`` event-type sequences.

    One row_number window partitioned by ``user_id`` (total order via
    (ts, event_id)), then an ordered array fold per user and a count by
    path string. Users with fewer than ``path_len`` events drop (their
    path is a different population). Path cardinality is bounded by
    |event_type|^path_len, so the final aggregation is tiny.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= path_len)
    )
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count("*").alias("n_ev"),
    )
    return (
        paths.filter(F.col("n_ev") == path_len)
        .groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(k)
    )


@register(
    "ev_top_event_paths",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), paths AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
             COUNT(*) AS n_ev
      FROM ranked WHERE rn <= {PATH_LEN} GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users FROM paths WHERE n_ev = {PATH_LEN}
    GROUP BY path ORDER BY n_users DESC, path LIMIT {PATH_TOP_K}
    """,
    description=f"path analysis: top-{PATH_TOP_K} first-{PATH_LEN}-event "
    "type sequences across users (one user_id window with a total "
    "order, path cardinality |event_type|^"
    f"{PATH_LEN} bounds the final agg)",
)
def ev_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_event_paths(load_table(spark, sf_dir, "events"))
