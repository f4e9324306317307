"""Semantics pins for the event-analytics operators (the oracle parity
rows live in test_workload_oracle; these pin the parts a value-hash
can't see: strict-after funnel ordering, retention bounds, path
tie-breaks, and the funnel's single-evaluation plan shape)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from project_graphdb_spark.operators.event_analytics import (
    funnel_conversion,
    retention_cohorts,
    top_event_paths,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), u, t, 0.0, "{}")
            for i, (d, h, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_strict_order(spark):
    # user 1: view -> click -> purchase (full funnel)
    # user 2: click BEFORE view only -> stalls at stage 1
    # user 3: view -> click, purchase BEFORE the click -> stalls at 2
    rows = [
        (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "purchase"),
        (2, 2, 2, "click"), (2, 3, 2, "view"),
        (3, 1, 3, "view"), (3, 4, 3, "click"), (3, 2, 3, "purchase"),
    ]
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_conversion(_ev(spark, rows)).collect()
    }
    assert got == {
        "view": 3,
        "click_after_view": 2,
        "purchase_after_click": 1,
    }


def test_funnel_window_bounds_conversion(spark):
    """The r11 conversion-window variant: a click 3 days after the
    first view converts the open-ended funnel but NOT the 48 h one;
    a click exactly AT the window edge (<=) still converts."""
    rows = [
        # user 1: view day 1, click day 4 (72 h later) — outside 48 h
        (1, 0, 1, "view"), (4, 0, 1, "click"),
        # user 2: view day 1 00:00, click day 3 00:00 (exactly 48 h)
        (1, 0, 2, "view"), (3, 0, 2, "click"),
    ]
    ev = _ev(spark, rows)
    open_ = {
        r["stage"]: r["n_users"] for r in funnel_conversion(ev).collect()
    }
    bounded = {
        r["stage"]: r["n_users"]
        for r in funnel_conversion(ev, window_hours=48).collect()
    }
    assert open_["click_after_view"] == 2
    assert bounded["click_after_view"] == 1  # edge-inclusive, late drops
    assert bounded["view"] == open_["view"] == 2


def test_funnel_windowed_binds_on_testdata(spark, sf_dir):
    """On the generated corpus the 48 h window must genuinely bind
    (strictly fewer stage-2 users than the open-ended funnel) — a
    window wider than every gap would make the windowed face a
    duplicate registration of the open-ended one."""
    from project_graphdb_spark.io.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n2 = {
        r["stage_ord"]: r["n_users"]
        for r in funnel_conversion(ev).collect()
    }
    n2w = {
        r["stage_ord"]: r["n_users"]
        for r in funnel_conversion(ev, window_hours=48).collect()
    }
    assert n2w[1] == n2[1]  # stage 1 has no window
    assert n2w[2] < n2[2]
    assert n2w[3] <= n2[3]


def test_funnel_counts_monotonic_on_testdata(spark, sf_dir):
    from project_graphdb_spark.io.tables import load_table

    out = funnel_conversion(load_table(spark, sf_dir, "events")).collect()
    ns = [r["n_users"] for r in sorted(out, key=lambda r: r["stage_ord"])]
    assert ns == sorted(ns, reverse=True)


def test_funnel_plan_evaluates_stages_once(spark, sf_dir):
    """The 3 output rows come from ONE explode over the 1-row count
    frame — a per-stage union would re-run the whole stage chain (and
    its fact scans) once per branch."""
    from project_graphdb_spark.io.tables import load_table

    df = funnel_conversion(load_table(spark, sf_dir, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1
    assert "Union" not in plan


def test_retention_week0_is_full_cohort(spark, sf_dir):
    """Every user is by construction active in their own first week, so
    offset-0 retention is exactly 1.0 for every cohort, offsets are
    non-negative, and rates stay in (0, 1]."""
    from project_graphdb_spark.io.tables import load_table

    rows = retention_cohorts(load_table(spark, sf_dir, "events")).collect()
    assert rows
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0.0 < r["retention"] <= 1.0
        if r["week_offset"] == 0:
            assert r["retention"] == 1.0


def test_top_paths_orders_and_breaks_ties(spark):
    # two users share path a>b>c, one has b>a>c, one has only 2 events
    # (dropped); tie between counts resolved by path string
    rows = [
        (1, 1, 1, "a"), (1, 2, 1, "b"), (1, 3, 1, "c"),
        (2, 1, 2, "a"), (2, 2, 2, "b"), (2, 3, 2, "c"),
        (3, 1, 3, "b"), (3, 2, 3, "a"), (3, 3, 3, "c"),
        (4, 1, 4, "a"), (4, 2, 4, "b"),
    ]
    got = [
        (r["path"], r["n_users"])
        for r in top_event_paths(_ev(spark, rows)).collect()
    ]
    assert got == [("a>b>c", 2), ("b>a>c", 1)]


def test_top_paths_uses_one_user_window(spark, sf_dir):
    """Path extraction is a single user_id-partitioned window — no
    global sort funnel before the final (bounded) path aggregate."""
    from project_graphdb_spark.io.tables import load_table

    df = top_event_paths(load_table(spark, sf_dir, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no global range-partitioned sort anywhere — ordering work is the
    # user_id-partitioned window plus the bounded top-k collector
    assert "rangepartitioning" not in plan, plan
    assert plan.count("TakeOrderedAndProject") == 1


def test_time_to_convert_drops_zero_converter_transitions(spark):
    """r12 ADVICE fix: a corpus where nobody completes a transition must
    yield NO row for it (the oracle's GROUP BY emits none), not a
    Spark-only n_converted=0 row from the global aggregate."""
    from project_graphdb_spark.operators.event_analytics import (
        funnel_time_to_convert,
    )

    # views and clicks, but zero purchases -> click_to_purchase vanishes
    ev = _ev(
        spark,
        [(1, 1, 1, "view"), (1, 2, 1, "click"), (2, 1, 2, "view")],
    )
    rows = funnel_time_to_convert(ev).collect()
    assert [r.transition for r in rows] == ["view_to_click"]
    assert rows[0].n_converted == 1
    # nobody converts at all -> empty frame, same as the oracle
    assert funnel_time_to_convert(
        _ev(spark, [(1, 1, 1, "view")])
    ).count() == 0
