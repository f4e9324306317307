"""Unit semantics for the temporal join operators (the oracle gate
covers the full-table paths; these pin the edge cases)."""

from __future__ import annotations

import datetime as dt

from project_graphdb_spark.operators.asof import asof_join
from project_graphdb_spark.operators.rangejoin import interval_join_binned


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_at_or_before_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(100)), (2, 7, _ts(50)), (3, 8, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _ts(100), 1.0), (7, _ts(60), 2.0), (7, _ts(99), 3.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = {
        r["event_id"]: r["matched_value"]
        for r in asof_join(left, right).collect()
    }
    assert rows[1] == 1.0  # exact tie matches (at-or-before)
    assert rows[2] is None  # nothing at-or-before ts=50
    assert rows[3] is None  # user 8 has no right rows (left join)


def test_interval_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(3599)), (3, _ts(3600)), (4, _ts(7200))],
        "pid long, ts timestamp",
    )
    # [0, 3600) — half-open: 3600 excluded
    intervals = spark.createDataFrame(
        [(10, _ts(0), _ts(3600))],
        "iid long, lo timestamp, hi timestamp",
    )
    got = sorted(
        r["pid"]
        for r in interval_join_binned(
            points, intervals, "ts", "lo", "hi", bin_seconds=600
        ).collect()
    )
    assert got == [1, 2]
