"""Error-bound gates for the sketch faces (HLL distinct counts,
Greenwald-Khanna quantiles) against their hash-checked exact twins,
plus shape checks for the deterministic split."""

from __future__ import annotations

import pytest

from project_graphdb_spark.operators.sketches import (
    TRAIN_FRAC,
    VAL_FRAC,
    doc_train_split_counts,
    ev_daily_active_users,
    ev_daily_active_users_hll,
    lineitem_quantity_percentiles_approx,
)


def test_hll_daily_users_within_error(spark, sf_dir):
    exact = {
        r.day: r.n_users for r in ev_daily_active_users(spark, sf_dir).collect()
    }
    approx = {
        r.day: r.n_users_approx
        for r in ev_daily_active_users_hll(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)  # same day grid
    for day, n in exact.items():
        rel_err = abs(approx[day] - n) / n
        # rsd=0.02 — allow 5 standard deviations of slack
        assert rel_err <= 0.10, f"{day}: HLL rel err {rel_err:.3f}"


def test_percentile_sketch_within_error(spark, sf_dir):
    from project_graphdb_spark.operators.relational import (
        lineitem_quantity_percentiles,
    )

    exact = lineitem_quantity_percentiles(spark, sf_dir).collect()[0]
    approx = lineitem_quantity_percentiles_approx(spark, sf_dir).collect()[0]
    spread = exact.p95 - exact.p25
    for q in ("p25", "p50", "p75", "p95"):
        err = abs(getattr(approx, q) - getattr(exact, q))
        assert err <= 0.02 * spread + 1e-9, f"{q}: sketch err {err}"


def test_train_split_fractions_and_stability(spark, sf_dir):
    rows = doc_train_split_counts(spark, sf_dir).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    total = sum(by_split.values())
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] / total == pytest.approx(TRAIN_FRAC, abs=0.03)
    assert by_split["val"] / total == pytest.approx(VAL_FRAC, abs=0.02)
    # determinism: a second run produces the identical frame
    again = doc_train_split_counts(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
