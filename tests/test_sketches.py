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


def test_misra_gries_bound_and_completeness(spark):
    """r12 (VERDICT r11 ask #6): the MG guarantee, asserted where the
    sketch actually COMPRESSES — a synthetic Zipf-ish stream with
    vocabulary >> k counters, multiple partitions. Properties: (a)
    every reported count is a lower bound, (b) per-token undercount
    <= N/(k+1), (c) every heavy hitter (exact count > N/(k+1))
    survives the sketch."""
    from pyspark.sql import functions as F

    from project_graphdb_spark.operators.text import mg_token_summaries

    k = 16
    # 5 hot tokens way above the N/(k+1) bound + a 200-token tail:
    # vocabulary >> 16 counters, so every task compresses
    rows = []
    for i, n in enumerate([4000, 2500, 1500, 1200, 900]):
        rows.extend([(f"hot{i}",)] * n)
    for i in range(200):
        rows.extend([(f"t{i:03d}",)] * 20)
    tok = spark.createDataFrame(rows, "token string").repartition(4)
    n_total = tok.count()
    exact = {
        r.token: r.n
        for r in tok.groupBy("token").agg(F.count("*").alias("n")).collect()
    }
    approx = {
        r.token: r.n
        for r in mg_token_summaries(tok, k=k)
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    bound = n_total / (k + 1)
    assert approx, "sketch emitted nothing"
    for t, a in approx.items():
        assert a <= exact[t], (t, a, exact[t])
        assert exact[t] - a <= bound, (t, exact[t] - a, bound)
    heavy = {t for t, n in exact.items() if n > bound}
    assert heavy, "test stream has no heavy hitters — not probing MG"
    missing = heavy - set(approx)
    assert not missing, missing


def test_vocab_topk_approx_matches_exact_twin_at_test_sf(spark, sf_dir):
    """On the test corpus the vocabulary (~31 tokens) is far below the
    production counter budget, so MG never compresses and the approx
    face must EQUAL the hash-checked exact twin row for row — the
    strongest checkable statement at this SF (the compression regime
    is covered by the synthetic-stream bound test above)."""
    from project_graphdb_spark.operators.text import (
        corpus_vocab_topk,
        corpus_vocab_topk_approx,
    )

    exact = [
        (r.token, r.n, r.rank)
        for r in corpus_vocab_topk(spark, sf_dir).collect()
    ]
    approx = [
        (r.token, r.n_approx, r.rank)
        for r in corpus_vocab_topk_approx(spark, sf_dir).collect()
    ]
    assert exact == approx
