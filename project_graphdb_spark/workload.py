"""Named query workload + DuckDB oracle registry.

Every operator capability from SURVEY.md §2 that we claim as implemented
is registered here as a named query: a callable ``(spark, sf_dir) ->
DataFrame`` plus (where SQL-expressible) an equivalent ANSI-SQL oracle
string that DuckDB runs on the same parquet tables. The driver compares
row count + schema + order-insensitive value hash between the two.

Determinism rules (required for value-hash parity between engines):

* SUM/AVG over doubles is accumulation-order-dependent — never hash a
  raw double aggregate. All money/measure sums go through exact
  ``DECIMAL`` arithmetic (bit-identical in Spark and DuckDB), then cast
  to double at the end.
* Window ranks use a total order (explicit tie-breaker keys).
* Output column names are identical on both sides (the driver sorts
  columns by name before hashing).
* Types are aligned (int vs bigint matters for the schema check).

Implementations live in ``project_graphdb_spark.operators``; this module
is the registry the driver contract (``__spark_entry__.py``) re-exports.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver does a weaker rows-only check
    description: str = ""
    headline: bool = False  # include in bench.py timing set


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # release the PREVIOUS query's lingering persists/checkpoint
            # blocks (frames a builder persisted for its RETURNED plan
            # — spark_util's one-slot rolling window, r10 ask #7): the
            # registry is the chokepoint every harness goes through, so
            # no query's blocks outlive the next query's start. The
            # gate (tests/test_persist_gate.py) asserts nothing else
            # survives.
            from project_graphdb_spark.spark_util import release_lingering

            release_lingering()
            return fn(spark, sf_dir)

        REGISTRY[name] = QueryDef(
            name, wrapped, oracle, description, headline
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle}


def headline_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {n: qd.fn for n, qd in REGISTRY.items() if qd.headline}


_LOADED = False

# The driver's correctness gate samples the FIRST 50 registry entries in
# insertion order. Import order used to be the only lever (r1-r7); it
# cannot express "the 10 never-checked cypher queries but not the other
# 32 from the same module", so the window is now an explicit priority
# list applied after all imports: names here come first (in this order),
# everything else keeps import order behind them. r8 window = the 37
# queries never sampled by any r1-r7 driver window (verdict r7 "What's
# missing" #1) + the queries newly registered this round, completing
# driver coverage of the whole registry.
# r9 window (VERDICT r8 ask #1): after the r8 window landed, every
# registered query had a driver row, but 4 queries' ONLY rows were
# stale r1 entries (one pre-fix environment crash, three pre-oracle
# rows-only) — they lead. Then the queries whose implementation changed
# in r9 (IVF sample-trained centroids, Q7/Q8 join reorder, dup-span /
# winnow measurement outcomes), then the oldest-checked r2/r3/r5
# leftovers, then the oldest big bucket (r6-latest families: agent_*,
# g_*, corpus doc_*) to refresh the union. 50 slots = the driver's
# sample size.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # r11 window (VERDICT r10 ask #3 + ADVICE r10 rotation tracking):
    # (a) queries whose implementation changed or was added in r11;
    # (b) ALL 26 queries whose latest driver row is r6 (the stale
    # tail); (c) the oldest r7 rows that fit. The staleness invariant
    # is now ENFORCED by tests/test_window_rotation.py — every
    # registered query must have a driver row within the last
    # MAX_STALE_ROUNDS rounds or sit in this window, so "dropped names
    # rotate back" is a checked property, not a comment's promise.
    #
    # (a) r11-changed/new implementations first
    "emb_label_confusion_pairs",  # r11: enforced label cap, bounded BNLJ
    "ev_funnel_conversion_windowed",  # NEW r11: conversion-window funnel
    "ev_funnel_time_to_convert",  # NEW r11: conversion-latency profile
    "emb_pq_adc_pinned",  # NEW r11: hash-provable PQ encode + ADC face
    # (b) the 26 r6-stale rows — whole tail drains this round
    "corpus_vocab_topk",
    "cypher_edge_counts_by_type",
    "cypher_match_after_with",
    "cypher_node_counts_by_label",
    "cypher_optional_match_order_counts",
    "cypher_predicate_surface",
    "cypher_region_customer_counts",
    "cypher_status_counts",
    "cypher_top_customers",
    "cypher_total_node_count",
    "cypher_value_probe",
    "cypher_varlength_customers_per_region",
    "cypher_with_having",
    "doc_chunk_windows",
    "doc_contamination_check",
    "doc_lang_id",
    "doc_lm_score",
    "doc_mix_rebalance",
    "doc_pii_scrub",
    "doc_quality_filter",
    "doc_quality_scores",
    "doc_repetition_stats",
    "doc_shuffle_shards",
    "doc_stratified_sample",
    "g_edge_counts_by_type",
    "g_total_node_count",
    # (c) oldest r7 rows filling to 50 — the seven names r10 dropped
    # with a rotation promise come back first (ADVICE r10), then the
    # rest of the r7 bucket in name order; the 8 r7 leftovers
    # (custkeys_active_both_endpoints, custkeys_only_first_year,
    # customers_with_orders_semi, customers_without_orders,
    # emb_norm_stats, ev_json_props_extract, orders_predicate_filter,
    # value_probe_mktsegment) are r12's first fill, enforced by the
    # staleness gate
    "pricing_summary",
    "top3_customers_per_nation",
    "revenue_rollup_nation_year",
    "local_supplier_volume",
    "building_segment_brand_revenue",
    "lineitem_quantity_percentiles",
    "ann_cosine_top10",
    "dedup_exact",
    "dedup_incremental_winnow",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_strict",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "embedding_near_dup_pairs",
    "ev_rolling_hour_value",
    "ev_tumbling_hourly",
    "knn_join_top3",
    "orders_cube_status_priority",
    "orders_grouping_sets_status_year",
    "orders_status_pivot",
    # total_sales_2000 (r7) displaced by ev_funnel_time_to_convert —
    # at 4 rounds stale it is still inside the rotation gate's bound
    # and leads r12's fill
)


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their @register side effects; import order no
    # longer decides the driver window (see _WINDOW_PRIORITY above).
    # NOTE: modules must not import registration modules at module
    # level (pure expression helpers live in operators/text_fns.py for
    # this reason) — duplicate registration raises.
    from project_graphdb_spark.operators import (  # noqa: F401
        streaming_workload,
        relational,
        similarity,
        dedup,
        skew,
        similarity_scale,
        relational_ext,
        relational_tpch,
        sketches,
        orc_workload,
        jsonl_workload,
        sqlite_workload,
        multimodal,
        rangejoin,
        streaming_enrich,
        graph_algo_workload,
        asof,
        agent_workload,
        cypher_workload,
        graph_queries,
        corpus,
        text,
        event_analytics,
    )

    # Pull the window-priority queries to the front of the registry's
    # insertion order (the driver samples the first 50).
    front = {
        n: REGISTRY[n] for n in _WINDOW_PRIORITY if n in REGISTRY
    }
    rest = {n: qd for n, qd in REGISTRY.items() if n not in front}
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(rest)

    _LOADED = True
