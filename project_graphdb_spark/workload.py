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
    # r12 window (VERDICT r11 asks #1/#2): (a) the 9 r7-stale queries
    # the red staleness gate named — forced, they lead; (b) the ENTIRE
    # r8 cohort (37 rows) pulled forward one round early so r13's
    # forced set drains to zero and the r14/r15 cohort bulges (49
    # r10-sampled + 50 r11-sampled rows aging out together) stay
    # absorbable — tests/test_window_rotation.py now SIMULATES the
    # greedy oldest-first rotation forward and asserts every future
    # round's forced set fits in 50 slots; (c) oldest r9 rows filling
    # the remainder. r12-changed implementations are swapped into (c)
    # as they land (each swap displaces a not-yet-forced fill row).
    #
    # (a) the 9 forced r7-stale rows
    "custkeys_active_both_endpoints",
    "custkeys_only_first_year",
    "customers_with_orders_semi",
    "customers_without_orders",
    "emb_norm_stats",
    "ev_json_props_extract",
    "orders_predicate_filter",
    "total_sales_2000",
    "value_probe_mktsegment",
    # (b) the whole r8 cohort, name order — drains r13's forced set
    "ann_pq_top10",
    "cheapest_customer_per_nation",
    "cypher_bare_pattern_machinery_nations",
    "cypher_bare_pattern_not_idle_customers",
    "cypher_call_subquery_order_counts",
    "cypher_call_subquery_status_breakdown",
    "cypher_call_subquery_topk_per_customer",
    "cypher_call_subquery_uncorrelated",
    "cypher_count_block_busy_customers",
    "cypher_count_block_orders_per_segment",
    "cypher_list_comprehension_stats",
    "cypher_multilabel_active_buyers",
    "cypher_write_conditional_set",
    "dedup_semantic",
    "discounted_revenue_triples",
    "doc_bm25_topk",
    "doc_tfidf_terms",
    "doc_train_split_counts",
    "emb_quantize_int8",
    "ev_click_attribution",
    "ev_click_attribution_outer",
    "ev_daily_active_users",
    "ev_daily_active_users_hll",
    "ev_dedup_replayed",
    "ev_purchase_revenue_by_segment",
    "ev_sessionization",
    "idle_rich_customers_by_nation",
    "late_order_priority_counts",
    "lineitem_quantity_percentiles_approx",
    "multimodal_audio_features",
    "multimodal_image_dims",
    "multimodal_image_resize",
    "orc_roundtrip_order_priority",
    "promo_revenue_share",
    "small_quantity_part_revenue",
    "sole_late_supplier_orders",
    "sqlite_ingest_customers_per_region",
    # (c) r12-new and r12-changed implementations (displaced the four
    # oldest-r9 agent_* fills, which the simulation shows stay
    # absorbable): the new MG heavy-hitters face (no driver row yet —
    # the staleness gate forces it into the window), the funnel
    # latency profile (zero-converter rows now filtered, ADVICE fix),
    # and two representatives of the galg family whose edge-layout
    # plan changed to the session-shared bucketed cache
    "corpus_vocab_topk_approx",
    "ev_funnel_time_to_convert",
    "galg_pagerank_top20",
    "galg_connected_components",
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
