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
        REGISTRY[name] = QueryDef(name, fn, oracle, description, headline)
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
# R9 ROTATION PLAN: once CORRECTNESS_r08 lands, every registered query
# has a driver row. Rebuild this list for r9 as: (1) any queries newly
# registered in r9, (2) queries whose implementation changed since
# their last green driver row (r8 changed: sole_late_supplier_orders,
# cypher_revenue_per_year + all compiled-cypher faces via FK elision,
# doc_dup_span_profile/_scrub, pipeline_clean_pack, doc_pack_bins),
# (3) oldest-checked families (r1-r3 rows: agent_*, corpus doc_*,
# graph_queries g_*) to refresh the union.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # r7 additions, never driver-checked (22)
    "knn_join_top3_ivf",
    "emb_quantize_int8",
    "ann_pq_top10",
    "dedup_semantic",
    "dedup_semantic_blocked",
    "emb_ivf_assign",
    "small_quantity_part_revenue",
    "promo_revenue_share",
    "cheapest_customer_per_nation",
    "sole_late_supplier_orders",
    "ev_daily_active_users",
    "ev_daily_active_users_hll",
    "lineitem_quantity_percentiles_approx",
    "ev_dedup_replayed",
    "doc_train_split_counts",
    "orc_roundtrip_order_priority",
    "ev_click_attribution",
    "ev_purchase_revenue_by_segment",
    "doc_bm25_topk",
    "doc_tfidf_terms",
    "multimodal_audio_features",
    "cypher_multilabel_active_buyers",
    # older, never inside any sampled window (15)
    "jsonl_roundtrip_lang_stats",
    "sqlite_ingest_customers_per_region",
    "multimodal_image_dims",
    "multimodal_image_resize",
    "galg_shortest_paths",
    "galg_kcore_3",
    "cypher_bare_pattern_machinery_nations",
    "cypher_bare_pattern_not_idle_customers",
    "cypher_call_subquery_order_counts",
    "cypher_call_subquery_uncorrelated",
    "cypher_call_subquery_topk_per_customer",
    "cypher_call_subquery_status_breakdown",
    "cypher_count_block_busy_customers",
    "cypher_count_block_orders_per_segment",
    "cypher_list_comprehension_stats",
    # new r8 registrations
    "ev_click_attribution_outer",
    "cypher_write_conditional_set",
    "late_order_priority_counts",
    "volume_shipping_nation_pair",
    "nation_market_share",
    "customer_order_count_distribution",
    "discounted_revenue_triples",
    "idle_rich_customers_by_nation",
    # r8-changed implementations / fixed oracles needing a fresh row
    "ev_sessionization",  # oracle HUGEINT cast fixed (r7's one red row)
    "cypher_revenue_per_year",  # FK join elimination landed
    "doc_dup_span_profile",  # candidate-first hashed dup detection
    "doc_dup_span_scrub",
    "pipeline_clean_pack",
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
