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


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # imports are for their @register side effects
    from project_graphdb_spark.operators import (  # noqa: F401
        agent_workload,
        asof,
        corpus,
        cypher_workload,
        dedup,
        graph_algo_workload,
        graph_queries,
        jsonl_workload,
        streaming_workload,
        multimodal,
        rangejoin,
        relational,
        similarity,
        skew,
        sqlite_workload,
        text,
    )

    _LOADED = True
