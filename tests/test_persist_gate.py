"""Structural persist-leak gate (r10, VERDICT r9 ask #7).

r9 fixed the lingering dup-span persists by hand (`corpus._LINGERING`);
this gate makes the CLASS structural: every registered query is run and
materialized, the DOCUMENTED session caches are released (the dup-span
one-slot lingering window and the `_persisted_memo` index frames —
shingles / MinHash signatures / BM25 + tf-idf postings / PQ codes / IVF
assignment), and the block manager must then hold NO persistent RDD
that was not already registered before the query ran. A reintroduced
leak — a `persist()` whose frame neither unpersists in-scope nor
registers with a documented release path — fails here by name, for any
FUTURE registry addition too.
"""

from __future__ import annotations

from project_graphdb_spark import workload
from project_graphdb_spark.spark_util import materialize, persistent_rdd_ids

workload._ensure_loaded()


def _release_documented_caches() -> None:
    from project_graphdb_spark.operators.corpus import _release_lingering
    from project_graphdb_spark.operators.dedup import clear_shingle_cache

    _release_lingering()
    clear_shingle_cache()


def test_no_query_leaks_persistent_rdds(spark, sf_dir):
    """Run EVERY registered query; after releasing the documented
    caches, the persistent-RDD set must return to (a subset of) its
    pre-query state."""
    sc = spark.sparkContext
    # other tests share this session — start from a clean slate so a
    # foreign block can't mask or fake a leak
    _release_documented_caches()
    leaks: dict[str, set[int]] = {}
    for name, qd in workload.REGISTRY.items():
        before = persistent_rdd_ids(sc)
        materialize(qd.fn(spark, sf_dir))
        _release_documented_caches()
        leaked = persistent_rdd_ids(sc) - before
        if leaked:
            leaks[name] = leaked
            # free them so one leaker can't cascade into later names
            from project_graphdb_spark.spark_util import unpersist_ids

            unpersist_ids(sc, leaked, blocking=True)
    assert not leaks, f"queries leaked persistent RDDs: {leaks}"
    # r12: the registry-wide run also exercises every galg query's
    # bucketed adjacency — after the explicit release hook the
    # warehouse must hold no pregel_edges_* table (cache-owned tables
    # are NOT leaks while cached; unreleased ones would be)
    from project_graphdb_spark.graph.algorithms import (
        release_edge_layouts,
    )

    release_edge_layouts(spark)
    leftover = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("pregel_edges_")
    ]
    assert not leftover, f"unreleased bucketed edge tables: {leftover}"


def test_injected_superstep_failure_leaves_clean_state(
    spark, sf_dir, monkeypatch
):
    """r12 (VERDICT r11 ask #3): a superstep that throws mid-loop must
    not strand checkpoint blocks, and the bucketed edge table written
    before the failure stays CACHE-owned — the release hook leaves a
    clean warehouse. On a real cluster the old success-path-only
    cleanup leaked corpus-scale parquet nobody owned."""
    import pytest
    from pyspark.sql import functions as F

    from project_graphdb_spark.graph import algorithms as alg

    alg.release_edge_layouts(spark)
    sc = spark.sparkContext
    verts = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    before = persistent_rdd_ids(sc)
    calls = {"n": 0}
    real = alg.aggregate_messages

    def boom(*a, **k):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected superstep failure")
        return real(*a, **k)

    monkeypatch.setattr(alg, "aggregate_messages", boom)
    with pytest.raises(RuntimeError, match="injected"):
        alg.pregel(
            verts,
            edges,
            initial={"x": F.col("id")},
            message=F.col("v_x"),
            agg=F.min("__msg"),
            update={"x": F.coalesce(F.col("__agg"), F.col("x"))},
            max_iter=5,
            telemetry_name="injected_failure",
        )
    # every superstep checkpoint the loop made was freed on the way out
    assert persistent_rdd_ids(sc) - before == set()
    # the adjacency table survives the failure as a CACHED layout
    # (reusable by a retry), and the explicit release drops it
    alg.release_edge_layouts(spark)
    leftover = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("pregel_edges_")
    ]
    assert not leftover, leftover


def test_convergence_job_failure_frees_fresh_checkpoint(
    spark, monkeypatch
):
    """r12 code-review fix: when the CONVERGENCE-count job dies after
    `_ckpt(updated)` succeeded but before the state swap, the freshly
    checkpointed blocks (new_ids) must be freed too — the first cut's
    except-path only freed the superseded state."""
    import pytest
    from pyspark.sql import functions as F

    from project_graphdb_spark.graph import algorithms as alg

    # pyspark 4: the classic DataFrame SUBCLASS defines collect, so
    # the base class is not the dispatch target
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older pyspark: single class
        from pyspark.sql import DataFrame

    alg.release_edge_layouts(spark)
    sc = spark.sparkContext
    verts = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    before = persistent_rdd_ids(sc)
    real_collect = DataFrame.collect

    def boom(self):
        raise RuntimeError("injected convergence-job failure")

    monkeypatch.setattr(DataFrame, "collect", boom)
    try:
        with pytest.raises(RuntimeError, match="injected convergence"):
            alg.pregel(
                verts,
                edges,
                initial={"x": F.col("id")},
                message=F.col("v_x"),
                agg=F.min("__msg"),
                update={"x": F.coalesce(F.col("__agg"), F.col("x"))},
                max_iter=5,
                converge_on="x",
                telemetry_name="injected_convergence_failure",
            )
    finally:
        monkeypatch.setattr(DataFrame, "collect", real_collect)
    assert persistent_rdd_ids(sc) - before == set()
    alg.release_edge_layouts(spark)
