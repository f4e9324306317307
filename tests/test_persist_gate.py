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
