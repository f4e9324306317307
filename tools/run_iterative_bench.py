"""Self-scaled stress run for the ITERATIVE graph family.

The headline scale bench (tools/run_scale_bench.py) covers the
single-pass relational/dedup/ANN stack; this runner covers the family
where 10x data bites differently — one shuffle + eager localCheckpoint
per superstep: the 7 ``galg_*`` algorithms plus the two Cypher queries
that lower to BFS / bounded var-length self-joins.

Usage: python tools/run_iterative_bench.py <sf_dir> [--json out.json]
       [--only name1,name2]

For each query: ONE timed pass, no warm-up. Unlike the lazy single-plan
headline queries there is no cold/warm plan distinction to control for —
every superstep materializes eagerly — and at sf1 a warm-up pass would
double a multi-minute run for no signal. JVM/codegen warm-up is absorbed
by the cheap ``galg_degrees`` query running first. After each query the
per-superstep wall-times recorded by ``graph.algorithms
.LAST_ITER_SECONDS`` are captured, so the output shows not just the
total but how superstep cost evolves (frontier growth/decay, convergence
round) — the per-iteration timing SCALE.md cites.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_graphdb_spark import get_spark, workload  # noqa: E402
from project_graphdb_spark.graph import algorithms  # noqa: E402
from project_graphdb_spark.spark_util import materialize as _materialize  # noqa: E402

ITERATIVE = [
    "galg_degrees",  # non-iterative but same graph build: warm-up + floor
    "galg_bfs_from_customer1",
    "galg_connected_components",
    "galg_shortest_paths",
    "galg_pagerank_top20",
    "galg_label_propagation",
    "galg_triangle_count",
    "galg_kcore_3",
    "cypher_shortestpath_nation_pairs",
    "cypher_varlength_customers_per_region",
]


def clear_persistent(spark) -> None:
    """Free every pinned block between queries: the algorithms free their
    own superseded superstep state, but each returned result frame keeps
    its final checkpoint alive — fine inside one query, unfair memory
    pressure on the next one's timing.

    The forced driver-JVM GC inside ``free_all_persistent`` is what
    lets ContextCleaner reclaim the finished query's shuffle/broadcast
    state — the source of in-sequence timing drift."""
    from project_graphdb_spark.spark_util import free_all_persistent

    free_all_persistent(spark)


def run_fresh(sf_dir: str, names: list[str], out_json: str | None) -> None:
    """One subprocess (one fresh JVM) per query.

    The in-sequence numbers drift badly — repeated full-sequence runs
    showed the SAME query 1.5-2.3x slower late in the sequence than
    standalone (accumulated JVM/session state, not plan cost), which is
    exactly the pathology that mis-ranked the r3 headline table. A
    fresh session per query costs ~10 s of JVM startup each (excluded
    from the timing: the child times only the query) and makes numbers
    reproducible.
    """
    import subprocess
    import tempfile

    merged: dict[str, dict] = {}
    for name in names:
        with tempfile.NamedTemporaryFile(suffix=".json") as tmp:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    sf_dir,
                    "--only",
                    name,
                    "--json",
                    tmp.name,
                ],
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                # surface the child's traceback instead of a bare exit
                # code (stdout is Spark progress noise; stderr has it)
                sys.stderr.write(proc.stderr[-4000:])
                raise RuntimeError(
                    f"fresh-session run of {name!r} failed "
                    f"(exit {proc.returncode}); child stderr above"
                )
            with open(tmp.name) as f:
                merged.update(json.load(f)["results"])
        r = merged[name]
        print(f"{name:40s} {r['sec']:9.3f}s {r['rows']:>10d} rows")
        for algo, secs in r["iter_secs"].items():
            print(f"    {algo}: {len(secs)} iters {secs}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "fresh": True, "results": merged}, f, indent=1)
    print(json.dumps({k: v["sec"] for k, v in merged.items()}))


def main() -> None:
    sf_dir = sys.argv[1]
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    names = ITERATIVE
    if "--only" in sys.argv:
        names = sys.argv[sys.argv.index("--only") + 1].split(",")
    if "--fresh" in sys.argv:
        run_fresh(sf_dir, names, out_json)
        return

    spark = get_spark(app_name="iterative-bench")
    workload._ensure_loaded()

    results: dict[str, dict] = {}
    try:
        for name in names:
            fn = workload.REGISTRY[name].fn
            algorithms.LAST_ITER_SECONDS.clear()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = _materialize(df)
            dt = round(time.perf_counter() - t0, 3)
            iters = {k: v for k, v in algorithms.LAST_ITER_SECONDS.items()}
            results[name] = {"sec": dt, "rows": n, "iter_secs": iters}
            clear_persistent(spark)
            print(f"{name:40s} {dt:9.3f}s {n:>10d} rows")
            for algo, secs in iters.items():
                print(f"    {algo}: {len(secs)} iters {secs}")
    finally:
        # cache-owned bucketed adjacency tables (r12) outlive the
        # per-run cleanup by design; a crash mid-sweep must not
        # orphan corpus-scale parquet in the warehouse
        algorithms.release_edge_layouts(spark)

    payload = {"sf_dir": sf_dir, "results": results}
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps({k: v["sec"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
