"""Profile fixed per-query overheads at sf0.1.

  floor     : materialize(1-row local plan) — harness + action floor
  build     : steady-state fn(spark, sf_dir) wall (plan construction)
  exec_same : materialize the SAME DataFrame object repeatedly
              (physical plan cached in QueryExecution -> no re-plan)
  exec_new  : rebuild + materialize (what bench times)

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_graphdb_spark import get_spark  # noqa: E402
from project_graphdb_spark import workload  # noqa: E402
from project_graphdb_spark.spark_util import materialize  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "7"))
NAMES = os.environ.get(
    "NAMES",
    "pricing_summary,cypher_revenue_per_year,ev_daily_active_users,"
    "dedup_minhash_lsh,ann_cosine_top10,g_revenue_by_brand",
).split(",")


def med(ts):
    return round(statistics.median(ts), 4)


def main() -> None:
    spark = get_spark(app_name="exp_overhead")
    qs = workload.queries()

    floor_ts = []
    one = spark.range(1)
    materialize(one)
    for _ in range(REPS):
        t0 = time.perf_counter()
        materialize(spark.range(1))
        floor_ts.append(time.perf_counter() - t0)

    out = {"floor": med(floor_ts), "reps": REPS}
    for name in NAMES:
        fn = qs[name]
        df = fn(spark, SF_DIR)  # first build warms imports
        materialize(df)
        build_ts, same_ts, new_ts = [], [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            df2 = fn(spark, SF_DIR)
            build_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            materialize(df)  # same object: physical plan already cached
            same_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            materialize(df2)  # fresh object: full analyze+optimize+plan
            new_ts.append(time.perf_counter() - t0)
        out[name] = {
            "build": med(build_ts),
            "exec_same": med(same_ts),
            "exec_new": med(new_ts),
        }
        print(name, out[name], file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
