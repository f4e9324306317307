"""Decompose the two >2x sf1 headline ratios (SCALE.md follow-up #7).

`flagship_revenue_per_year` (4.7x at 10x data) and `g_revenue_by_brand`
(6.2x) are both lineitem-side join+agg shapes whose scan+agg floor is
bounded by `pricing_summary` (0.8 s at sf1) — so the excess is in the
join tier. This runner isolates the components at one SF dir:

* scan floor: the exact column set each query reads, count only
* join tier: join + count (no aggregation arithmetic)
* full query, as registered
* full query with autoBroadcastJoinThreshold=-1 (forces the shuffle
  join AQE would pick on a cluster whose dims outgrow the threshold)

Usage: python tools/diag_hotjoin.py <sf_dir>
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from project_graphdb_spark import get_spark, workload  # noqa: E402
from project_graphdb_spark.io.tables import load_table  # noqa: E402


def timed(label, thunk, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = thunk()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:55s} {best:8.3f}s  ({out})")
    return best


def joins_in(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    kinds = re.findall(
        r"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin)", plan
    )
    return "+".join(kinds) or "none"


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark(app_name="diag-hotjoin")
    workload._ensure_loaded()

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")

    li3 = li.select("l_orderkey", "l_extendedprice", "l_discount")
    ok = orders.select("o_orderkey", "o_orderdate")

    timed("lineitem 3-col scan", lambda: li3.count())
    timed("orders 2-col scan", lambda: ok.count())
    j = li3.join(ok, li3.l_orderkey == ok.o_orderkey)
    timed(f"join only [{joins_in(j)}]", lambda: j.count())
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)")
           - F.col("l_discount").cast("decimal(18,2)"))
    )
    full = (
        j.groupBy(F.year("o_orderdate").alias("y"))
        .agg(F.sum(rev).cast("double").alias("r"))
    )
    timed("join+decimal agg (flagship core)", lambda: full.count())

    fn = workload.REGISTRY["flagship_revenue_per_year"].fn
    timed("flagship_revenue_per_year (registered)", lambda: fn(spark, sf_dir).count())

    # force the shuffle-join alternative
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    j2 = li3.join(ok, li3.l_orderkey == ok.o_orderkey)
    timed(f"join only, no broadcast [{joins_in(j2)}]", lambda: j2.count())
    timed(
        "flagship, no broadcast", lambda: fn(spark, sf_dir).count()
    )
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    # decimal vs double aggregation arithmetic on the joined frame
    rev_d = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    full_d = (
        j.groupBy(F.year("o_orderdate").alias("y"))
        .agg(F.sum(rev_d).alias("r"))
    )
    timed("join+DOUBLE agg (precision-unsafe variant)", lambda: full_d.count())

    gfn = workload.REGISTRY["g_revenue_by_brand"].fn
    timed("g_revenue_by_brand (registered)", lambda: gfn(spark, sf_dir).count())
    print("g_revenue_by_brand joins:", joins_in(gfn(spark, sf_dir)))

    spark.stop()


if __name__ == "__main__":
    main()
