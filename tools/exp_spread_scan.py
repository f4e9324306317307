"""Experiment: does spreading a single-row-group fact scan across cores
win at sf0.1? (guide SS2.5: unsplittable input -> repartition after read)

Decomposes the headline heavyweights:
  - build   : fn(spark, sf_dir) wall time (plan construction, no action)
  - scan    : noop of the pruned fact scan alone
  - base    : noop of the query as declared
  - spread  : noop of the same query with repartition(defaultParallelism)
              inserted right after the fact scan

Reps alternate base/spread so host drift cancels. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from project_graphdb_spark import get_spark  # noqa: E402
from project_graphdb_spark.io.tables import load_table  # noqa: E402
from project_graphdb_spark.operators.exact import (  # noqa: E402
    dec,
    exact_avg,
    exact_sum,
    revenue_expr,
)
from project_graphdb_spark.spark_util import materialize  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "5"))


def pricing(spark, li):
    charge = revenue_expr().cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,2)") + dec("l_tax")
    )
    return (
        li.filter(
            F.col("l_shipdate")
            <= F.lit("2001-09-02 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", "sum_qty"),
            exact_sum("l_extendedprice", "sum_base_price"),
            F.sum(revenue_expr()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            exact_avg("l_quantity", "avg_qty"),
            exact_avg("l_extendedprice", "avg_price"),
            exact_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def flagship(spark, li):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = li.select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy("order_year")
    )


def main() -> None:
    spark = get_spark(app_name="exp_spread_scan")
    n = spark.sparkContext.defaultParallelism
    li_plain = load_table(spark, SF_DIR, "lineitem")
    li_spread = li_plain.repartition(n)

    shapes = {
        "pricing_summary": pricing,
        "flagship_revenue_per_year": flagship,
    }

    out: dict = {"parallelism": n, "reps": REPS, "sf_dir": SF_DIR}

    # scan-only floor
    scan_cols = li_plain.select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    )
    materialize(scan_cols)  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        materialize(scan_cols)
        ts.append(time.perf_counter() - t0)
    out["scan_only_sec"] = round(statistics.median(ts), 4)

    for name, build in shapes.items():
        spark.sparkContext.setJobDescription(f"exp:{name}")
        # build-time probe
        t0 = time.perf_counter()
        df_base = build(spark, li_plain)
        build_sec = time.perf_counter() - t0
        df_spread = build(spark, li_spread)
        # warm both
        materialize(df_base)
        materialize(df_spread)
        base_ts, spread_ts = [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            materialize(build(spark, li_plain))
            base_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            materialize(build(spark, li_spread))
            spread_ts.append(time.perf_counter() - t0)
        out[name] = {
            "build_sec": round(build_sec, 4),
            "base": [round(t, 4) for t in base_ts],
            "spread": [round(t, 4) for t in spread_ts],
            "base_med": round(statistics.median(base_ts), 4),
            "spread_med": round(statistics.median(spread_ts), 4),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
