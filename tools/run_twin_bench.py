"""Sketch-vs-exact twin measurement: wall time AND shuffle volume.

The sketch faces exist for their shuffle story (fixed-size mergeable
state instead of shuffling every distinct pair), so the claim is only
concrete with measured shuffle bytes beside the wall time. Runs each
named query once untimed (warm-up) and once timed, attributing the
timed run's stages via the UI REST API (the session enables the UI for
exactly this purpose) and summing their shuffle read+write bytes.

Also carries the Q21 ladder row (sole_late_supplier_orders): its
design claim is ONE l_orderkey exchange feeding both aggregation
levels and the final probe (reused exchange) — the script prints the
exchange/reuse counts scraped from the executed plan.

Usage: python tools/run_twin_bench.py <sf_dir> [--json out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_graphdb_spark import get_spark, workload  # noqa: E402
from project_graphdb_spark.spark_util import (  # noqa: E402
    free_all_persistent,
    materialize as _materialize,
)

TWINS = [
    ("ev_daily_active_users", "ev_daily_active_users_hll"),
    (
        "lineitem_quantity_percentiles",
        "lineitem_quantity_percentiles_approx",
    ),
]
LADDER = ["sole_late_supplier_orders"]


def _stages(ui: str, app_id: str) -> dict[int, dict]:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        return {s["stageId"]: s for s in json.load(r)}


def main() -> None:
    sf_dir = sys.argv[1]
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark(
        app_name="twin-bench", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    workload._ensure_loaded()

    results: dict[str, dict] = {}
    names = [n for pair in TWINS for n in pair] + LADDER
    if "--only" in sys.argv:  # shuffle-attribute any query, e.g. --only a,b
        names = sys.argv[sys.argv.index("--only") + 1].split(",")
        unknown = [n for n in names if n not in workload.REGISTRY]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    for name in names:
        fn = workload.REGISTRY[name].fn
        # shuffle bytes from the COLD run: a warm second run can reuse
        # the first's shuffle map outputs (stages show SKIPPED) and the
        # diff would under-count; shuffle volume itself is temperature-
        # independent. Wall time from the warm run, as everywhere else.
        before = set(_stages(ui, app_id))
        _materialize(fn(spark, sf_dir))
        after_cold = _stages(ui, app_id)
        new = [
            s for sid, s in after_cold.items() if sid not in before
        ]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = _materialize(df)
        dt = round(time.perf_counter() - t0, 3)
        sw = sum(s["shuffleWriteBytes"] for s in new)
        sr = sum(s["shuffleReadBytes"] for s in new)
        plan = df._jdf.queryExecution().executedPlan().toString()
        results[name] = {
            "sec": dt,
            "rows": n,
            "shuffle_write_bytes": sw,
            "shuffle_read_bytes": sr,
            "stages": len(new),
            "exchanges": len(re.findall(r"\bExchange hashpartitioning", plan)),
            "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        }
        print(f"{name:42s} {dt:8.3f}s  shufW {sw/1e6:10.2f} MB  "
              f"shufR {sr/1e6:10.2f} MB  {results[name]['exchanges']} exch "
              f"({results[name]['reused_exchanges']} reused)")
        free_all_persistent(spark)

    payload = {"sf_dir": sf_dir, "results": results}
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps({k: v["sec"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
