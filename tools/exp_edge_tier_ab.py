"""Edge-layout size-tier A/B (r14, VERDICT r13 ask #8).

The tier question is about a COLD single invocation: does the one-time
bucketed table write pay for itself within one run of the algorithm at
this data size? (In-session family sharing is a separate, already
measured story — finding 34.) So each leg is a fresh process running
ONE query ONCE with the layout forced via SPARK_GRAFT_PREGEL_EDGE_LAYOUT
(which bypasses the tier), alternating layouts so host drift lands on
both sides.

Usage:
  python tools/exp_edge_tier_ab.py <sf_dir> <q1,q2,...> [reps] [--json out]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from project_graphdb_spark import get_spark, workload
workload.queries()  # populate the registry
from project_graphdb_spark.spark_util import materialize
from project_graphdb_spark.graph.algorithms import (
    EDGE_LAYOUT_STATS, release_edge_layouts,
)
spark = get_spark(app_name="tier_ab")
fn = workload.REGISTRY[{name!r}].fn
t0 = time.perf_counter()
materialize(fn(spark, {sf_dir!r}))
dt = time.perf_counter() - t0
print("TIER_AB_RESULT " + json.dumps(
    {{"sec": round(dt, 3), "stats": dict(EDGE_LAYOUT_STATS)}}))
release_edge_layouts(spark)
spark.stop()
"""


def run_leg(name: str, sf_dir: str, layout: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_PREGEL_EDGE_LAYOUT"] = layout
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO, name=name, sf_dir=sf_dir)],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [
        ln for ln in out.stdout.splitlines() if ln.startswith("TIER_AB_RESULT ")
    ][-1]
    return json.loads(line[len("TIER_AB_RESULT "):])


def main() -> None:
    raw = sys.argv[1:]
    out_path = None
    if "--json" in raw:
        i = raw.index("--json")
        out_path = raw[i + 1]
        del raw[i : i + 2]
    sf_dir = raw[0]
    names = raw[1].split(",")
    reps = int(raw[2]) if len(raw) > 2 else 2
    results: dict[str, dict[str, list]] = {
        n: {"checkpoint": [], "bucketed": []} for n in names
    }
    for rep in range(reps):
        for name in names:
            for layout in ("checkpoint", "bucketed"):
                r = run_leg(name, sf_dir, layout)
                results[name][layout].append(r)
                print(
                    f"rep {rep} {name} {layout}: {r['sec']}s "
                    f"stats={r['stats']}"
                )
                sys.stdout.flush()
    payload = {
        "sf_dir": sf_dir,
        "protocol": "fresh-process cold single invocation per leg, "
        "alternating layouts (env bypasses the tier); the bucketed "
        "number INCLUDES its table write",
        "results": results,
        "medians": {
            n: {
                s: statistics.median(x["sec"] for x in legs)
                for s, legs in sides.items()
            }
            for n, sides in results.items()
        },
    }
    print(json.dumps(payload["medians"]))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
