"""Cold-session simhash aggregate A/B (r14, VERDICT r13 ask #6).

The 64-sum simhash signature aggregate generates a ~1 MB whole-stage
method whose JIT warmup made single-pass cold readings run 2-5x steady
state (r13 lesson). The packed shape halves the aggregate buffer count
(32 two-lane SWAR sums). The quantity under test is the FIRST
execution in a fresh process (what a driver correctness run pays), so
each leg is a fresh process timing run 1 (cold) and run 2 (steady) of
dedup_simhash, alternating shapes.

Usage: python tools/exp_simhash_cold_ab.py <sf_dir> [reps] [--json out]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from project_graphdb_spark import get_spark, workload
workload.queries()
from project_graphdb_spark.spark_util import materialize
spark = get_spark(app_name="simhash_cold_ab")
fn = workload.REGISTRY["dedup_simhash"].fn
ts = []
for _ in range(2):
    t0 = time.perf_counter()
    materialize(fn(spark, {sf_dir!r}))
    ts.append(round(time.perf_counter() - t0, 3))
print("SIMHASH_AB_RESULT " + json.dumps({{"cold": ts[0], "steady": ts[1]}}))
spark.stop()
"""


def run_leg(sf_dir: str, shape: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SIMHASH_AGG"] = shape
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO, sf_dir=sf_dir)],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [
        ln
        for ln in out.stdout.splitlines()
        if ln.startswith("SIMHASH_AB_RESULT ")
    ][-1]
    return json.loads(line[len("SIMHASH_AB_RESULT "):])


def main() -> None:
    raw = sys.argv[1:]
    out_path = None
    if "--json" in raw:
        i = raw.index("--json")
        out_path = raw[i + 1]
        del raw[i : i + 2]
    sf_dir = raw[0]
    reps = int(raw[1]) if len(raw) > 1 else 3
    results = {"wide": [], "packed": []}
    for rep in range(reps):
        for shape in ("wide", "packed"):
            r = run_leg(sf_dir, shape)
            results[shape].append(r)
            print(f"rep {rep} {shape}: cold={r['cold']} steady={r['steady']}")
            sys.stdout.flush()
    payload = {
        "sf_dir": sf_dir,
        "protocol": "fresh process per leg, alternating shapes; run 1 "
        "= cold (JIT tail included), run 2 = steady",
        "results": results,
        "medians": {
            s: {
                k: statistics.median(x[k] for x in legs)
                for k in ("cold", "steady")
            }
            for s, legs in results.items()
        },
    }
    print(json.dumps(payload["medians"]))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
