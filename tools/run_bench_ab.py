"""Interleaved bench A/B between two pinned checkouts (VERDICT r10 ask #1).

BENCH_r10's 14 headline medians were uniformly 1.2-1.6x slower than
BENCH_r09's, including queries whose implementation did not change —
either host variance at driver-run time, the r10 name-sorted execution
order (4fa18b3), or a real code regression. This harness decides:
run ``bench.py`` from a worktree pinned at the r9 bench commit and one
pinned at the r10 bench commit, ALTERNATING (r9, r10, r9, r10, ...),
each run a fresh process/JVM, same idle host, same hour. If the two
code states agree with each other now, the BENCH_r10 artifact's shift
was host state, and the same-code spread across reps IS the measured
noise model the verdict asked for.

Usage: python tools/run_bench_ab.py <dirA> <dirB> [reps] [--json out]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench(workdir: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ][-1]
    parsed = json.loads(line)
    parsed["_wall"] = round(time.time() - t0, 1)
    return parsed


def main() -> None:
    raw = sys.argv[1:]
    out_path = None
    if "--json" in raw:
        i = raw.index("--json")
        if i + 1 >= len(raw):
            raise SystemExit("--json needs an output path")
        out_path = raw[i + 1]
        del raw[i : i + 2]
    args = [a for a in raw if not a.startswith("--")]
    dir_a, dir_b = args[0], args[1]
    reps = int(args[2]) if len(args) > 2 else 3
    runs: list[dict] = []
    for i in range(reps):
        for tag, d in (("A", dir_a), ("B", dir_b)):
            r = run_bench(d)
            rec = {
                "rep": i,
                "side": tag,
                "dir": d,
                "total": r["value"],
                "queries": r["queries"],
                "wall": r["_wall"],
            }
            runs.append(rec)
            print(json.dumps({k: rec[k] for k in ("rep", "side", "total", "wall")}))
            sys.stdout.flush()
    summary = {
        "A": {"dir": dir_a, "totals": [r["total"] for r in runs if r["side"] == "A"]},
        "B": {"dir": dir_b, "totals": [r["total"] for r in runs if r["side"] == "B"]},
        "runs": runs,
    }
    print(json.dumps({k: summary[k]["totals"] for k in ("A", "B")}))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
