"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/capture_plans.py <outdir> [--only name1,name2] [--all]

Default set = the headline bench queries. --all captures every registered
query (slow: some builders run measurement jobs while building).
Writes one <query>.txt per query, plus a one-line-per-query audit summary
(exchange count, join strategies, python eval nodes, scan pushdown) to
<outdir>/_audit.tsv.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_graphdb_spark import get_spark  # noqa: E402
from project_graphdb_spark import workload  # noqa: E402


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit(plan: str) -> dict:
    # ReusedExchange lines echo the reused node's description; count
    # exchanges only on non-Reused lines (verify-skill r13 lesson).
    lines = [ln for ln in plan.splitlines() if "ReusedExchange" not in ln]
    body = "\n".join(lines)
    return {
        "exchanges": len(re.findall(r"^\s*[+:]?-?\s*\*?\(?\d*\)?\s*Exchange", body, re.M)),
        "smj": body.count("SortMergeJoin"),
        "bhj": body.count("BroadcastHashJoin"),
        "shj": body.count("ShuffledHashJoin"),
        "bnlj": body.count("BroadcastNestedLoopJoin"),
        "pyeval": body.count("BatchEvalPython")
        + body.count("ArrowEvalPython")
        + body.count("MapInPandas")
        + body.count("MapInArrow")
        + body.count("FlatMapGroupsInPandas"),
        "window_single": plan.count("Window") and "No Partition" in plan,
    }


def main() -> None:
    outdir = sys.argv[1]
    only: set[str] = set()
    use_all = "--all" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--only":
            only = set(sys.argv[i + 1].split(","))
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_plans")

    qs = workload.queries() if use_all else workload.headline_queries()
    if only:
        qs = {n: fn for n, fn in qs.items() if n in only}

    rows = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = plan_text(df)
        except Exception as exc:  # capture what we can, note the rest
            plan = f"ERROR building plan: {exc!r}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        a = audit(plan)
        rows.append((name, a))
        print(name, a, flush=True)
    with open(os.path.join(outdir, "_audit.tsv"), "w") as fh:
        fh.write("query\texchanges\tsmj\tbhj\tshj\tbnlj\tpyeval\n")
        for name, a in rows:
            fh.write(
                f"{name}\t{a['exchanges']}\t{a['smj']}\t{a['bhj']}"
                f"\t{a['shj']}\t{a['bnlj']}\t{a['pyeval']}\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
