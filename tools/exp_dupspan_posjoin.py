"""Same-session interleaved A/B: dup-span docfilter vs posjoin shape.

VERDICT r13 ask #5 protocol: one session, alternating shapes (the env
knob is read per call), calibration anchor interleaved, steady-state
medians. The measured consumer is doc_dup_span_profile — the family's
sf10 metric — plus one dup_span_scrub rep pair (the pipeline's heavy
stage).

Usage: python tools/exp_dupspan_posjoin.py <sf_dir> [reps] [--json out]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_graphdb_spark import get_spark  # noqa: E402
from project_graphdb_spark.calibration import CalibAnchor  # noqa: E402
from project_graphdb_spark.io.tables import load_table  # noqa: E402
from project_graphdb_spark.operators.corpus import (  # noqa: E402
    dup_span_profile,
    dup_span_scrub,
)
from project_graphdb_spark.spark_util import (  # noqa: E402
    free_all_persistent,
    materialize,
)


def main() -> None:
    raw = sys.argv[1:]
    out_path = None
    if "--json" in raw:
        i = raw.index("--json")
        out_path = raw[i + 1]
        del raw[i : i + 2]
    sf_dir = raw[0]
    reps = int(raw[1]) if len(raw) > 1 else 3
    spark = get_spark(app_name="dupspan_posjoin_ab")
    anchor = CalibAnchor(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(shape: str, fn) -> float:
        os.environ["SPARK_GRAFT_DUPSPAN_SHAPE"] = shape
        t0 = time.perf_counter()
        materialize(fn(docs))
        dt = time.perf_counter() - t0
        free_all_persistent(spark)
        return round(dt, 3)

    results: dict[str, dict[str, list[float]]] = {
        "profile": {"docfilter": [], "posjoin": []},
        "scrub": {"docfilter": [], "posjoin": []},
    }
    # warmup (JVM/codegen/parquet footers) — one untimed rep per shape
    run("docfilter", dup_span_profile)
    run("posjoin", dup_span_profile)
    for _ in range(reps):
        anchor.rep()
        for shape in ("docfilter", "posjoin"):
            results["profile"][shape].append(run(shape, dup_span_profile))
    for _ in range(max(1, reps - 1)):
        anchor.rep()
        for shape in ("docfilter", "posjoin"):
            results["scrub"][shape].append(run(shape, dup_span_scrub))
    payload = {
        "sf_dir": sf_dir,
        "reps": reps,
        **anchor.summary(),
        "results": results,
        "medians": {
            q: {s: statistics.median(ts) for s, ts in sides.items()}
            for q, sides in results.items()
        },
    }
    print(json.dumps(payload))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
