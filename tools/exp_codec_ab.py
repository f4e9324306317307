"""Shuffle-codec A/B (lz4 default vs zstd) on a shuffle-heavy query.

Usage: python tools/exp_codec_ab.py <sf_dir> <codec> <query> [reps]

Fresh-session leg: builds a session with spark.io.compression.codec
pinned, runs one untimed warmup then `reps` timed passes of the named
registered query (noop sink), prints one JSON line. Interleave legs
externally (lz4, zstd, lz4, zstd) so host drift cancels; codecs must
not change inside a session (shuffle files would mix codecs).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_graphdb_spark import get_spark, workload  # noqa: E402
from project_graphdb_spark.spark_util import materialize  # noqa: E402


def main() -> None:
    sf_dir, codec, qname = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = get_spark(
        app_name=f"codec_ab_{codec}",
        extra_conf={"spark.io.compression.codec": codec},
    )
    fn = workload.queries()[qname]
    spark.sparkContext.setJobDescription(f"codec_ab:{codec}:{qname}")
    materialize(fn(spark, sf_dir))  # warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        ts.append(round(time.perf_counter() - t0, 2))
    print(
        json.dumps(
            {
                "codec": codec,
                "query": qname,
                "sf_dir": sf_dir,
                "reps": ts,
                "med": statistics.median(ts),
            }
        )
    )
    from project_graphdb_spark.graph.algorithms import release_edge_layouts

    release_edge_layouts(spark)
    spark.stop()


if __name__ == "__main__":
    main()
