"""Measure MinHash+LSH recall/agreement where candidate volume is
non-trivial (sf0.1 / sf1), for SCALE.md's tracking table.

The CI gate asserts cluster-pair agreement >= 0.95 at sf0.01
(tests/test_llm_data_ops.py); this runner produces the same number at
the stress scales, plus the candidate-volume telemetry that shows the
banding is doing its job (candidates << all-pairs).

Usage: python tools/run_lsh_agreement.py <sf_dir> [--json out.json]
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_graphdb_spark import get_spark  # noqa: E402


def same_cluster_pairs(rows) -> set:
    byc: dict = {}
    for r in rows:
        byc.setdefault(r.cluster_id, []).append(r.doc_id)
    return {
        p
        for ids in byc.values()
        for p in itertools.combinations(sorted(ids), 2)
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    from project_graphdb_spark.io.tables import load_table
    from project_graphdb_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _shingle_arrays_persisted,
        dedup_clusters,
        dedup_clusters_lsh,
        lsh_candidate_pairs,
        lsh_params,
        lsh_verified_pairs,
        minhash_signature_arrays,
    )

    n_docs = load_table(spark, sf_dir, "documents").count()
    bands, rows = lsh_params(JACCARD_THRESHOLD)

    t0 = time.time()
    arrs = _shingle_arrays_persisted(spark, sf_dir)
    sig = minhash_signature_arrays(arrs)
    n_candidates = lsh_candidate_pairs(sig, bands=bands).count()
    n_verified = lsh_verified_pairs(spark, sf_dir).count()
    t_lsh = time.time() - t0

    t0 = time.time()
    lsh_pairs = same_cluster_pairs(dedup_clusters_lsh(spark, sf_dir).collect())
    t_clusters_lsh = time.time() - t0

    t0 = time.time()
    exact_pairs = same_cluster_pairs(dedup_clusters(spark, sf_dir).collect())
    t_clusters_exact = time.time() - t0

    union = exact_pairs | lsh_pairs
    agreement = len(exact_pairs & lsh_pairs) / len(union) if union else 1.0
    all_pairs = n_docs * (n_docs - 1) // 2
    result = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "bands": bands,
        "rows_per_band": rows,
        "n_candidate_pairs": n_candidates,
        "n_verified_pairs": n_verified,
        "all_pairs": all_pairs,
        "candidate_frac_of_allpairs": round(n_candidates / all_pairs, 8),
        "n_exact_cluster_pairs": len(exact_pairs),
        "n_lsh_cluster_pairs": len(lsh_pairs),
        "cluster_pair_agreement": round(agreement, 4),
        "sec_lsh_pipeline": round(t_lsh, 1),
        "sec_clusters_lsh": round(t_clusters_lsh, 1),
        "sec_clusters_exact": round(t_clusters_exact, 1),
    }
    print(json.dumps(result))
    # paste-ready SCALE.md row (the measured-agreement table) so the
    # doc cannot silently stale when lsh_params change: refresh with
    #   python tools/run_lsh_agreement.py <sf_dir>
    # and replace the matching row.
    print(
        "| SCALE.md row | `{sf}` | {n} | {b}×{r} | {cand:,} "
        "({frac:.1e} of all-pairs) | {ver:,} | {agr:.3f} |".format(
            sf=os.path.basename(sf_dir.rstrip("/")),
            n=n_docs,
            b=bands,
            r=rows,
            cand=n_candidates,
            frac=n_candidates / all_pairs,
            ver=n_verified,
            agr=agreement,
        )
    )
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
