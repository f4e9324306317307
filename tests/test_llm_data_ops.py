"""Semantic tests for the approximate (no-oracle) LLM-data operators:
the exact operators are oracle-checked; here we assert the approximate
paths agree with their exact counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_graphdb_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from project_graphdb_spark.operators.similarity import (
    ann_cosine_top10,
    ann_ivf_top10,
)


def test_minhash_lsh_recall(spark, sf_dir):
    """LSH candidates must recover the high-jaccard pairs the exact
    operator finds (64 perms / 16 bands ⇒ ~100% recall at j≥0.8)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.8)
        .collect()
    }
    approx = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert exact, "test data should contain planted near-duplicates"
    missed = exact - approx
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
    # and LSH never invents pairs the verify step doesn't confirm
    exact_all = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert approx <= exact_all


def test_simhash_finds_planted_near_dups(spark, sf_dir):
    """Planted near-identical docs should collide under simhash."""
    pairs = dedup_simhash(spark, sf_dir)
    rows = pairs.collect()
    assert all(r.hamming <= 6 for r in rows)
    # near-dup docs by jaccard>=0.9 are mostly simhash-close as well
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.9)
        .collect()
    }
    got = {(r.doc_a, r.doc_b) for r in rows}
    if exact:
        assert len(got & exact) >= len(exact) // 2


def test_simhash_canonical_bucket_emits_each_pair_once(spark, sf_dir):
    """r13: candidate dedup moved from a `.distinct()` over the
    bucket-multiplied candidate set (a pair at hamming h matches in
    C(8-h,2) of the 28 chunk-pair buckets — 28x duplication for exact
    dups) to a filter keeping only the FIRST intact chunk pair,
    computed from the XOR of the two signatures riding the join row.
    Each pair must surface exactly once WITHOUT any aggregate above
    the bucket join."""
    import re
    pairs = dedup_simhash(spark, sf_dir)
    dup = (
        pairs.groupBy("doc_a", "doc_b")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    plan = pairs._sc._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    final = plan.split("== Initial Plan ==")[0]
    # the only aggregates are the two signature 64-bit-sum pairs
    # (partial+final per join side); the candidate set itself is never
    # re-aggregated. Count detail headers only — the formatted plan
    # prints every node twice (tree + detail section).
    n_agg = len(re.findall(r"\(\d+\) HashAggregate", final))
    assert n_agg <= 4, final


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    brute = [r.vec_id for r in ann_cosine_top10(spark, sf_dir).collect()]
    ivf = [r.vec_id for r in ann_ivf_top10(spark, sf_dir).collect()]
    # trained (Lloyd) quantizer probing 3/8 clusters: ≥7 of true top-10
    assert len(set(brute) & set(ivf)) >= 7


def test_knn_join_ivf_recall_vs_brute(spark, sf_dir):
    """The IVF-blocked kNN join must recover most of the exact tier's
    (qid, neighbor) pairs — same recall contract as ann_ivf_top10 vs
    ann_cosine_top10 — and never rank by anything but exact cosine
    (cos_sim values of recovered pairs match the exact tier)."""
    from project_graphdb_spark.operators.similarity import knn_join_top3
    from project_graphdb_spark.operators.similarity_scale import (
        knn_join_top3_ivf,
    )

    exact = {
        (r.qid, r.vec_id): r.cos_sim
        for r in knn_join_top3(spark, sf_dir).collect()
    }
    ivf = {
        (r.qid, r.vec_id): r.cos_sim
        for r in knn_join_top3_ivf(spark, sf_dir).collect()
    }
    assert exact
    hit = set(exact) & set(ivf)
    recall = len(hit) / len(exact)
    assert recall >= 0.7, f"knn-join IVF recall {recall:.3f} < 0.7"
    for k in hit:  # survivors score with the same exact cosine
        assert ivf[k] == exact[k]


def test_ivf_quantizer_deterministic(spark, sf_dir):
    """Re-training from scratch reproduces identical centroids (seeded
    init + 6-dp rounded means), so the ANN output is stable."""
    from project_graphdb_spark.operators.similarity import _IVF_CACHE

    a = [tuple(r) for r in ann_ivf_top10(spark, sf_dir).collect()]
    _IVF_CACHE.clear()
    b = [tuple(r) for r in ann_ivf_top10(spark, sf_dir).collect()]
    assert a == b


def test_pandas_cosine_matches_jvm_path(spark, sf_dir):
    from pyspark.sql import functions as F
    from project_graphdb_spark.operators.similarity import (
        _emb,
        cosine,
        cosine_scores_pandas,
    )

    emb = _emb(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["v"]
    jvm = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(
                cosine(F.col("v"), F.array(*[F.lit(x) for x in qv])), 6
            ).alias("cos_sim"),
        )
    )
    arrow = cosine_scores_pandas(
        emb.filter(F.col("vec_id") != 0), qv
    )
    got = {r["vec_id"]: r["cos_sim"] for r in arrow.collect()}
    want = {r["vec_id"]: r["cos_sim"] for r in jvm.collect()}
    assert got == want


def test_stratified_sample_fractions_and_determinism(spark):
    from project_graphdb_spark.operators.text import (
        SAMPLE_FRACTIONS,
        doc_stratified_sample,
    )

    sf = "/root/testdata/sf0.01"
    docs = (
        doc_stratified_sample(spark, sf)
        .groupBy("lang")
        .count()
        .collect()
    )
    from project_graphdb_spark.io.tables import load_table

    totals = {
        r["lang"]: r["count"]
        for r in load_table(spark, sf, "documents")
        .groupBy("lang")
        .count()
        .collect()
    }
    for r in docs:
        frac = r["count"] / totals[r["lang"]]
        want = SAMPLE_FRACTIONS[r["lang"]]
        assert abs(frac - want) <= 0.15, (r["lang"], frac, want)
    # full-keep strata are exactly complete
    kept = {r["lang"]: r["count"] for r in docs}
    for lang, f in SAMPLE_FRACTIONS.items():
        if f == 1.0:
            assert kept[lang] == totals[lang]
    # seeded: two runs identical
    a = [r["doc_id"] for r in doc_stratified_sample(spark, sf).collect()]
    b = [r["doc_id"] for r in doc_stratified_sample(spark, sf).collect()]
    assert a == b


def test_minhash_signature_paths_agree(spark):
    """All three signature formulations are value-identical: the
    Arrow/numpy kernel (the operator path dedup_minhash_lsh rides on),
    the pure-JVM narrow array form, and the exploded groupBy one."""
    from project_graphdb_spark.operators.dedup import (
        _shingle_arrays_persisted,
        minhash_signature_arrays,
        minhash_signature_arrays_jvm,
        minhash_signatures,
    )

    sf = "/root/testdata/sf0.001"
    arrs = _shingle_arrays_persisted(spark, sf)
    sh = arrs.select("doc_id", F.explode("sh_arr").alias("shingle"))
    arrow = {r["doc_id"]: tuple(r)[1:] for r in minhash_signature_arrays(arrs).collect()}
    narrow = {r["doc_id"]: tuple(r)[1:] for r in minhash_signature_arrays_jvm(arrs).collect()}
    grouped = {r["doc_id"]: tuple(r)[1:] for r in minhash_signatures(sh).collect()}
    assert arrow == grouped
    assert narrow == grouped


def test_embedding_blocked_recall_vs_brute(spark, oracle_sf_dir):
    """The IVF-centroid blocked near-dup operator must recover >=95% of
    the brute-force pairs at sf0.01 (the brute scan is its recall
    oracle), and never invent a pair — verification is exact cosine."""
    from project_graphdb_spark.operators.similarity import (
        embedding_near_dup_blocked,
        embedding_near_dup_pairs,
    )

    brute = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(spark, oracle_sf_dir).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_blocked(spark, oracle_sf_dir).collect()
    }
    assert brute, "sf0.01 embeddings should contain near-dup pairs"
    assert blocked <= brute  # exact verify: no false positives
    recall = len(blocked & brute) / len(brute)
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95"


def test_embedding_blocked_plan_shape(spark, sf_dir):
    """No cartesian / broadcast-nested-loop anywhere: candidates come
    from an equi-join on centroid id (the property that lets this run
    at 100 TB while the brute tier cannot)."""
    from project_graphdb_spark.operators.similarity import (
        embedding_near_dup_blocked,
    )

    df = embedding_near_dup_blocked(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_params_default_instantiation():
    """The module constants (64 perms, 16 bands of 4) are exactly what
    the s-curve derivation picks for the default 0.5 threshold."""
    from project_graphdb_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        LSH_BANDS,
        NUM_PERM,
        lsh_params,
    )

    bands, rows = lsh_params(JACCARD_THRESHOLD)
    assert (bands, rows) == (LSH_BANDS, NUM_PERM // LSH_BANDS) == (16, 4)


def test_lsh_params_scurve_properties():
    """bands*rows == num_perm always; higher thresholds need more rows
    per band (steeper curve, fewer false candidates); out-of-range
    thresholds are rejected."""
    import pytest

    from project_graphdb_spark.operators.dedup import lsh_params

    prev_rows = 0
    for t in (0.1, 0.3, 0.5, 0.7, 0.9):
        bands, rows = lsh_params(t)
        assert bands * rows == 64
        assert rows >= prev_rows
        prev_rows = rows
        # the chosen pair's inflection is the closest among divisors
        infl = (1.0 / bands) ** (1.0 / rows)
        for r2 in (1, 2, 4, 8, 16, 32, 64):
            b2 = 64 // r2
            assert abs(infl - t) <= abs((1.0 / b2) ** (1.0 / r2) - t) + 1e-12
    for bad in (0.0, 1.0, -0.5, 2.0):
        with pytest.raises(ValueError):
            lsh_params(bad)


def test_probe_cids_literal_vs_arrow_agree(spark, sf_dir):
    """The Arrow matmul path must return exactly what the literal
    expression path returns — forced here with k=20 > LITERAL_K_MAX
    trained centroids, so the dispatch cutoff never hides the Arrow
    branch from the suite (at suite scales k<=15 and only the literal
    path would otherwise run)."""
    from project_graphdb_spark.operators.similarity import (
        LITERAL_K_MAX,
        _emb,
        _probe_cids,
        _probe_cids_arrow,
        lloyd_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = lloyd_centroids(spark, emb, k=20, iters=1)
    assert len(cents) == 20 > LITERAL_K_MAX
    lit = {
        r["vec_id"]: list(r["p"])
        for r in emb.select("vec_id", _probe_cids(cents, 5).alias("p")).collect()
    }
    arw = {
        r["vec_id"]: list(r["p"])
        for r in emb.select(
            "vec_id", _probe_cids_arrow(cents, 5).alias("p")
        ).collect()
    }
    assert lit == arw


def test_probe_cids_arrow_degenerate_vectors(spark):
    """Zero-norm vectors: under ANSI mode the literal expression path
    raises DIVIDE_BY_ZERO (cosine divides by the norm), so graceful
    handling is an Arrow-path-only property: the norm guard keeps the
    division finite and the row ranks deterministically by ascending
    cid instead of killing the job. Healthy rows in the same batch are
    unaffected."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ArithmeticException

    from project_graphdb_spark.operators.similarity import (
        _probe_cids,
        _probe_cids_arrow,
    )

    cents = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [3.0, 4.0])], "vec_id int, v array<double>"
    )
    arw = {
        r["vec_id"]: list(r["p"])
        for r in df.select(
            "vec_id", _probe_cids_arrow(cents, 3).alias("p")
        ).collect()
    }
    assert arw[0] == [0, 1, 2]  # guarded: ties -> ascending cid
    assert arw[1] == [2, 1, 0]  # healthy row ranked normally
    with pytest.raises((ArithmeticException, Py4JJavaError)):
        df.select("vec_id", _probe_cids(cents, 3).alias("p")).collect()


def test_dedup_clusters_lsh_agreement(spark, oracle_sf_dir):
    """The LSH-fed clustering (the 100 TB composition) must reproduce
    the exact-fed clustering's same-cluster pair relation at >=0.95
    Jaccard agreement (observed: 1.0 at sf0.001 and sf0.01 — near-dup
    clusters are near-cliques, so LSH recall carries over)."""
    import itertools

    from project_graphdb_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_lsh,
    )

    def same_cluster_pairs(rows):
        byc: dict = {}
        for r in rows:
            byc.setdefault(r.cluster_id, []).append(r.doc_id)
        return {
            p
            for ids in byc.values()
            for p in itertools.combinations(sorted(ids), 2)
        }

    exact = same_cluster_pairs(dedup_clusters(spark, oracle_sf_dir).collect())
    lsh = same_cluster_pairs(
        dedup_clusters_lsh(spark, oracle_sf_dir).collect()
    )
    assert exact, "sf0.01 should contain duplicate clusters"
    agreement = len(exact & lsh) / len(exact | lsh)
    assert agreement >= 0.95, f"cluster-pair agreement {agreement:.3f}"


def test_lsh_pairs_plan_no_allpairs_join(spark, sf_dir):
    """The LSH pair pipeline (which feeds dedup_clusters_lsh) must
    never materialize the co-shingle self-join: no exploded `shingle`
    column and no cartesian anywhere in the plan — band-bucket
    collisions are the only pair-shaped frames."""
    from project_graphdb_spark.operators.dedup import lsh_verified_pairs

    df = lsh_verified_pairs(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "shingle#" not in plan  # the exact tier's exploded column
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_lsh_strict_recall(spark, sf_dir):
    """The 0.8-threshold variant: lsh_params(0.8) -> 8 bands of 8 rows
    (s-curve inflection 0.771). Collision probability at j=0.9 is
    1-(1-0.9^8)^8 ~ 0.99, so the strict operator must recover >=90% of
    exact pairs at j>=0.9 (observed: 1.0), and exact verification means
    it never emits a pair below the 0.8 gate."""
    from project_graphdb_spark.operators.dedup import (
        STRICT_THRESHOLD,
        dedup_minhash_lsh_strict,
        dedup_ngram_jaccard,
        lsh_params,
    )

    assert lsh_params(STRICT_THRESHOLD) == (8, 8)
    exact9 = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.9)
        .collect()
    }
    exact8 = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= STRICT_THRESHOLD)
        .collect()
    }
    strict = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh_strict(spark, sf_dir).collect()
    }
    assert exact9, "test data should contain high-similarity pairs"
    assert strict <= exact8  # exact verify: no false positives
    recall = len(strict & exact9) / len(exact9)
    assert recall >= 0.9, f"strict recall@0.9 = {recall:.3f}"


def test_blocked_candidate_stats(spark, sf_dir):
    """Telemetry for the blocked near-dup path: measured candidate
    volume is positive, bounded by all-pairs, and the nprobe knob
    monotonically widens the candidate set."""
    from project_graphdb_spark.operators.similarity import (
        blocked_candidate_stats,
    )

    s = blocked_candidate_stats(spark, sf_dir)
    assert s["n_vectors"] > 0 and s["k_centroids"] >= 8
    assert 0 < s["candidate_pairs"] <= s["all_pairs"]
    assert "estimated" not in s  # exact by default
    narrow = blocked_candidate_stats(spark, sf_dir, nprobe=1)
    assert narrow["candidate_pairs"] <= s["candidate_pairs"]


def test_blocked_candidate_stats_sampled_estimate(spark, oracle_sf_dir):
    """The hash-sampled telemetry mode (big-SF path): the 1/m a-side
    sample produces an unbiased estimate — at sf0.01 (500 vectors,
    m=4) it must land within 40% of the exact count — and reports its
    sampling metadata."""
    from project_graphdb_spark.operators.similarity import (
        blocked_candidate_stats,
    )

    exact = blocked_candidate_stats(spark, oracle_sf_dir)
    est = blocked_candidate_stats(spark, oracle_sf_dir, sample_mod=4)
    assert est["estimated"] and est["sample_mod"] == 4
    assert est["candidate_pairs"] == est["sampled_pairs"] * 4
    ratio = est["candidate_pairs"] / max(exact["candidate_pairs"], 1)
    assert 0.6 <= ratio <= 1.4, (
        est["candidate_pairs"],
        exact["candidate_pairs"],
    )


def test_shingle_cache_self_heals_after_foreign_unpersist(spark, sf_dir):
    """Both bench runners sweep ``sc.getPersistentRDDs()*.unpersist()``
    between queries. That kills the memoized shingle frame's blocks but
    leaves its CacheManager entry pointing at a dead builder, after
    which every plan reference recomputes the shingle scan uncached
    (measured 5 s -> 86 s at sf1). The memo must detect the foreign
    eviction and rebuild."""
    from project_graphdb_spark.operators import dedup as D

    D.clear_shingle_cache()
    df1 = D._shingle_arrays_persisted(spark, sf_dir)
    n1 = df1.count()
    key = (id(spark), sf_dir, "shingles")
    _, ids = D._PERSIST_CACHE[key]
    assert ids and ids <= D._live_persistent_ids(spark)

    # the foreign sweep (exactly what the bench runners do)
    from project_graphdb_spark.spark_util import free_all_persistent

    free_all_persistent(spark, run_jvm_gc=False)
    assert not (ids & D._live_persistent_ids(spark))

    df2 = D._shingle_arrays_persisted(spark, sf_dir)
    _, ids2 = D._PERSIST_CACHE[key]
    # a fresh, genuinely-live cache entry backs the returned frame
    assert ids2 and ids2 <= D._live_persistent_ids(spark)
    assert df2.count() == n1
    D.clear_shingle_cache()


def test_keep_best_decision_semantics(spark, oracle_sf_dir):
    """Every cluster keeps exactly one member and that member has the
    cluster's max quality (ties to lowest doc_id); singletons keep."""
    from project_graphdb_spark.operators.dedup import dedup_keep_best

    rows = dedup_keep_best(spark, oracle_sf_dir).collect()
    byc: dict = {}
    for r in rows:
        byc.setdefault(r.cluster_id, []).append(r)
    assert any(len(v) > 1 for v in byc.values()), "no dup clusters?"
    for members in byc.values():
        kept = [r for r in members if r.keep]
        assert len(kept) == 1
        best = max(
            members, key=lambda r: (r.quality_score, -r.doc_id)
        )
        assert kept[0].doc_id == best.doc_id
        if len(members) == 1:
            assert members[0].keep
            assert members[0].cluster_size == 1


def test_keep_best_lsh_agreement(spark, oracle_sf_dir):
    """The LSH-fed keep decision (the 100 TB composition) must agree
    with the exact-fed one on the kept set wherever LSH recall holds."""
    from project_graphdb_spark.operators.dedup import (
        dedup_keep_best,
        dedup_keep_best_lsh,
    )

    exact = {
        r.doc_id for r in dedup_keep_best(spark, oracle_sf_dir).collect()
        if r.keep
    }
    lsh = {
        r.doc_id
        for r in dedup_keep_best_lsh(spark, oracle_sf_dir).collect()
        if r.keep
    }
    agreement = len(exact & lsh) / len(exact | lsh)
    assert agreement >= 0.95, f"keep-set agreement {agreement:.3f}"


def test_winnow_finds_planted_near_dups(spark, oracle_sf_dir):
    """The winnowed-fingerprint overlap join recovers most of the
    exact-Jaccard near-dup pairs (winnowing guarantees any sufficiently
    long shared run yields shared selected fingerprints)."""
    from project_graphdb_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        dedup_ngram_jaccard,
        dedup_winnow,
    )

    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, oracle_sf_dir).collect()
        if r.jaccard >= JACCARD_THRESHOLD
    }
    winnow = {
        (r.doc_a, r.doc_b)
        for r in dedup_winnow(spark, oracle_sf_dir).collect()
    }
    assert exact, "sf0.01 should contain planted near-dups"
    recall = len(exact & winnow) / len(exact)
    assert recall >= 0.9, f"winnow recall {recall:.3f}"


def test_winnow_sels_short_and_empty_docs(spark):
    """Docs shorter than the gram size produce no fingerprints (and no
    crash); identical docs produce identical selections."""
    from project_graphdb_spark.operators.dedup import _winnow_sels

    docs = spark.createDataFrame(
        [
            (1, "a b"),  # < WINNOW_K tokens
            (2, ""),  # empty
            (3, "w x y z p q r s"),
            (4, "w x y z p q r s"),  # exact copy of 3
        ],
        ["doc_id", "text"],
    )
    rows = _winnow_sels(docs).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert 1 not in by_doc and 2 not in by_doc
    assert by_doc[3] == by_doc[4]
    assert len(by_doc[3]) >= 1


def test_incremental_winnow_flags_cross_parity_dups(spark, oracle_sf_dir):
    """Every flagged increment doc really shares >= MIN_SHARED winnowed
    fingerprints with its reported base match, and no base (even) doc
    appears on the increment side."""
    from project_graphdb_spark.operators.dedup import (
        dedup_incremental_winnow,
        dedup_winnow,
    )

    rows = dedup_incremental_winnow(spark, oracle_sf_dir).collect()
    assert rows, "planted near-dups should cross the parity split"
    assert all(r.doc_id % 2 == 1 for r in rows)
    assert all(r.first_base_match % 2 == 0 for r in rows)
    # consistency with the full-corpus winnow pairs: every flagged
    # (inc, base) relationship is also a dedup_winnow pair
    full = {
        (r.doc_a, r.doc_b)
        for r in dedup_winnow(spark, oracle_sf_dir).collect()
    }
    for r in rows:
        a, b = sorted((r.doc_id, r.first_base_match))
        assert (a, b) in full


def test_int8_quantization_error_bound(spark, sf_dir):
    """Symmetric absmax rounding guarantees max|x - q*s| <= s/2 (no
    clamp can bind: |x| <= absmax = 127*s, and floor(|x|/s + 0.5) <=
    127 exactly at the boundary)."""
    from project_graphdb_spark.operators.similarity_scale import (
        emb_quantize_int8,
    )

    rows = emb_quantize_int8(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_abs_err <= r.scale / 2 + 1e-12, r.vec_id
        assert r.mse <= (r.scale / 2) ** 2 + 1e-12, r.vec_id


def test_pq_recall_vs_brute_force(spark, oracle_sf_dir):
    """PQ ADC shortlist + exact rerank must recover >=0.85 of the
    brute-force cosine top-10 at sf0.01 — the synthetic vectors are
    random (no cluster structure, PQ's worst case), so this bound is
    set by shortlist depth: numpy-replicated recall at shortlist
    50/100/200 is 0.8/0.9/1.0."""
    from project_graphdb_spark.operators.similarity import ann_cosine_top10
    from project_graphdb_spark.operators.similarity_scale import ann_pq_top10

    exact = {r.vec_id for r in ann_cosine_top10(spark, oracle_sf_dir).collect()}
    approx = {r.vec_id for r in ann_pq_top10(spark, oracle_sf_dir).collect()}
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"PQ recall {recall:.2f} < 0.85"


def test_ivfpq_recall_vs_brute_force(spark, oracle_sf_dir):
    """The composed IVF+PQ tier loses candidates two ways — cluster
    pruning (true neighbors outside the probed nprobe/k clusters) and
    ADC distortion (true neighbors pushed off the shortlist) — so its
    bound is the product regime of the two single-index bounds: IVF
    alone measures >=0.7 here, PQ alone >=0.85 at shortlist 100. On
    the sf0.01 corpus the pruned ADC scan actually has FEWER
    distractors than full-corpus PQ, so >=0.7 is conservative."""
    from project_graphdb_spark.operators.similarity import ann_cosine_top10
    from project_graphdb_spark.operators.similarity_scale import (
        ann_ivfpq_top10,
    )

    exact = {r.vec_id for r in ann_cosine_top10(spark, oracle_sf_dir).collect()}
    approx = {r.vec_id for r in ann_ivfpq_top10(spark, oracle_sf_dir).collect()}
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"IVF+PQ recall {recall:.2f} < 0.7"


def test_ivfpq_shortlist_is_subset_of_probed_clusters(spark, oracle_sf_dir):
    """Every IVF+PQ result must come from a probed coarse cluster (the
    index scan may touch ONLY nprobe buckets — the property that makes
    the composed tier's I/O story multiplicative), and survivors score
    with exact cosine (values match the brute tier where ids agree)."""
    from project_graphdb_spark.operators.similarity_scale import (
        _ivfpq_codes,
        ann_ivfpq_top10,
    )

    rows = ann_ivfpq_top10(spark, oracle_sf_dir).collect()
    assert rows
    cid_of = {
        r["vec_id"]: r["cid"]
        for r in _ivfpq_codes(spark, oracle_sf_dir)
        .filter(F.col("vec_id").isin([r.vec_id for r in rows]))
        .collect()
    }
    # replicate the op's driver-side probe choice exactly
    from project_graphdb_spark.operators.similarity import (
        IVF_NPROBE,
        _emb,
        _ivf_centroids,
    )
    from project_graphdb_spark.operators.similarity_scale import (
        _unit_query_vec,
    )

    q = _unit_query_vec(_emb(spark, oracle_sf_dir))
    cents = _ivf_centroids(spark, oracle_sf_dir)

    def _cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = sum(x * x for x in a) ** 0.5 or 1.0
        db = sum(x * x for x in b) ** 0.5 or 1.0
        return num / (da * db)

    probed_cids = {
        cid
        for cid, _ in sorted(
            enumerate(cents), key=lambda c: (-_cos(c[1], q), c[0])
        )[:IVF_NPROBE]
    }
    assert {cid_of[r.vec_id] for r in rows} <= probed_cids
    brute = {r.vec_id: r.cos_sim for r in ann_cosine_top10(spark, oracle_sf_dir).collect()}
    for r in rows:
        if r.vec_id in brute:
            assert r.cos_sim == brute[r.vec_id]


def test_semantic_dedup_blocked_agreement(spark, oracle_sf_dir):
    """The blocked semantic-dedup tier must agree with the exact twin
    on >=95% of the dropped set at sf0.01, and must never drop a vector
    the exact tier keeps (candidates are a subset of all pairs and
    verification is exact cosine, so false drops are impossible by
    construction — asserted anyway)."""
    from project_graphdb_spark.operators.similarity_scale import (
        dedup_semantic,
        dedup_semantic_blocked,
    )

    exact_drop = {
        r.vec_id
        for r in dedup_semantic(spark, oracle_sf_dir).collect()
        if not r.keep
    }
    blocked_drop = {
        r.vec_id
        for r in dedup_semantic_blocked(spark, oracle_sf_dir).collect()
        if not r.keep
    }
    assert exact_drop, "sf0.01 embeddings should contain semantic dups"
    assert blocked_drop <= exact_drop  # no false drops
    recall = len(blocked_drop & exact_drop) / len(exact_drop)
    assert recall >= 0.95, f"dropped-set recall {recall:.3f} < 0.95"


def test_emb_ivf_assign_matches_trained_kernel_shape(spark, sf_dir):
    """The seeded-assignment query runs the production argmax kernel:
    every vector gets exactly one cid in [0, 8), seed vectors assign to
    themselves (cos=1 is the max), and the plan is join-free on the
    corpus side (literal centroids, narrow map)."""
    from project_graphdb_spark.operators.similarity_scale import (
        emb_ivf_assign,
    )

    df = emb_ivf_assign(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == len({r.vec_id for r in rows})
    assert all(0 <= r.cid < 8 for r in rows)
    self_assigned = {r.vec_id: r.cid for r in rows if r.vec_id < 8}
    assert self_assigned == {i: i for i in range(8)}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_dedup_winnow_fast_agreement(spark, oracle_sf_dir):
    """The token-hash-fold scale tier must agree with the
    oracle-checked md5 winnowing face on the flagged pair set
    (observed 0.96 at sf0.01 — selection positions differ by hash, the
    near-dup verdicts almost never do)."""
    from project_graphdb_spark import workload

    workload._ensure_loaded()
    fast = {
        (r["doc_a"], r["doc_b"])
        for r in workload.REGISTRY["dedup_winnow_fast"]
        .fn(spark, oracle_sf_dir)
        .collect()
    }
    md5f = {
        (r["doc_a"], r["doc_b"])
        for r in workload.REGISTRY["dedup_winnow"]
        .fn(spark, oracle_sf_dir)
        .collect()
    }
    union = fast | md5f
    agreement = len(fast & md5f) / len(union) if union else 1.0
    assert agreement >= 0.9, f"winnow fast-tier agreement {agreement:.3f}"


def test_label_confusion_empty_domain_short_circuits(spark):
    """r12 ADVICE fix: an empty label domain must return an empty typed
    frame, not die parsing `FROM VALUES  AS t(...)`."""
    from unittest import mock

    from project_graphdb_spark.operators import similarity as sim

    empty = spark.createDataFrame(
        [], "vec_id long, label int, v array<float>"
    )
    with mock.patch.object(sim, "_emb", return_value=empty):
        out = sim.emb_label_confusion_pairs(spark, "unused")
    assert out.columns == ["label_a", "label_b", "centroid_cos"]
    assert out.count() == 0


def test_dedup_winnow_key_modes_identical(spark, oracle_sf_dir, monkeypatch):
    """r12 (VERDICT r11 ask #7): the string pair-key (default — the
    int variant was measured and rejected, SCALE.md finding 33) and
    the int shape must produce identical pairs — conv(hex,16,10) is a
    bijection on the 8-hex-char fingerprint, so only the shuffled key
    WIDTH changes, never the join's equivalence classes."""
    from project_graphdb_spark.operators.dedup import dedup_winnow

    def pairs():
        return sorted(
            (r.doc_a, r.doc_b, r.n_shared)
            for r in dedup_winnow(spark, oracle_sf_dir).collect()
        )

    monkeypatch.setenv("SPARK_GRAFT_WINNOW_PAIR_KEY", "int")
    p_int = pairs()
    monkeypatch.setenv("SPARK_GRAFT_WINNOW_PAIR_KEY", "str")
    p_str = pairs()
    assert p_int == p_str
    assert p_int, "empty pair set proves nothing"


def test_simhash_packed_agg_identical(spark, sf_dir, monkeypatch):
    """r14 (VERDICT r13 ask #6): the 32-column two-lane SWAR aggregate
    must produce BIT-IDENTICAL signatures to the 64-column ±1 shape.
    The sign test is exact integer arithmetic (2*ones_i > n ⟺
    sum(±1) > 0), so any divergence is a lane-packing bug (carry,
    shift off-by-one, bit 60-63 hi-word routing)."""
    from project_graphdb_spark.io.tables import load_table
    from project_graphdb_spark.operators.dedup import simhash_signatures

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    monkeypatch.setenv("SPARK_GRAFT_SIMHASH_AGG", "wide")
    wide = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    monkeypatch.setenv("SPARK_GRAFT_SIMHASH_AGG", "packed")
    packed = {
        r.doc_id: r.simhash for r in simhash_signatures(docs).collect()
    }
    assert wide == packed
    assert len(wide) > 0
