"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline surface (SURVEY.md §2.E / BASELINE.json north
star): token counting, quality scoring, language-ID heuristics, document
fingerprinting. All of it is built-in Catalyst expressions — string and
regexp functions, no Python UDFs — so the hot path stays in whole-stage
codegen and scales linearly with executors at 100 TB.

Determinism: every metric is integer arithmetic (lengths, counts) with
double division only at the end, so results hash-match the DuckDB
oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.operators.text_fns import (  # noqa: F401
    MIX_A,
    MIX_M,
    QF_MAX_TOKENS,
    QF_MAX_TOP_TOKEN_FRAC,
    QF_MIN_DISTINCT_RATIO,
    QF_MIN_TOKENS,
    QUALITY_GATE_PRED_SQL,
    QUALITY_SCORE_SQL,
    mix32,
    mix32_sql,
    quality_ctes_from,
    quality_gate_stats,
    quality_score,
    sliding_grams,
    sliding_structs,
    tokens,
)
from project_graphdb_spark.workload import register

# NOTE: the pure expression helpers (tokens / sliding_* / quality_* /
# mix32*) live in text_fns.py so that dedup/corpus can import them at
# module level WITHOUT triggering this module's @register side effects
# — registry insertion order is load-bearing for the driver's sampled
# correctness window (see workload._ensure_loaded). They are re-exported
# here to keep this module's public surface unchanged.


# word-ish / number / punctuation chunks — a BPE-flavored pre-tokenizer
# (shared regex between Spark and the oracle; both use it verbatim)
_BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# minimal per-language marker-word sets for the n-gram/stopword
# heuristic language ID
_LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|in)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|est|dans)\b",
    "es": r"\b(el|la|los|y|es|en)\b",
}


@register(
    "doc_token_stats",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
           length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace_chars,
           CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+')) AS mean_token_len
    FROM documents ORDER BY doc_id
    """,
    description="token counting: whitespace + BPE-ish regex "
    "pre-tokenization (training-data pipeline op)",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_tokens = F.size(tokens("text")).cast("bigint")
    n_nonspace = F.length(F.regexp_replace("text", r"\s", "")).cast("bigint")
    return (
        docs.select(
            "doc_id",
            F.length("text").cast("bigint").alias("n_chars"),
            n_tokens.alias("n_tokens"),
            F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0))
            .cast("bigint")
            .alias("n_bpe_tokens"),
            n_nonspace.alias("n_nonspace_chars"),
            (n_nonspace.cast("double") / n_tokens).alias("mean_token_len"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_quality_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct,
             len(regexp_extract_all(text, '\\b(the|and|of|to|is|in|a)\\b')) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           """
    + QUALITY_SCORE_SQL
    + """ AS quality_score
    FROM t ORDER BY doc_id
    """,
    description="quality scoring: length/stopword/distinct ratios "
    "(training-data pipeline op)",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens("text")
    n_tokens = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = F.size(
        F.regexp_extract_all("text", F.lit(r"\b(the|and|of|to|is|in|a)\b"), 0)
    ).cast("bigint")
    distinct_ratio = n_distinct.cast("double") / n_tokens
    return (
        docs.select(
            "doc_id",
            distinct_ratio.alias("distinct_ratio"),
            (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
            quality_score("text").alias("quality_score"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_lang_id",
    oracle="""
    WITH hits AS (
      SELECT doc_id, lang AS labeled_lang,
             len(regexp_extract_all(text, '\\b(the|and|of|to|is|in)\\b')) AS en_hits,
             len(regexp_extract_all(text, '\\b(der|die|das|und|ist|nicht)\\b')) AS de_hits,
             len(regexp_extract_all(text, '\\b(le|la|les|et|est|dans)\\b')) AS fr_hits,
             len(regexp_extract_all(text, '\\b(el|la|los|y|es|en)\\b')) AS es_hits
      FROM documents
    )
    SELECT doc_id, labeled_lang, en_hits, de_hits, fr_hits, es_hits,
           CASE
             WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
             WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
             WHEN fr_hits >= es_hits THEN 'fr'
             ELSE 'es'
           END AS lang_guess
    FROM hits ORDER BY doc_id
    """,
    description="language-ID heuristic via per-language stopword-marker "
    "hit counts with deterministic argmax (training-data pipeline op)",
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("labeled_lang"), "text"
    )
    out = docs
    for lang, pattern in _LANG_MARKERS.items():
        out = out.withColumn(
            f"{lang}_hits",
            F.size(F.regexp_extract_all("text", F.lit(pattern), 0)).cast(
                "bigint"
            ),
        )
    en, de, fr, es = (F.col(f"{lang}_hits") for lang in ("en", "de", "fr", "es"))
    guess = (
        F.when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return (
        out.withColumn("lang_guess", guess).drop("text").orderBy("doc_id")
    )


@register(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS fingerprint,
           length(text) AS n_chars
    FROM documents ORDER BY doc_id
    """,
    description="document fingerprinting: md5 over normalized text "
    "(training-data pipeline op; 64-bit simhash variant in dedup ops)",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select(
            "doc_id",
            F.md5(F.lower(F.trim("text"))).alias("fingerprint"),
            F.length("text").cast("bigint").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


SAMPLE_FRACTIONS = {"en": 0.25, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 0.5}
SAMPLE_SEED = 42


def _hash_threshold(fraction: float) -> str:
    """8-hex-digit keep-threshold for md5-hash sampling. A row is kept
    when the first 8 hex chars of md5('<id>:<seed>') compare below the
    threshold (lexicographic == numeric for fixed-width lower hex);
    'g' sorts above every hex digit, so fraction>=1 keeps all rows."""
    if fraction >= 1.0:
        return "g"
    return format(int(round(fraction * 16**8)), "08x")


@register(
    "doc_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':{SAMPLE_SEED}'), 1, 8)
          < CASE lang
      {' '.join(f"WHEN '{lang}' THEN '{_hash_threshold(f)}'"
                for lang, f in sorted(SAMPLE_FRACTIONS.items()))}
      ELSE '' END
    ORDER BY doc_id
    """,
    description="deterministic stratified sampling by language via "
    "md5-hash thresholds (training-data rebalancing: downsample "
    "dominant strata, keep rare ones whole; hash-based so the sample "
    "is stable across engines, partitionings, and reruns)",
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    thr = F.lit("")
    for lang, frac in sorted(SAMPLE_FRACTIONS.items()):
        thr = (
            F.when(F.col("lang") == lang, F.lit(_hash_threshold(frac)))
            .otherwise(thr)
        )
    key = F.substring(
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"),
                        F.lit(str(SAMPLE_SEED)))
        ),
        1,
        8,
    )
    return docs.filter(key < thr).orderBy("doc_id")


# target mixture for doc_mix_rebalance: even-name-length sources get
# twice the share of odd ones (a deterministic, source-format-agnostic
# stand-in for the hand-tuned per-source weights of a Pile/Dolma-style
# mixture — the sf1 clone uses realistic names like books/web/wiki, so
# nothing here may assume a parseable numeric suffix)
MIX_EVEN_W = 2.0
MIX_ODD_W = 1.0

# (the shared multiplicative mixer mix32/mix32_sql lives in text_fns)


@register(
    "doc_mix_rebalance",
    oracle=f"""
    WITH stats AS (
      SELECT source,
             COUNT(*) AS cnt,
             SUM(COUNT(*)) OVER () AS total
      FROM documents GROUP BY source
    ), fracs AS (
      SELECT source, cnt, total,
             CASE WHEN length(source) % 2 = 0 THEN {MIX_EVEN_W}
                  ELSE {MIX_ODD_W} END AS w,
             SUM(CASE WHEN length(source) % 2 = 0 THEN {MIX_EVEN_W}
                      ELSE {MIX_ODD_W} END) OVER () AS total_w
      FROM stats
    ), f AS (
      SELECT source,
             LEAST(1.0, (w / total_w) * total / cnt) AS frac
      FROM fracs
    )
    SELECT d.doc_id, d.source, ROUND(f.frac, 6) AS sample_frac
    FROM documents d JOIN f ON d.source = f.source
    WHERE ({mix32_sql("d.doc_id")}) * 1.0 / {MIX_M} < f.frac
    ORDER BY d.doc_id
    """,
    description="mixture rebalancing: derive per-source sampling "
    "fractions from a TARGET mix (even-name-length sources get 2x "
    "the share) and the observed counts, cap at 1, then deterministic "
    "hash-threshold sampling — the Pile/Dolma mixture-weighting step. "
    "Per-source stats are a tiny broadcast frame; the corpus side is "
    "one narrow filter",
)
def doc_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass mixture sampling: (1) aggregate per-source counts —
    a frame with one row per source, data-size independent; (2) join
    the derived fraction back (broadcast) and keep rows whose
    deterministic hash falls under it. Sources above their target
    share are downsampled, sources at/below keep everything (frac caps
    at 1 — this operator never upsamples, matching how mixture weights
    are applied in practice). The mixer is the arithmetic one shared
    with the oracle; production swaps in ``F.xxhash64``.
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w_col = F.when(
        F.length("source") % 2 == 0, F.lit(MIX_EVEN_W)
    ).otherwise(F.lit(MIX_ODD_W))
    everything = W.partitionBy()
    stats = (
        docs.groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .withColumn("total", F.sum("cnt").over(everything))
        .withColumn("w", w_col)
        .withColumn("total_w", F.sum("w").over(everything))
        .select(
            "source",
            F.least(
                F.lit(1.0),
                (F.col("w") / F.col("total_w"))
                * F.col("total")
                / F.col("cnt"),
            ).alias("frac"),
        )
    )
    u = mix32(F.col("doc_id")) / F.lit(MIX_M)
    return (
        docs.join(F.broadcast(stats), "source")
        .filter(u < F.col("frac"))
        .select(
            "doc_id", "source", F.round("frac", 6).alias("sample_frac")
        )
        .orderBy("doc_id")
    )


# DuckDB CTE producing (doc_id, w, i): one row per token with position.
_TOKS_CTE = """toks AS MATERIALIZED (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS i
      FROM documents
    )"""


@register(
    "doc_repetition_stats",
    oracle=f"""
    WITH {_TOKS_CTE},
    tc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
    td AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(MAX(c) AS BIGINT) AS top_tok
      FROM tc GROUP BY doc_id
    ),
    big AS (
      SELECT a.doc_id, a.w || ' ' || b.w AS bg
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ),
    bc AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2),
    bd AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             CAST(MAX(c) AS BIGINT) AS top_big,
             CAST(COUNT(*) AS BIGINT) AS n_dist
      FROM bc GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens,
           CAST(t.top_tok AS DOUBLE) / t.n_tokens AS top_token_frac,
           b.n_bigrams,
           CAST(b.n_bigrams - b.n_dist AS DOUBLE) / b.n_bigrams
             AS dup_bigram_frac,
           CAST(b.top_big AS DOUBLE) / b.n_bigrams AS top_bigram_frac
    FROM td t JOIN bd b USING (doc_id) ORDER BY t.doc_id
    """,
    description="Gopher-style repetition stats: most-common-token "
    "fraction, duplicate-bigram fraction, top-bigram fraction "
    "(training-data quality heuristics; explode+groupBy so partial "
    "aggregation keeps it linear at 100 TB, no per-row O(n^2) arrays)",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens("text")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, (i + 1).cast("int")),
                F.element_at(toks, (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tok_counts = (
        docs.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    td = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"), F.max("c").alias("top_tok")
    )
    big_counts = (
        docs.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
    )
    bd = big_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_big"),
        F.count("*").alias("n_dist"),
    )
    return (
        td.join(bd, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("top_tok").cast("double") / F.col("n_tokens")).alias(
                "top_token_frac"
            ),
            "n_bigrams",
            (
                (F.col("n_bigrams") - F.col("n_dist")).cast("double")
                / F.col("n_bigrams")
            ).alias("dup_bigram_frac"),
            (F.col("top_big").cast("double") / F.col("n_bigrams")).alias(
                "top_bigram_frac"
            ),
        )
        .orderBy("doc_id")
    )


VOCAB_TOP_K = 50


@register(
    "corpus_vocab_topk",
    oracle=f"""
    WITH {_TOKS_CTE},
    counts AS (
      SELECT w AS token, CAST(count(*) AS BIGINT) AS n
      FROM toks GROUP BY w
    )
    SELECT token, n,
           CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER)
             AS rank
    FROM counts ORDER BY n DESC, token LIMIT {VOCAB_TOP_K}
    """,
    description="corpus vocabulary top-50 by frequency with deterministic "
    "tie-break rank (BPE/vocab corpus analysis; TakeOrdered top-k, the "
    "rank window runs on the already-reduced 50 rows)",
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("text")
    counts = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "token").limit(VOCAB_TOP_K)
    return top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("n"), "token"))
    )


#: Misra-Gries counter budget per task. The guarantee is per-token
#: undercount <= N / (MG_COUNTERS + 1); at 4096 counters every token
#: holding more than ~0.025% of the corpus is certain to survive.
MG_COUNTERS = 4096


def mg_token_summaries(
    tok: DataFrame, k: int = MG_COUNTERS
) -> DataFrame:
    """(token, n) Misra-Gries summaries, one per partition — the third
    classic mergeable sketch beside HLL (distinct) and GK (quantiles):
    frequent-item counts with O(k) state per task (Misra & Gries 1982;
    merge rule and error bound from Agarwal et al., "Mergeable
    Summaries", PODS 2012).

    Each task folds its partition's Arrow batches into ONE running
    counter table: exact value_counts per batch (vectorized — pandas,
    not a per-row Python loop), added into the accumulator, then
    MG-compressed back to ``k`` counters (subtract the (k+1)-th
    largest count from all, drop non-positives) whenever it overflows.
    Between batches the state is <= k counters, so a task's emitted
    summary is <= k rows NO MATTER how many tokens it read — at 100 TB
    the reduce side sees O(partitions * k) rows, not the vocabulary.
    Every emitted count is a LOWER bound; total undercount per token
    is <= N/(k+1) (each compression subtracts t from at most all
    counters while discarding >= (k+1)*t mass, summed over a
    partition's stream of N_p tokens this is <= N_p/(k+1), and the
    per-token sum across partitions telescopes to <= N/(k+1)).
    """

    def gen(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            vc = pdf["token"].value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > k:
                top = acc.nlargest(k + 1)
                t = top.iloc[-1]
                acc = top.iloc[:k] - t
                acc = acc[acc > 0]
        if acc is not None and len(acc):
            yield pd.DataFrame(
                {
                    "token": acc.index.astype(str),
                    "n": acc.values.astype("int64"),
                }
            )

    return tok.mapInPandas(gen, "token string, n long")


@register(
    "corpus_vocab_topk_approx",
    oracle=None,  # approximate by construction (Misra-Gries lower
    # bounds); undercount <= N/(k+1) and heavy-hitter completeness are
    # pytest-asserted against the hash-checked exact twin
    description="corpus vocabulary top-50 via per-partition "
    f"Misra-Gries summaries ({MG_COUNTERS} counters/task, mergeable — "
    "Agarwal 2012): each task emits <= k (token, lower-bound) rows "
    "regardless of tokens read, the reduce side sums O(partitions*k) "
    "rows — the 100 TB form of frequent-token counting, beside the "
    "exact corpus_vocab_topk twin whose reduce sees the whole "
    "vocabulary",
)
def corpus_vocab_topk_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("text")
    tok = docs.select(F.explode(tokens("text")).alias("token"))
    merged = (
        mg_token_summaries(tok)
        .groupBy("token")
        .agg(F.sum("n").alias("n_approx"))
    )
    top = merged.orderBy(F.desc("n_approx"), "token").limit(VOCAB_TOP_K)
    return top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("n_approx"), "token"))
    )


# (quality-gate thresholds / CTEs / predicate / stats live in text_fns)


@register(
    "doc_quality_filter",
    oracle=f"""
    WITH {quality_ctes_from("documents")}
    SELECT doc_id,
           n_tokens >= {QF_MIN_TOKENS} AND n_tokens <= {QF_MAX_TOKENS}
             AS len_ok,
           CAST(n_distinct AS DOUBLE) / n_tokens
             >= {QF_MIN_DISTINCT_RATIO} AS diversity_ok,
           CAST(top_tok AS DOUBLE) / n_tokens
             < {QF_MAX_TOP_TOKEN_FRAC} AS repetition_ok,
           {QUALITY_GATE_PRED_SQL} AS keep
    FROM qd ORDER BY doc_id
    """,
    description="composite quality filter: length + lexical-diversity + "
    "repetition gates -> per-doc keep verdict (the decision layer of a "
    "C4/Gopher-style cleaning pipeline)",
)
def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        quality_gate_stats(docs)
        .select("doc_id", "len_ok", "diversity_ok", "repetition_ok", "keep")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BM25 keyword retrieval
# ---------------------------------------------------------------------------

# A fixed literal query, as a retrieval endpoint would bind it. Terms are
# mid-frequency in the synthetic corpus so tf/df/doclen all matter.
BM25_QUERY_TERMS = ("vector", "hash", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10


def _bm25_term_sql(term: str, i: int) -> tuple[str, str]:
    """(tf column, score expression) fragments for the DuckDB oracle
    (Lucene-style idf: ln(1 + (N - df + 0.5)/(df + 0.5)), guaranteed
    non-negative)."""
    return (
        f"len(list_filter(ws, w -> w = '{term}')) AS tf{i}",
        f"""ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))
           * tf{i} * ({BM25_K1} + 1.0)
           / (tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))""",
    )


def _bm25_oracle() -> str:
    tf_cols = []
    score_terms = []
    for i, t in enumerate(BM25_QUERY_TERMS):
        tf_col, score = _bm25_term_sql(t, i)
        tf_cols.append(tf_col)
        score_terms.append(f"CASE WHEN tf{i} > 0 THEN {score} ELSE 0.0 END")
    df_aggs = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_QUERY_TERMS))
    )
    # score terms added in FIXED left-to-right order (no SUM aggregate
    # over terms -> no accumulation-order nondeterminism)
    score_expr = " + ".join(score_terms)
    return f"""
    WITH per AS MATERIALIZED (
      SELECT doc_id, len(ws) AS dl, {", ".join(tf_cols)}
      FROM (SELECT doc_id,
                   string_split_regex(trim(text), '\\s+') AS ws
            FROM documents)
    ), stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_aggs} FROM per
    ), scored AS (
      SELECT doc_id, ROUND({score_expr}, 6) AS bm25
      FROM per, stats
      WHERE {" + ".join(f"tf{i}" for i in range(len(BM25_QUERY_TERMS)))} > 0
    )
    SELECT doc_id, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER)
             AS rank
    FROM scored ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP_K}
    """


@register(
    "doc_bm25_topk",
    oracle=_bm25_oracle(),
    description="BM25 top-10 keyword retrieval for a bound literal query "
    f"{BM25_QUERY_TERMS} (k1={BM25_K1}, b={BM25_B}, Lucene-style "
    "non-negative idf; Robertson 1994). Contamination tracing / "
    "retrieval-quality audits over a training corpus. Scale shape: tf "
    "per term is a NARROW array_size(filter(...)) per doc — no token "
    "explode, no shuffle — persisted once per (session, sf_dir) so the "
    "stats reduce and the scoring pass share one text scan; corpus "
    "stats (N, avgdl, per-term df) reduce to ONE scalar row broadcast "
    "back; top-k is TakeOrdered. One scan, one 1-row reduce, zero wide "
    "shuffles — the bounded-literal-query specialization of an "
    "inverted index (an ad-hoc many-term query would explode+join "
    "instead). Term scores are added in fixed left-to-right order, not "
    "SUM-aggregated, so the double result is accumulation-order "
    "deterministic",
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(spark, sf_dir, BM25_QUERY_TERMS)


def bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...],
    top_k: int = BM25_TOP_K,
) -> DataFrame:
    """Parameterized BM25 core (the registered face binds the fixed
    driver-corpus query; the scale bench binds terms drawn from the
    synthetic scale corpus's ``wordNNN`` vocabulary)."""
    from pyspark.sql import Window as W

    # dedup's session-scoped persisted-frame memo (eviction-self-healing)
    from project_graphdb_spark.operators.dedup import _persisted_memo

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        ws = tokens("text")

        def tf_col(i: int, t: str):
            # single-arg lambda: a 2-arg filter lambda would receive
            # the element INDEX as its second arg, not the closure value
            return (
                F.size(F.filter(ws, lambda w: w == F.lit(t)))
                .cast("bigint")
                .alias(f"tf{i}")
            )

        return docs.select(
            "doc_id",
            F.size(ws).cast("bigint").alias("dl"),
            *[tf_col(i, t) for i, t in enumerate(terms)],
        )

    # persisted so the stats reduce and the scoring pass share ONE text
    # scan/tokenization — this narrow (doc_id, dl, tf*) frame is the
    # "index" a retrieval pipeline materializes anyway
    per = _persisted_memo(
        spark, sf_dir, "bm25_tf:" + ",".join(terms), build
    )
    stats = per.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    joined = per.crossJoin(F.broadcast(stats))

    def term_score(i: int):
        tf = F.col(f"tf{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
        )
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
        )
        s = idf * tf * F.lit(BM25_K1 + 1.0) / denom
        return F.when(F.col(f"tf{i}") > 0, s).otherwise(F.lit(0.0))

    score = term_score(0)
    for i in range(1, len(terms)):
        score = score + term_score(i)

    any_hit = F.col("tf0")
    for i in range(1, len(terms)):
        any_hit = any_hit + F.col(f"tf{i}")

    scored = (
        joined.where(any_hit > 0)
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(top_k)
    )
    return scored.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.desc("bm25"), "doc_id")),
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3  # keywords surfaced per document


@register(
    "doc_tfidf_terms",
    oracle=f"""
    WITH {_TOKS_CTE},
    tf AS MATERIALIZED (
      SELECT doc_id, w AS term, count(*) AS tf
      FROM toks GROUP BY doc_id, w
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), nd AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term), nd
    ), ranked AS (
      SELECT doc_id, term, tfidf,
             CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term
             ) AS INTEGER) AS rank
      FROM scored
    )
    SELECT doc_id, term, tfidf, rank FROM ranked
    WHERE rank <= {TFIDF_TOP_K}
    ORDER BY doc_id, rank
    """,
    description=f"TF-IDF keyword extraction: top-{TFIDF_TOP_K} terms per "
    "document by tf·ln(N/df) with deterministic (score desc, term) "
    "tie-break. The GENERAL inverted path doc_bm25_topk's bounded-"
    "literal specialization avoids: explode tokens -> per-doc tf "
    "(one shuffle) -> vocab-bounded df frame joined back (size-based "
    "planning broadcasts it while the vocabulary fits; Heaps' law "
    "keeps it far below corpus rows) -> per-doc rank window "
    "PARTITIONED BY doc_id (no global sort funnel). Ranking uses the "
    "ROUNDED score so cross-engine rank order can never hinge on "
    "sub-round-off double noise",
)
def doc_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from project_graphdb_spark.operators.dedup import _persisted_memo

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        return (
            docs.select(
                "doc_id", F.explode(tokens("text")).alias("term")
            )
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
        )

    # the (doc_id, term, tf) posting frame IS the inverted index a
    # retrieval pipeline materializes; persisting it (a) computes the
    # explode+aggregate once instead of twice (the df side and the
    # probe side otherwise each rebuild it — measured as two identical
    # (doc_id, term) exchanges at sf10), and (b) makes the df count
    # below a cheap cache scan.
    tf = _persisted_memo(spark, sf_dir, "tfidf_tf", build)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # measured-size join planning: Catalyst's estimate for an aggregate
    # output is derived from its input size, so a vocab-bounded df
    # table above a huge posting frame is rated SMJ — which shuffles
    # the FULL posting frame onto the term key (tiny key domain = the
    # worst possible partitioning). The vocabulary count is cheap over
    # the cached frame and O(1) driver state; broadcast only when it is
    # provably bounded, else leave the shuffle join for the open-vocab
    # regime (same measured-quantity pattern as the IVF centroid count).
    if dfreq.count() <= 2_000_000:  # ~64 MB at ~32 B/term row
        dfreq = F.broadcast(dfreq)
    nd = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count("*").alias("n_docs"))
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df")
                ),
                6,
            ).alias("tfidf"),
        )
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
        ),
    )
    return ranked.where(F.col("rank") <= TFIDF_TOP_K).orderBy(
        "doc_id", "rank"
    )
