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
from project_graphdb_spark.workload import register


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (the BPE-ish path is ``token_count_bpe``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


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
           0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 100)
             + 0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens)
             + 0.2 * least(1.0, CAST(n_chars AS DOUBLE) / 500) AS quality_score
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
    n_chars = F.length("text").cast("bigint")
    n_stop = F.size(
        F.regexp_extract_all("text", F.lit(r"\b(the|and|of|to|is|in|a)\b"), 0)
    ).cast("bigint")
    distinct_ratio = n_distinct.cast("double") / n_tokens
    return (
        docs.select(
            "doc_id",
            distinct_ratio.alias("distinct_ratio"),
            (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
            (
                0.5 * F.least(F.lit(1.0), n_tokens.cast("double") / 100)
                + 0.3 * distinct_ratio
                + 0.2 * F.least(F.lit(1.0), n_chars.cast("double") / 500)
            ).alias("quality_score"),
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
