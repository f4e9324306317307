"""Pure text expression helpers shared across operator modules.

This module registers NO workload queries, which is exactly why it
exists: ``workload._ensure_loaded`` imports the operator modules in a
deliberate order (the driver's correctness gate samples the first 50
registry entries in insertion order), so a module-level import of
``text`` from ``dedup``/``corpus`` would let ``text``'s registrations
jump the queue. Anything needed across modules at import time —
tokenization, sliding-gram builders, the quality score, the quality
gate, the multiplicative mixer — lives here instead; ``text.py``
re-exports these names so its public surface is unchanged.

Everything is built-in Catalyst expressions — no Python UDFs — so the
hot path stays in whole-stage codegen and scales linearly with
executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (the BPE-ish path is ``token_count_bpe``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def sliding_structs(toks: Column, k: int) -> Column:
    """Array of structs ``(t0..t{k-1})`` of k consecutive tokens, index
    i of the result = 0-based start position; empty when the doc has
    fewer than k tokens.

    Built as ``arrays_zip`` of k shifted slices — NEVER as a
    ``transform(sequence, i -> element_at(toks, i+j))`` lambda: the
    per-element lambda falls out of whole-stage codegen into
    interpreted evaluation, measured 17-22× slower on sf1's ~7M grams
    (SCALE.md finding 9). Every gram/shingle builder in the repo goes
    through here.
    """
    n = F.size(toks)
    zipped = F.arrays_zip(
        *[F.slice(toks, j + 1, n - k + 1).alias(f"t{j}") for j in range(k)]
    )
    empty_t = ",".join(f"t{j}:string" for j in range(k))
    return F.when(n >= k, zipped).otherwise(
        F.array().cast(f"array<struct<{empty_t}>>")
    )


def sliding_grams(toks: Column, k: int) -> Column:
    """Positional word k-gram strings (space-joined), via
    :func:`sliding_structs`."""
    return F.transform(
        sliding_structs(toks, k),
        lambda s: F.concat_ws(" ", *[s[f"t{j}"] for j in range(k)]),
    )


def sliding_fold_hashes(th: Column, k: int) -> Column:
    """Positional 64-bit fold hash per k-token window over a TOKEN-HASH
    array (``transform(toks, xxhash64)``): index i = 0-based start.

    The gram-string-free twin of :func:`sliding_grams` — SCALE.md
    finding 24 measured the K-token string concat (not the hash) as the
    dominant winnow cost, so scale tiers fingerprint windows as a
    shift-xor fold of the k consecutive token hashes instead: pure long
    arithmetic (bit ops — no ANSI overflow surface), 8-byte keys. Same
    arrays_zip-of-shifted-slices shape as :func:`sliding_structs`
    (finding 9: per-element ``element_at`` lambdas fall out of codegen),
    with the fold UNROLLED over the struct fields — no inner
    ``aggregate`` loop. Equal windows always fold equal (the fold is a
    pure function of the window's tokens); collisions merely add
    candidate rows to any string-verified consumer."""
    n = F.size(th)
    zipped = F.arrays_zip(
        *[F.slice(th, j + 1, n - k + 1).alias(f"h{j}") for j in range(k)]
    )

    def fold(s):
        acc = s["h0"]
        for j in range(1, k):
            acc = (
                F.shiftleft(acc, 7)
                .bitwiseXOR(F.shiftright(acc, 57))
                .bitwiseXOR(s[f"h{j}"])
            )
        return acc

    return F.when(n >= k, F.transform(zipped, fold)).otherwise(
        F.array().cast("array<bigint>")
    )


# composite quality score over (n_tokens, n_distinct, n_chars) — the
# SQL form and quality_score() below must stay arithmetic-identical;
# dedup_keep_best ranks duplicate-cluster members by this same formula
QUALITY_SCORE_SQL = (
    "0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 100)"
    " + 0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens)"
    " + 0.2 * least(1.0, CAST(n_chars AS DOUBLE) / 500)"
)


def quality_score(text_col: str | Column = "text") -> Column:
    """Composite doc-quality expression (the Spark twin of
    ``QUALITY_SCORE_SQL``): length, lexical-diversity, and char-count
    components, each saturating at a target."""
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.length(c).cast("bigint")
    return (
        0.5 * F.least(F.lit(1.0), n_tokens.cast("double") / 100)
        + 0.3 * (n_distinct.cast("double") / n_tokens)
        + 0.2 * F.least(F.lit(1.0), n_chars.cast("double") / 500)
    )


# Shared multiplicative mixer (doc_shuffle_shards, doc_mix_rebalance).
MIX_A = 2654435761  # Knuth multiplicative-hash constant (2^32 / phi)
MIX_M = 4294967296  # 2^32
_MIX_A16 = (MIX_A * 65536) % MIX_M


def mix32(col: Column) -> Column:
    """``(col * MIX_A) mod 2^32`` without int64 overflow for ANY bigint
    input. A plain ``(col * A) % 2^32`` wraps int64 once col exceeds
    ~3.49e9 — exactly the corpus scale these operators advertise —
    yielding negative mixes in Spark while DuckDB errors on the
    overflow. Only the low 32 bits of col matter mod 2^32; splitting
    them 16/16 keeps every intermediate below 2^49.
    Production swaps in ``F.xxhash64`` (better dispersion; the
    arithmetic form exists so DuckDB can replicate it bit-for-bit)."""
    x = F.pmod(col, F.lit(MIX_M))
    hi = F.shiftright(x, 16)
    lo = x.bitwiseAND(F.lit(65535))
    return F.pmod(hi * F.lit(_MIX_A16) + lo * F.lit(MIX_A), F.lit(MIX_M))


def mix32_sql(expr: str) -> str:
    """The identical overflow-safe mixer as DuckDB SQL (oracle side)."""
    return (
        f"((({expr} % {MIX_M}) >> 16) * {_MIX_A16} "
        f"+ (({expr} % {MIX_M}) & 65535) * {MIX_A}) % {MIX_M}"
    )


# Quality-gate thresholds (doc_quality_filter, pipeline_clean_pack):
# tuned so the synthetic documents table splits into a meaningful
# keep/drop mix (not all-true/all-false).
QF_MIN_TOKENS = 12
QF_MAX_TOKENS = 4000
QF_MIN_DISTINCT_RATIO = 0.45
QF_MAX_TOP_TOKEN_FRAC = 0.125


def quality_ctes_from(source: str) -> str:
    """Quality-gate stat CTEs (qtoks/qc/qd) over an arbitrary
    (doc_id, text) relation — shared by the doc_quality_filter oracle
    and the composed-pipeline oracle so the gate has one SQL source of
    truth."""
    return f"""qtoks AS MATERIALIZED (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM {source}
    ), qc AS (SELECT doc_id, w, COUNT(*) AS c FROM qtoks GROUP BY 1, 2),
    qd AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(MAX(c) AS BIGINT) AS top_tok
      FROM qc GROUP BY doc_id
    )"""


# the combined keep predicate over qd's columns, shared verbatim
QUALITY_GATE_PRED_SQL = (
    f"n_tokens >= {QF_MIN_TOKENS} AND n_tokens <= {QF_MAX_TOKENS}"
    f" AND CAST(n_distinct AS DOUBLE) / n_tokens"
    f" >= {QF_MIN_DISTINCT_RATIO}"
    f" AND CAST(top_tok AS DOUBLE) / n_tokens < {QF_MAX_TOP_TOKEN_FRAC}"
)


def quality_gate_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) plus the three gate flags and the combined
    ``keep`` verdict — the shared core of ``doc_quality_filter`` and
    the composed cleaning pipeline."""
    tc = (
        docs.select("doc_id", F.explode(tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    td = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_tok"),
    )
    len_ok = (F.col("n_tokens") >= QF_MIN_TOKENS) & (
        F.col("n_tokens") <= QF_MAX_TOKENS
    )
    diversity_ok = (
        F.col("n_distinct").cast("double") / F.col("n_tokens")
    ) >= QF_MIN_DISTINCT_RATIO
    repetition_ok = (
        F.col("top_tok").cast("double") / F.col("n_tokens")
    ) < QF_MAX_TOP_TOKEN_FRAC
    return td.select(
        "doc_id",
        "n_tokens",
        len_ok.alias("len_ok"),
        diversity_ok.alias("diversity_ok"),
        repetition_ok.alias("repetition_ok"),
        (len_ok & diversity_ok & repetition_ok).alias("keep"),
    )
