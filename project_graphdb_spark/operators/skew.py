"""Skew handling: contention analysis and salted aggregation.

The reference hand-manages skew at load time: per-key degree stats →
HIGH/MEDIUM/LOW contention classification → hot-key isolation and
micro-batching (reference: final/inject_relationship.py:154-213,
240-305). In Spark the execution-side problem is solved by AQE skew-join
splitting; what remains useful at 100 TB is (a) the *analysis* as a
first-class query and (b) explicit **salting** for the case AQE cannot
fix — a single hot key inside one aggregation partition.

``salted_aggregate`` is semantics-preserving for algebraic aggregates:
stage 1 aggregates on (key, salt) — spreading one hot key over N
partitions — and stage 2 re-combines partials per key. The salt is
derived (hash % N), not random, so plans stay deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.operators.exact import dec
from project_graphdb_spark.workload import register

DEFAULT_SALT_BUCKETS = 16

# reference's thresholds (final/inject_relationship.py:179-188):
# max/mean ratio classifies contention
HIGH_RATIO = 100.0
MEDIUM_RATIO = 10.0


def with_salt(
    df: DataFrame, n: int = DEFAULT_SALT_BUCKETS, from_cols: list[str] | None = None
) -> DataFrame:
    """Add a deterministic __salt column in [0, n).

    Derived from a hash of ``from_cols`` (default: all columns) rather
    than rand() so repeated runs produce identical plans and results.
    """
    cols = [F.col(c) for c in (from_cols or df.columns)]
    return df.withColumn("__salt", F.pmod(F.xxhash64(*cols), F.lit(n)))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    counts: list[tuple[str, str]],
    sums: list[tuple[Column, str]],
    n: int = DEFAULT_SALT_BUCKETS,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``counts``: (input col or '*', alias); ``sums``: (expr, alias).
    Stage 1 groups on keys+salt (hot keys spread over ``n`` reducers),
    stage 2 combines the partials per key. Results are identical to the
    direct groupBy for these algebraic aggregates.
    """
    stage1_aggs = []
    stage2_aggs = []
    for src, alias in counts:
        stage1_aggs.append(
            (F.count("*") if src == "*" else F.count(src)).alias(f"__c_{alias}")
        )
        stage2_aggs.append(F.sum(f"__c_{alias}").alias(alias))
    for expr, alias in sums:
        stage1_aggs.append(F.sum(expr).alias(f"__s_{alias}"))
        stage2_aggs.append(F.sum(f"__s_{alias}").alias(alias))
    partial = (
        with_salt(df, n, from_cols=salt_from)
        .groupBy(*keys, "__salt")
        .agg(*stage1_aggs)
    )
    return partial.groupBy(*keys).agg(*stage2_aggs)


@register(
    "ev_user_counts_salted",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    description="salted two-stage aggregation (hot-key spreading): "
    "bit-identical to the direct groupBy (B13-B15 replacement; "
    "ref inject_relationship.py:240-337)",
    headline=True,
)
def ev_user_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        events,
        keys=["user_id"],
        counts=[("*", "n_events")],
        sums=[(dec("value"), "sum_value")],
        salt_from=["event_id"],
    )
    return out.withColumn(
        "sum_value", F.col("sum_value").cast("double")
    ).orderBy("user_id")


@register(
    "lineitem_orderkey_contention",
    oracle=f"""
    WITH deg AS (
      SELECT l_orderkey, COUNT(*) AS degree FROM lineitem GROUP BY 1
    ), stats AS (
      SELECT COUNT(*) AS n_keys,
             CAST(MAX(degree) AS BIGINT) AS max_degree,
             CAST(SUM(degree) AS DOUBLE) / COUNT(*) AS mean_degree
      FROM deg
    )
    SELECT n_keys, max_degree, mean_degree,
           CASE WHEN max_degree > mean_degree * {HIGH_RATIO} THEN 'HIGH'
                WHEN max_degree > mean_degree * {MEDIUM_RATIO} THEN 'MEDIUM'
                ELSE 'LOW' END AS contention
    FROM stats
    """,
    description="contention (skew) classification from degree stats "
    "(B11/B12; ref inject_relationship.py:154-188)",
)
def lineitem_orderkey_contention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    deg = li.groupBy("l_orderkey").agg(F.count("*").alias("degree"))
    stats = deg.agg(
        F.count("*").alias("n_keys"),
        F.max("degree").alias("max_degree"),
        (F.sum("degree").cast("double") / F.count("*")).alias("mean_degree"),
    )
    return stats.withColumn(
        "contention",
        F.when(
            F.col("max_degree") > F.col("mean_degree") * HIGH_RATIO, "HIGH"
        )
        .when(
            F.col("max_degree") > F.col("mean_degree") * MEDIUM_RATIO,
            "MEDIUM",
        )
        .otherwise("LOW"),
    )
