"""As-of (temporal) join — a §2.E extension operator Spark lacks as a
built-in, composed from existing DataFrame ops (no UDFs).

For each left row, find the most recent right row with
``right.on <= left.on`` for the same ``by`` key. The distributed
formulation is tag → union → per-key window carry-forward:

* one shuffle on the key (both sides together), then a single ordered
  window pass per key — no row-at-a-time logic, no range-join blowup;
* right rows sort before left rows at equal timestamps, so an exact
  tie matches (at-or-before semantics, same as DuckDB/QuestDB ASOF);
* skew is bounded by per-key row counts (same profile as any windowed
  sessionization); salting applies if one key dominates.

The DuckDB oracle uses its native ``ASOF LEFT JOIN`` — an independent
implementation to certify ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.workload import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``prefix``-renamed ``on``
    and ``value_cols`` from the latest right row at-or-before it."""
    payload = F.struct(
        F.col(on).alias(on), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        F.col(by), F.col(on), payload.alias("__r"), F.lit(0).alias("__side")
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(r.schema["__r"].dataType)
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(by)
        .orderBy(on, "__side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *left.columns,
        F.col(f"__match.{on}").alias(f"{prefix}{on}"),
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
    return out


@register(
    "ev_asof_purchase_before_click",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS matched_ts, r.value AS matched_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
    description="as-of join (custom temporal operator, §2.E): for each "
    "click, the user's latest purchase at-or-before it; "
    "union+window carry-forward vs DuckDB's native ASOF JOIN",
    headline=True,
)
def ev_asof_purchase_before_click(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(clicks, purchases).orderBy("event_id")
