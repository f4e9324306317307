"""Stream-static enrichment workload registrations.

Separate from ``streaming_workload`` ONLY because that module opens the
driver's 50-query correctness window (registry insertion order is
load-bearing, see ``workload._ensure_loaded``); these land after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.streaming.ops import purchase_revenue_by_segment
from project_graphdb_spark.workload import register


@register(
    "ev_purchase_revenue_by_segment",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
    description="stream-static enrichment: the purchase stream joined "
    "against the STATIC customer dimension (user_id -> market segment), "
    "revenue aggregated per segment. The third canonical Structured "
    "Streaming join shape — the static side holds no state and carries "
    "no watermark; each micro-batch hash-joins against it, planner-"
    "broadcast while the pruned dim fits (no forced hint — customer "
    "grows with SF). Same function body runs on batch frames "
    "(this oracle-gated face) and on readStream (streaming equality "
    "asserted in tests/test_streaming.py); DECIMAL(18,2) money sums "
    "keep the hash engine-independent",
)
def ev_purchase_revenue_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customers = load_table(spark, sf_dir, "customer")
    return purchase_revenue_by_segment(
        events.filter(F.col("event_type") == "purchase"), customers
    ).orderBy("segment")
