"""Relational / analytical query surface (SURVEY.md §2.B, §2.C, §2.E).

These are the query shapes the reference's NL->Cypher layer emits against
its property graph (reference: final/experimenting_new/notebook1.ipynb:844,
final/experimenting_new/rca_tool_class.ipynb:371-391,
final/langraph_neo4j3.py:235-237) plus the standard OLAP operators the
reference lacks (windows, rollup, semi/anti joins, set ops — SURVEY.md
§2.E), all expressed as declarative DataFrame plans so Catalyst applies
predicate pushdown, column pruning, join reordering and AQE.

Scale design notes (100 TB):

* Dimension tables (nation, region, and customer at small SF) are
  broadcast — no shuffle for the probe side.
* Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE
  handles skew and post-shuffle coalescing.
* Aggregations are partial (map-side combine) by construction of
  ``groupBy().agg()``.
* Every query projects only the columns it needs *before* joining, so
  the parquet scan reads a pruned ReadSchema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.operators.exact import (
    SQL_DEC,
    SQL_REVENUE,
    dec,
    exact_avg,
    exact_sum,
    revenue_expr,
)
from project_graphdb_spark.workload import register

# ---------------------------------------------------------------------------
# Flagship: revenue per year (C5 + C9 + C10 + C12)
# Mirrors the reference's golden query "total revenue per year"
# (final/experimenting_new/notebook1.ipynb:833-844):
#   MATCH (o:Order)-[ci:CONTAINS_ITEM]->(p:Product)
#   WITH toString(date(o.order_date).year) AS year,
#        SUM(ci.list_price * ci.quantity * (1 - ci.discount)) AS revenue
# On the TPC-H-ish schema the edge table is lineitem and the measure is
# l_extendedprice * (1 - l_discount).
# ---------------------------------------------------------------------------


@register(
    "flagship_revenue_per_year",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1 ORDER BY 1
    """,
    description="1-hop pattern + grouped revenue by year "
    "(ref notebook1.ipynb:844)",
    headline=True,
)
def flagship_revenue_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # NOT pre-aggregated per l_orderkey below the join (the Q10/Q13
    # pattern): MEASURED at sf10 (r10, SCALE.md finding 23) the
    # per-orderkey pre-aggregate LOSES 40% wall with no shuffle
    # savings — at ~4 lineitems/order the partial aggregate combines
    # almost nothing pre-shuffle while paying a ~15M·SF-key hash
    # table. The same measurement made dst-grain (~30 rows/key)
    # pre-aggregation a win (g_revenue_by_brand) — fan-in decides,
    # see cypher/compiler.py AGG_PUSHDOWN_MIN_FANIN.
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Pricing summary — TPC-H Q1 shape: the heavy scan-aggregate (C9, B11)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {SQL_DEC})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {SQL_DEC})) AS DOUBLE) AS sum_base_price,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST({SQL_REVENUE} AS DECIMAL(18,4))
                    * (1 + CAST(l_tax AS {SQL_DEC}))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS {SQL_DEC})) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS {SQL_DEC})) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS {SQL_DEC})) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1-style scan-heavy group-aggregate",
    headline=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    charge = (
        revenue_expr().cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,2)") + dec("l_tax"))
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", "sum_qty"),
            exact_sum("l_extendedprice", "sum_base_price"),
            F.sum(revenue_expr()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            exact_avg("l_quantity", "avg_qty"),
            exact_avg("l_extendedprice", "avg_price"),
            exact_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# RCA checkpoint queries (C14, C15) — "order status counts for a year",
# "total sales for a year" (ref rca_tool_class.ipynb:371-391)
# ---------------------------------------------------------------------------


@register(
    "orders_status_counts_2000",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders WHERE year(o_orderdate) = 2000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description="yearly filter + count by category "
    "(ref rca_tool_class.ipynb:371-385)",
)
def orders_status_counts_2000(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderdate"
    )
    return (
        orders.filter(F.year("o_orderdate") == 2000)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderstatus")
    )


@register(
    "total_sales_2000",
    oracle=f"""
    SELECT CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) AS DOUBLE) AS total_sales
    FROM orders WHERE year(o_orderdate) = 2000
    """,
    description="scalar filtered total (ref rca_tool_class.ipynb:371)",
)
def total_sales_2000(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderdate"
    )
    return orders.filter(F.year("o_orderdate") == 2000).agg(
        exact_sum("o_totalprice", "total_sales")
    )


# ---------------------------------------------------------------------------
# Windowed top-k per group (SURVEY.md §2.E — absent in reference, required
# for RCA-style "top customers" questions)
# ---------------------------------------------------------------------------


@register(
    "top3_customers_per_nation",
    oracle=f"""
    WITH rev AS (
      SELECT c_nationkey, c_custkey,
             CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_nationkey, c_custkey
    ), ranked AS (
      SELECT n_name, c_custkey, revenue,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY revenue DESC, c_custkey) AS rnk
      FROM rev JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_name, c_custkey, revenue, rnk FROM ranked WHERE rnk <= 3
    ORDER BY n_name, rnk
    """,
    description="window row_number top-k per group with total-order "
    "tie-break",
    headline=True,
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    rev = (
        # No broadcast hint on customer: it scales with SF (~15M rows at
        # sf100), so AQE must pick the join strategy at runtime.
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(exact_sum("o_totalprice", "revenue"))
    )
    w = W.partitionBy("n_name").orderBy(
        F.col("revenue").desc(), F.col("c_custkey")
    )
    return (
        rev.join(F.broadcast(nation), rev.c_nationkey == nation.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_custkey", "revenue", "rnk")
        .orderBy("n_name", "rnk")
    )


# ---------------------------------------------------------------------------
# Anti join — "customers with no orders" (SURVEY.md §2.E; RCA hypothesis
# shape). The reference only has the implicit dangling-FK drop (semi).
# ---------------------------------------------------------------------------


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    description="left-anti join (NOT EXISTS)",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        )
        .orderBy("c_custkey")
    )


@register(
    "customers_with_orders_semi",
    oracle="""
    SELECT COUNT(*) AS n_customers FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="left-semi join (EXISTS) + count",
)
def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_semi"
        )
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Multi-hop pattern (C6): Customer -> Order -> Lineitem -> Part, the
# Spark lowering of a chained MATCH (ref rca_multiagent.ipynb hypotheses)
# ---------------------------------------------------------------------------


@register(
    "building_segment_brand_revenue",
    oracle=f"""
    SELECT p_brand, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN part     ON p_partkey = l_partkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY p_brand ORDER BY p_brand
    """,
    description="3-hop join chain with segment filter + grouped revenue "
    "(C6 multi-pattern match)",
    headline=True,
)
def building_segment_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING")
    return (
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        )
        # customer/part scale with SF — leave broadcast decisions to AQE.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Rollup (SURVEY.md §2.E — grouping sets)
# ---------------------------------------------------------------------------


@register(
    "revenue_rollup_nation_year",
    oracle=f"""
    SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    GROUP BY ROLLUP (n_name, CAST(year(o_orderdate) AS INTEGER))
    ORDER BY n_name NULLS FIRST, order_year NULLS FIRST
    """,
    description="ROLLUP grouping-sets aggregate over a join",
)
def revenue_rollup_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .withColumn("order_year", F.year("o_orderdate"))
        .rollup("n_name", "order_year")
        .agg(exact_sum("o_totalprice", "revenue"))
        .orderBy(F.col("n_name").asc_nulls_first(), F.col("order_year").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Distinct counting (B18) + conditional aggregation (pivot shape)
# ---------------------------------------------------------------------------


@register(
    "distinct_customers_per_segment",
    oracle="""
    SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    description="exact distinct count per group (B18)",
)
def distinct_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    )
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "orders_status_pivot",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    description="pivot via conditional aggregation",
)
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderdate"
    )

    def n_where(status: str, alias: str):
        return F.count(
            F.when(F.col("o_orderstatus") == status, F.lit(1))
        ).alias(alias)

    return (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            n_where("O", "n_open"),
            n_where("F", "n_filled"),
            n_where("P", "n_pending"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Null profiling (B19) — per-column null counts, one output row
# ---------------------------------------------------------------------------


@register(
    "lineitem_null_profile",
    oracle="""
    SELECT COUNT(*) - COUNT(l_orderkey) AS l_orderkey_nulls,
           COUNT(*) - COUNT(l_partkey) AS l_partkey_nulls,
           COUNT(*) - COUNT(l_quantity) AS l_quantity_nulls,
           COUNT(*) - COUNT(l_shipdate) AS l_shipdate_nulls,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
    description="null-profile stats (ref final/inject_node.py:93-95)",
)
def lineitem_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    aggs = [
        F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}_nulls")
        for c in ("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
    ]
    return li.agg(*aggs, F.count("*").alias("n_rows"))


# ---------------------------------------------------------------------------
# Timestamp explode (B9) on the events table
# ---------------------------------------------------------------------------


@register(
    "events_ts_components",
    oracle="""
    SELECT event_id,
           year(ts) AS ts_year, month(ts) AS ts_month, day(ts) AS ts_day,
           hour(ts) AS ts_hour, minute(ts) AS ts_minute,
           second(ts) AS ts_second
    FROM events WHERE event_id < 1000 ORDER BY event_id
    """,
    description="timestamp → six int components "
    "(ref final/sqlite_to_csv.py:61-81)",
)
def events_ts_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    out = events.filter(F.col("event_id") < 1000)
    for suffix, fn in (
        ("year", F.year),
        ("month", F.month),
        ("day", F.dayofmonth),
        ("hour", F.hour),
        ("minute", F.minute),
        ("second", F.second),
    ):
        out = out.withColumn(f"ts_{suffix}", fn("ts").cast("bigint"))
    return out.drop("ts").orderBy("event_id")


# ---------------------------------------------------------------------------
# Value-existence probe (C8) — the validate-stage filter-value check
# (ref final/langraph_neo4j3.py:359-362)
# ---------------------------------------------------------------------------


@register(
    "value_probe_mktsegment",
    oracle="""
    SELECT 'yes' AS value_exists FROM customer
    WHERE lower(c_mktsegment) = lower('Building') LIMIT 1
    """,
    description="case-insensitive value existence probe "
    "(ref langraph_neo4j3.py:359-362)",
)
def value_probe_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_mktsegment")
    return (
        customer.filter(F.lower(F.col("c_mktsegment")) == F.lower(F.lit("Building")))
        .limit(1)
        .select(F.lit("yes").alias("value_exists"))
    )


# ---------------------------------------------------------------------------
# Predicate surface (C7): =, <>, >, <, >=, <=, IN, CONTAINS
# ---------------------------------------------------------------------------


@register(
    "orders_predicate_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice >= 200000
      AND o_orderstatus <> 'P'
      AND contains(o_orderpriority, 'H')
    ORDER BY o_orderkey
    """,
    description="full C7 predicate set: IN, >=, <>, CONTAINS "
    "(ref langraph_neo4j3.py:235-237)",
)
def orders_predicate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_totalprice") >= 200000)
            & (F.col("o_orderstatus") != "P")
            & F.col("o_orderpriority").contains("H")
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY.md §2.E)
# ---------------------------------------------------------------------------


@register(
    "custkeys_active_both_endpoints",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
    ORDER BY custkey
    """,
    description="INTERSECT of two filtered key sets",
)
def custkeys_active_both_endpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    a = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.year("o_orderdate") == 2001).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b).orderBy("custkey")


@register(
    "custkeys_only_first_year",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) > 1995
    ORDER BY custkey
    """,
    description="EXCEPT (set difference) of two filtered key sets",
)
def custkeys_only_first_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    a = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.year("o_orderdate") > 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b).orderBy("custkey")


# ---------------------------------------------------------------------------
# Lag/lead window — inter-order gap per customer (§2.E windows)
# ---------------------------------------------------------------------------


@register(
    "customer_order_gaps",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_dt
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', prev_dt, o_orderdate) AS BIGINT) AS gap_days
    FROM seq WHERE prev_dt IS NOT NULL
    ORDER BY o_custkey, o_orderkey
    """,
    description="lag window: days between consecutive orders per customer",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("prev_dt", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_dt").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.col("prev_dt"))
            .cast("bigint")
            .alias("gap_days"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "orders_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    description="CUBE over (status, priority): all 4 grouping sets in "
    "one pass (map-side partials; no union of rescans)",
)
def orders_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum("o_totalprice", "revenue"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "orders_grouping_sets_status_year",
    oracle="""
    SELECT o_orderstatus,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)))
    ORDER BY o_orderstatus NULLS FIRST, order_year NULLS FIRST
    """,
    description="explicit GROUPING SETS ((status),(year)) via Spark SQL "
    "grouping sets",
)
def orders_grouping_sets_status_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderdate"
    )
    # per-call view name: concurrent calls (or different sf_dirs) must
    # not clobber each other's registration
    import uuid

    view = f"__gs_orders_{uuid.uuid4().hex[:12]}"
    orders.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderstatus,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               COUNT(*) AS n_orders
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)))
        ORDER BY o_orderstatus ASC NULLS FIRST, order_year ASC NULLS FIRST
        """
    )


@register(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o    ON o.o_custkey = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
                    AND s.s_nationkey = c.c_nationkey
    JOIN nation n    ON n.n_nationkey = s.s_nationkey
    JOIN region r    ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 2000
    GROUP BY 1 ORDER BY revenue DESC, nation
    """,
    description="TPC-H Q5 shape: 6-way join with the local-supplier "
    "same-nation equality, region filter, grouped revenue",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).filter(F.year("o_orderdate") == 2000)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        # supplier scales with SF (~1M rows at sf100) — no forced broadcast.
        .join(
            s,
            (s.s_suppkey == li.l_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


@register(
    "lineitem_quantity_percentiles",
    oracle="""
    SELECT quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           quantile_cont(l_quantity, 0.95) AS p95
    FROM lineitem
    """,
    description="exact interpolated percentiles (B11's quantile "
    "surface; Spark percentile vs DuckDB quantile_cont)",
)
def lineitem_quantity_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity")
    return li.agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
        F.percentile("l_quantity", F.lit(0.95)).alias("p95"),
    )


@register(
    "shipping_priority_top10",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey, o.o_orderdate AS orderdate,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '2000-03-15'
      AND l.l_shipdate  > DATE '2000-03-15'
    GROUP BY 1, 2
    ORDER BY revenue DESC, orderkey LIMIT 10
    """,
    description="TPC-H Q3 shape: segment + date-window filters, grouped "
    "revenue, top-10 by revenue",
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "2000-03-15"
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
        )
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@register(
    "order_value_rank_and_next",
    oracle="""
    SELECT o_orderkey,
           DENSE_RANK() OVER (
             PARTITION BY o_orderstatus
             ORDER BY o_totalprice DESC, o_orderkey
           ) AS value_rank,
           LEAD(o_orderkey) OVER (
             PARTITION BY o_orderstatus
             ORDER BY o_totalprice DESC, o_orderkey
           ) AS next_orderkey
    FROM orders
    QUALIFY value_rank <= 5
    ORDER BY o_orderstatus, value_rank
    """,
    description="dense_rank + lead window functions with total-order "
    "tie-breaks, top-5 per status",
)
def order_value_rank_and_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.withColumn("value_rank", F.dense_rank().over(w))
        .withColumn("next_orderkey", F.lead("o_orderkey").over(w))
        .filter(F.col("value_rank") <= 5)
        .orderBy("o_orderstatus", "value_rank")
        .select("o_orderkey", "value_rank", "next_orderkey")
    )
