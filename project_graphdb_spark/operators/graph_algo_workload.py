"""Workload entries for the iterative graph algorithms.

Degrees and BFS distances are exactly SQL-expressible (the latter via a
recursive CTE), so they get full oracles. Connected components and
PageRank are iterative fixed-point computations — registered without
oracle (rows-only driver check); their semantics are unit-tested on
hand-built graphs in tests/test_graph_algorithms.py.

The oracle SQL reconstructs the unified 'Label:key' vertex/edge space
with the same dedup the graph builder applies. (Endpoint-validity
semi-joins are omitted here because g_edge_counts_by_type already
proves the test data has no dangling FKs.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_graphdb_spark.graph.algorithms import (
    bfs_distances,
    connected_components,
    degrees,
    label_propagation,
    pagerank,
    triangle_count,
)
from project_graphdb_spark.graph.builder import tpch_graph
from project_graphdb_spark.workload import register

_UEDGES_SQL = """
      SELECT DISTINCT * FROM (
        SELECT 'Nation:' || n_nationkey AS src, 'Region:' || n_regionkey AS dst
        FROM nation WHERE n_nationkey IS NOT NULL AND n_regionkey IS NOT NULL
        UNION ALL
        SELECT 'Customer:' || c_custkey, 'Nation:' || c_nationkey
        FROM customer WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
        UNION ALL
        SELECT 'Supplier:' || s_suppkey, 'Nation:' || s_nationkey
        FROM supplier WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL
        UNION ALL
        SELECT 'Orders:' || o_orderkey, 'Customer:' || o_custkey
        FROM orders WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
        UNION ALL
        SELECT 'Orders:' || l_orderkey, 'Part:' || l_partkey
        FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
      )
"""

_UVERTS_SQL = """
      SELECT 'Region:' || r_regionkey AS id FROM region
      UNION ALL SELECT 'Nation:' || n_nationkey FROM nation
      UNION ALL SELECT 'Customer:' || c_custkey FROM customer
      UNION ALL SELECT 'Supplier:' || s_suppkey FROM supplier
      UNION ALL SELECT 'Part:' || p_partkey FROM part
      UNION ALL SELECT 'Orders:' || o_orderkey FROM orders
"""


@register(
    "galg_degrees",
    oracle=f"""
    WITH uedges AS ({_UEDGES_SQL}),
    outd AS (SELECT src AS id, COUNT(*) AS out_degree FROM uedges GROUP BY 1),
    ind  AS (SELECT dst AS id, COUNT(*) AS in_degree  FROM uedges GROUP BY 1),
    verts AS ({_UVERTS_SQL})
    SELECT v.id,
           COALESCE(in_degree, 0) AS in_degree,
           COALESCE(out_degree, 0) AS out_degree,
           COALESCE(in_degree, 0) + COALESCE(out_degree, 0) AS degree
    FROM verts v
    LEFT JOIN outd USING (id) LEFT JOIN ind USING (id)
    ORDER BY id
    """,
    description="in/out/total degree over the unified heterogeneous "
    "graph (B10; GraphX degrees analog)",
)
def galg_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return degrees(g).orderBy("id")


@register(
    "galg_bfs_from_customer1",
    oracle=f"""
    WITH RECURSIVE uedges AS ({_UEDGES_SQL}),
    sym AS (
      SELECT src, dst FROM uedges UNION SELECT dst, src FROM uedges
    ),
    bfs AS (
      SELECT 'Customer:1' AS id, 0 AS d
      UNION
      SELECT sym.dst, bfs.d + 1 FROM bfs JOIN sym ON sym.src = bfs.id
      WHERE bfs.d < 6
    )
    SELECT id, CAST(MIN(d) AS INTEGER) AS dist
    FROM bfs GROUP BY id ORDER BY id
    """,
    description="BFS shortest-path distances (undirected, depth<=6) — "
    "iterative frontier expansion vs recursive-CTE oracle",
)
def galg_bfs_from_customer1(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return bfs_distances(g, "Customer:1", max_depth=6).orderBy("id")


@register(
    "galg_connected_components",
    oracle=None,  # iterative fixed point; semantics unit-tested
    description="connected components via min-id label propagation "
    "(Pregel-on-DataFrames, localCheckpoint per iteration)",
)
def galg_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return (
        connected_components(g)
        .groupBy("component")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "component")
    )


@register(
    "galg_pagerank_top20",
    oracle=None,  # iterative float fixed point; semantics unit-tested
    description="PageRank (10 iters, d=0.85, dangling redistribution); "
    "top-20 by rank",
)
def galg_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    pr = pagerank(g)
    return (
        pr.select("id", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), "id")
        .limit(20)
    )


@register(
    "galg_triangle_count",
    oracle=f"""
    WITH uedges AS ({_UEDGES_SQL}),
    sym AS (
      SELECT src, dst FROM uedges UNION SELECT dst, src FROM uedges
    ),
    canon AS (SELECT src, dst FROM sym WHERE src < dst)
    SELECT COUNT(*) AS n_triangles
    FROM canon e1
    JOIN canon e2 ON e1.dst = e2.src
    JOIN canon e3 ON e1.src = e3.src AND e2.dst = e3.dst
    """,
    description="triangle count via canonical-edge double join "
    "(graph analytics; exact SQL oracle)",
)
def galg_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return triangle_count(g)


@register(
    "galg_label_propagation",
    oracle=None,  # modal-label fixed point; semantics unit-tested
    description="label-propagation community detection on the Pregel "
    "driver (mode-of-neighbors update)",
)
def galg_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return (
        label_propagation(g)
        .groupBy("community")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "community")
    )
