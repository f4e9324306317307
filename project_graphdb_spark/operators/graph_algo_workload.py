"""Workload entries for the iterative graph algorithms.

Degrees and BFS distances are exactly SQL-expressible (the latter via a
recursive CTE), so they get full oracles. The iterative fixed-point
algorithms get **unrolled oracles**: their per-iteration update rules
are pure relational algebra, so a fixed number of chained CTEs
replicates the computation exactly in DuckDB —

* connected components: K iterations of min-label propagation over the
  symmetrized edge set (K chosen > the graph's eccentricity from each
  component's min-id vertex, so both engines reach the fixed point);
* label propagation: 5 synchronous modal-label rounds with the same
  deterministic tie-break (count DESC, label ASC);
* PageRank: 10 power-iteration rounds with dangling-mass
  redistribution; float sums differ only at ~1e-16 so ranks are
  rounded to 8 dp on both sides before comparison.

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


def _cc_oracle(iters: int = 14) -> str:
    """Unrolled min-label propagation: ``iters`` chained CTEs, each one
    'my label = min(my label, labels arriving over any incident edge)'.
    Exact (string min, no floats); converges when ``iters`` exceeds the
    distance from any vertex to its component's min-id vertex."""
    ctes = [
        "l0 AS MATERIALIZED (SELECT id, id AS comp FROM verts)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""l{k} AS MATERIALIZED (
      SELECT t.id, MIN(t.c) AS comp FROM (
        SELECT id, comp AS c FROM l{k - 1}
        UNION ALL
        SELECT s.dst AS id, l.comp AS c
        FROM sym s JOIN l{k - 1} l ON l.id = s.src
      ) t GROUP BY t.id
    )"""
        )
    return f"""
    WITH uedges AS MATERIALIZED ({_UEDGES_SQL}),
    sym AS MATERIALIZED (
      SELECT src, dst FROM uedges UNION SELECT dst, src FROM uedges
    ),
    verts AS MATERIALIZED ({_UVERTS_SQL}),
    {','.join(ctes)}
    SELECT comp AS component, COUNT(*) AS n_nodes
    FROM l{iters} GROUP BY comp
    ORDER BY n_nodes DESC, component
    """


@register(
    "galg_connected_components",
    oracle=_cc_oracle(),
    description="connected components via min-id label propagation "
    "(Pregel-on-DataFrames, localCheckpoint per iteration); oracle = "
    "unrolled min-propagation CTE chain",
)
def galg_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return (
        connected_components(g)
        .groupBy("component")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "component")
    )


def _pagerank_oracle(iters: int = 10, damping: float = 0.85) -> str:
    """Unrolled power iteration with dangling-mass redistribution —
    the same update rule as :func:`graph.algorithms.pagerank`:
    ``r' = (1-d)/n + d*dangling/n + d*sum(r(u)/outdeg(u))``. Rank sums
    differ from Spark's only by float addition order (~1e-16), far
    below the 8-dp rounding both sides apply."""
    ctes = [
        f"""outdeg AS MATERIALIZED (
      SELECT src AS id, COUNT(*) AS od FROM uedges GROUP BY src
    ),
    cnt AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM verts),
    r0 AS MATERIALIZED (SELECT id, 1.0 / cnt.c AS rank FROM verts, cnt)"""
    ]
    for k in range(iters):
        ctes.append(
            f"""c{k} AS MATERIALIZED (
      SELECT e.dst AS id, SUM(r.rank / od.od) AS s
      FROM uedges e
      JOIN r{k} r ON r.id = e.src
      JOIN outdeg od ON od.id = e.src
      GROUP BY e.dst
    ),
    d{k} AS MATERIALIZED (
      SELECT COALESCE(SUM(r.rank), 0.0) AS m
      FROM r{k} r LEFT JOIN outdeg od ON od.id = r.id
      WHERE od.id IS NULL
    ),
    r{k + 1} AS MATERIALIZED (
      SELECT r.id,
             CAST({1.0 - damping!r} AS DOUBLE) / cnt.c
             + CAST({damping!r} AS DOUBLE) * d{k}.m / cnt.c
             + CAST({damping!r} AS DOUBLE) * COALESCE(c{k}.s, 0.0) AS rank
      FROM r{k} r CROSS JOIN cnt CROSS JOIN d{k}
      LEFT JOIN c{k} ON c{k}.id = r.id
    )"""
        )
    return f"""
    WITH uedges AS MATERIALIZED ({_UEDGES_SQL}),
    verts AS MATERIALIZED ({_UVERTS_SQL}),
    {','.join(ctes)}
    SELECT id, ROUND(rank, 8) AS rank FROM r{iters}
    ORDER BY rank DESC, id LIMIT 20
    """


@register(
    "galg_pagerank_top20",
    oracle=_pagerank_oracle(),
    description="PageRank (10 iters, d=0.85, dangling redistribution); "
    "top-20 by rank; oracle = unrolled power-iteration CTE chain, "
    "8-dp rounded",
)
def galg_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    pr = pagerank(g)
    return (
        pr.select("id", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), "id")
        .limit(20)
    )


PPR_SOURCE = "Customer:1"  # same source convention as galg_bfs_from_customer1


def _ppr_oracle(iters: int = 10, damping: float = 0.85) -> str:
    """Unrolled random-walk-with-restart over the SYMMETRIZED graph —
    the same update rule as :func:`graph.algorithms.personalized_pagerank`:
    ``r'(v) = [(1-d) + d*dangling]*[v = source] + d*sum(r(u)/outdeg(u))``.
    Walking the undirected view keeps the proximity semantics
    (the directed edges all point child->parent, so a directed walk
    from a customer would die out at its region)."""
    ctes = [
        f"""sym AS MATERIALIZED (
      SELECT src, dst FROM uedges UNION SELECT dst, src FROM uedges
    ),
    outdeg AS MATERIALIZED (
      SELECT src AS id, COUNT(*) AS od FROM sym GROUP BY src
    ),
    r0 AS MATERIALIZED (
      SELECT id, CASE WHEN id = '{PPR_SOURCE}' THEN 1.0 ELSE 0.0 END AS rank
      FROM verts
    )"""
    ]
    for k in range(iters):
        ctes.append(
            f"""c{k} AS MATERIALIZED (
      SELECT e.dst AS id, SUM(r.rank / od.od) AS s
      FROM sym e
      JOIN r{k} r ON r.id = e.src
      JOIN outdeg od ON od.id = e.src
      GROUP BY e.dst
    ),
    d{k} AS MATERIALIZED (
      SELECT COALESCE(SUM(r.rank), 0.0) AS m
      FROM r{k} r LEFT JOIN outdeg od ON od.id = r.id
      WHERE od.id IS NULL
    ),
    r{k + 1} AS MATERIALIZED (
      SELECT r.id,
             CASE WHEN r.id = '{PPR_SOURCE}'
                  THEN CAST({1.0 - damping!r} AS DOUBLE)
                       + CAST({damping!r} AS DOUBLE) * d{k}.m
                  ELSE 0.0 END
             + CAST({damping!r} AS DOUBLE) * COALESCE(c{k}.s, 0.0) AS rank
      FROM r{k} r CROSS JOIN d{k}
      LEFT JOIN c{k} ON c{k}.id = r.id
    )"""
        )
    return f"""
    WITH uedges AS MATERIALIZED ({_UEDGES_SQL}),
    verts AS MATERIALIZED ({_UVERTS_SQL}),
    {','.join(ctes)}
    SELECT id, ROUND(rank, 8) AS rank FROM r{iters}
    WHERE rank > 0 ORDER BY rank DESC, id LIMIT 20
    """


@register(
    "galg_personalized_pagerank",
    oracle=_ppr_oracle(),
    description=f"personalized PageRank (random walk with restart to "
    f"{PPR_SOURCE}, 10 iters, d=0.85) over the symmetrized graph; "
    "top-20 proximate nodes; oracle = unrolled restart-walk CTE "
    "chain, 8-dp rounded",
)
def galg_personalized_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from project_graphdb_spark.graph.algorithms import (
        personalized_pagerank,
        unified_edges,
        unified_vertices,
    )

    g = tpch_graph(spark, sf_dir)
    ppr = personalized_pagerank(
        unified_vertices(g),
        unified_edges(g, undirected=True),
        PPR_SOURCE,
    )
    return (
        ppr.filter(F.col("rank") > 0)
        .select("id", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), "id")
        .limit(20)
    )


@register(
    "galg_triangle_count",
    oracle=f"""
    WITH uedges AS MATERIALIZED ({_UEDGES_SQL}),
    sym AS MATERIALIZED (
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


def _lpa_oracle(iters: int = 5) -> str:
    """Unrolled synchronous label propagation: each round every vertex
    adopts the modal label among messages over in-edges of the
    symmetrized edge set, ties to the smallest label — the exact
    update in :func:`graph.algorithms.label_propagation`. Vertices with
    no messages keep their label. All-integer/string math, so the
    replication is exact."""
    ctes = ["l0 AS MATERIALIZED (SELECT id, id AS community FROM verts)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"""l{k} AS MATERIALIZED (
      SELECT s.id, COALESCE(b.lbl, s.community) AS community
      FROM l{k - 1} s LEFT JOIN (
        SELECT id, lbl FROM (
          SELECT e.dst AS id, l.community AS lbl,
                 ROW_NUMBER() OVER (
                   PARTITION BY e.dst
                   ORDER BY COUNT(*) DESC, l.community ASC
                 ) AS rn
          FROM sym e JOIN l{k - 1} l ON l.id = e.src
          GROUP BY e.dst, l.community
        ) WHERE rn = 1
      ) b ON b.id = s.id
    )"""
        )
    return f"""
    WITH uedges AS MATERIALIZED ({_UEDGES_SQL}),
    sym AS MATERIALIZED (
      SELECT src, dst FROM uedges UNION SELECT dst, src FROM uedges
    ),
    verts AS MATERIALIZED ({_UVERTS_SQL}),
    {','.join(ctes)}
    SELECT community, COUNT(*) AS n_nodes
    FROM l{iters} GROUP BY community
    ORDER BY n_nodes DESC, community
    """


@register(
    "galg_label_propagation",
    oracle=_lpa_oracle(),
    description="label-propagation community detection on the Pregel "
    "driver (mode-of-neighbors update); oracle = unrolled synchronous "
    "LP CTE chain with the same min-label tie-break",
)
def galg_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    return (
        label_propagation(g)
        .groupBy("community")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "community")
    )


SSSP_ITERS = 15


def _sssp_oracle(iters: int = SSSP_ITERS) -> str:
    """Unrolled Bellman-Ford (min-plus) from Customer:1 over the
    symmetrized unified graph. Edge weight is derived from the numeric
    key suffixes — pure integer arithmetic divided once, so both
    engines build bit-identical doubles; path sums accumulate
    source-outward in the same order on both sides, so no rounding is
    needed. NULL plays infinity (MIN skips it). ``iters`` matches the
    Spark side's max_iter so both compute min-over-<=K-hop paths even
    if the fixed point is not reached."""
    ctes = [
        """d0 AS MATERIALIZED (
      SELECT id,
             CASE WHEN id = 'Customer:1' THEN CAST(0 AS DOUBLE) END AS d
      FROM verts
    )"""
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""d{k} AS MATERIALIZED (
      SELECT t.id, MIN(t.d) AS d FROM (
        SELECT id, d FROM d{k - 1}
        UNION ALL
        SELECT e.dst, l.d + e.w
        FROM sym e JOIN d{k - 1} l ON l.id = e.src AND l.d IS NOT NULL
      ) t GROUP BY t.id
    )"""
        )
    return f"""
    WITH uedges AS MATERIALIZED ({_UEDGES_SQL}),
    sym AS MATERIALIZED (
      SELECT src, dst,
             CAST(1 AS DOUBLE) +
             (CAST((CAST(regexp_extract(src, '([0-9]+)$', 1) AS BIGINT)
                  + CAST(regexp_extract(dst, '([0-9]+)$', 1) AS BIGINT))
                  % 97 AS DOUBLE) / CAST(97 AS DOUBLE)) AS w
      FROM (SELECT src, dst FROM uedges UNION SELECT dst, src FROM uedges)
    ),
    verts AS MATERIALIZED ({_UVERTS_SQL}),
    {','.join(ctes)}
    SELECT id, d AS dist FROM d{iters} ORDER BY id
    """


@register(
    "galg_shortest_paths",
    oracle=_sssp_oracle(),
    description="weighted single-source shortest paths (Bellman-Ford "
    "min-plus on the Pregel driver) with deterministic key-derived "
    "edge weights; oracle = unrolled relaxation CTE chain",
)
def galg_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_graphdb_spark.graph.algorithms import (
        shortest_paths,
        unified_edges,
        unified_vertices,
    )

    g = tpch_graph(spark, sf_dir)

    def keynum(c):
        return F.regexp_extract(c, r"([0-9]+)$", 1).cast("bigint")

    edges = unified_edges(g, undirected=True).withColumn(
        "weight",
        F.lit(1.0).cast("double")
        + ((keynum(F.col("src")) + keynum(F.col("dst"))) % 97).cast(
            "double"
        )
        / F.lit(97.0).cast("double"),
    )
    return shortest_paths(
        unified_vertices(g), edges, "Customer:1", max_iter=SSSP_ITERS
    ).orderBy("id")


KCORE_K = 3
KCORE_ORACLE_ROUNDS = 16  # > max peeling depth at test SF; Spark runs
# to the exact fixed point, so extra unrolled rounds are no-ops


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ORACLE_ROUNDS) -> str:
    """Unrolled Matula-Beck peeling over the symmetrized unified graph
    (same CTE-chain technique as the CC/PageRank oracles)."""
    ctes = [
        """e0 AS MATERIALIZED (
      SELECT src, dst FROM uedges UNION SELECT dst, src FROM uedges
    )"""
    ]
    for r in range(rounds):
        ctes.append(
            f"""k{r} AS MATERIALIZED (
      SELECT src AS id FROM e{r} GROUP BY src HAVING COUNT(*) >= {k}
    ),
    e{r + 1} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{r} e
      JOIN k{r} a ON e.src = a.id
      JOIN k{r} b ON e.dst = b.id
    )"""
        )
    return f"""
    WITH uedges AS MATERIALIZED ({_UEDGES_SQL}),
    {','.join(ctes)}
    SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e{rounds} GROUP BY src ORDER BY id
    """


@register(
    "galg_kcore_3",
    oracle=_kcore_oracle(),
    description=f"{KCORE_K}-core decomposition via Matula-Beck peeling "
    "(one degree agg + two semi-joins per round, checkpointed, "
    "edge-count fixed point); oracle = unrolled peeling CTE chain",
)
def galg_kcore_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_graphdb_spark.graph.algorithms import k_core

    g = tpch_graph(spark, sf_dir)
    return k_core(g, k=KCORE_K).orderBy("id")
