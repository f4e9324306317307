"""Iterative graph algorithms on DataFrames (Pregel-style).

SURVEY.md §2.E / BASELINE.json north star: batch graph analytics via an
aggregate-messages loop — join vertices to edges, aggregate messages at
the destination, update vertex state, repeat. The reference never runs
these (its graph analytics are delegated to Neo4j and never exercised);
they complete the "graph database capability" surface.

Scale design:

* Each iteration is one shuffle (join on vertex id) + one aggregation.
  Vertex state is narrow (id + a few scalars).
* ``localCheckpoint`` every ``CHECKPOINT_EVERY`` iterations cuts the
  lineage chain — without it the plan doubles per iteration and the
  optimizer chokes long before 100 TB. On a cluster use
  ``checkpoint`` (reliable) backed by HDFS/object storage.
* Convergence checks (``changed == 0``) are one count() per iteration —
  a tiny job against the updated state, not a full recompute, because
  the state was just checkpointed.

Vertex ids are ``"Label:key"`` strings so the whole heterogeneous graph
unions into one id space (same construction as the oracle SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from project_graphdb_spark.graph.property_graph import PropertyGraph

CHECKPOINT_EVERY = 5


def unified_vertices(graph: PropertyGraph) -> DataFrame:
    """(id) — all nodes in the 'Label:key' id space."""
    frames = []
    for label, df in graph.nodes.items():
        key = graph.schema.node(label).key
        frames.append(
            df.select(
                F.concat_ws(
                    ":", F.lit(label), F.col(key).cast("string")
                ).alias("id")
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def unified_edges(graph: PropertyGraph, undirected: bool = False) -> DataFrame:
    """(src, dst) in the unified id space; optionally symmetrized."""
    frames = []
    for rel_type, ef in graph.edges.items():
        meta = ef.meta
        e = ef.df.select(
            F.concat_ws(
                ":", F.lit(meta.source), F.col("src").cast("string")
            ).alias("src"),
            F.concat_ws(
                ":", F.lit(meta.target), F.col("dst").cast("string")
            ).alias("dst"),
        )
        frames.append(e)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    out = out.distinct()
    if undirected:
        out = out.unionByName(
            out.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    return out


def degrees(graph: PropertyGraph) -> DataFrame:
    """(id, in_degree, out_degree, degree) over the unified graph."""
    edges = unified_edges(graph)
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    in_deg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_degree")
    )
    verts = unified_vertices(graph)
    return (
        verts.join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .na.fill(0, ["in_degree", "out_degree"])
        .withColumn("degree", F.col("in_degree") + F.col("out_degree"))
    )


def connected_components(
    graph: PropertyGraph | None = None,
    vertices: DataFrame | None = None,
    edges: DataFrame | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) — min-id label propagation to a fixed point.

    Accepts either a PropertyGraph (uses its undirected unified view) or
    explicit (vertices, edges) frames with columns (id) / (src, dst).
    """
    if graph is not None:
        vertices = unified_vertices(graph)
        edges = unified_edges(graph, undirected=True)
    assert vertices is not None and edges is not None
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()

    labels = vertices.select("id", F.col("id").alias("component"))
    labels = labels.localCheckpoint(eager=True)
    for i in range(max_iter):
        # messages: each vertex offers its component to its neighbors
        msgs = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(msgs, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.component") != F.col("l.component"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


def pagerank(
    graph: PropertyGraph,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(id, rank) — classic power iteration with dangling-mass
    redistribution, fixed iteration count (deterministic plan shape)."""
    vertices = unified_vertices(graph)
    edges = unified_edges(graph)
    n = vertices.count()
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    state = vertices.join(out_deg, "id", "left").na.fill(0, ["out_degree"])
    state = state.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(
        eager=True
    )

    for i in range(iterations):
        contribs = (
            edges.join(state, edges.src == state.id)
            .select("dst", (F.col("rank") / F.col("out_degree")).alias("c"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("received"))
        )
        # dangling vertices donate their rank uniformly
        dangling = (
            state.filter(F.col("out_degree") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_state = (
            state.drop("rank")
            .join(contribs, "id", "left")
            .withColumn(
                "rank",
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("received"), F.lit(0.0)),
            )
            .drop("received")
        )
        state = new_state
        if (i + 1) % CHECKPOINT_EVERY == 0 or i == iterations - 1:
            state = state.localCheckpoint(eager=True)
    return state.select("id", "rank")


def bfs_distances(
    graph: PropertyGraph,
    start_id: str,
    max_depth: int = 6,
    undirected: bool = True,
) -> DataFrame:
    """(id, dist) — breadth-first distances from ``start_id``.

    Frontier expansion: one join + subtract per level; visited set and
    frontier are checkpointed so lineage stays flat.
    """
    edges = unified_edges(graph, undirected=undirected)
    visited = (
        unified_vertices(graph)
        .filter(F.col("id") == start_id)
        .select("id", F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        neighbors = (
            edges.join(frontier, edges.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .select("id", F.lit(depth).alias("dist"))
        )
        neighbors = neighbors.localCheckpoint(eager=True)
        if neighbors.isEmpty():
            break
        visited = visited.unionByName(neighbors).localCheckpoint(eager=True)
        frontier = neighbors
    return visited
