"""PropertyGraph persistence: parquet-backed graph sink and scan.

The reference's graph "sink" is batched Cypher MERGE over bolt into
Neo4j (A7/A8, reference: final/inject_node.py:241-306,
final/inject_relationship.py:437-500). Ours is the Spark-native
equivalent: one parquet directory per label and per relationship type
plus a JSON schema manifest. The per-label/type layout is the partition
strategy (SURVEY.md §1.4): a query that touches one label reads one
directory — partition pruning by construction — and each directory can
be further partitioned/bucketed independently at real scale.

Idempotent keyed upsert (the MERGE semantics, B1) is overwrite-by-label
here: node frames are already key-deduped by the builder, so a rewrite
of a label directory is exactly "MERGE all rows of that label".
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

from pyspark.sql import SparkSession

from project_graphdb_spark.graph.property_graph import (
    EdgeFrame,
    PropertyGraph,
)
from project_graphdb_spark.schema.graph_schema import (
    GraphSchema,
    NodeDef,
    RelationshipDef,
)

_MANIFEST = "graph_schema.json"


def save_graph(graph: PropertyGraph, path: str) -> None:
    """Write the graph: nodes/<label>/, edges/<type>/, schema manifest."""
    for label, df in graph.nodes.items():
        df.write.mode("overwrite").parquet(
            os.path.join(path, "nodes", label)
        )
    for rel_type, ef in graph.edges.items():
        ef.df.write.mode("overwrite").parquet(
            os.path.join(path, "edges", rel_type)
        )
    manifest = {
        "nodes": [asdict(n) for n in graph.schema.nodes],
        "relationships": [asdict(r) for r in graph.schema.relationships],
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)


def load_graph(spark: SparkSession, path: str) -> PropertyGraph:
    """Scan a saved graph back into lazy per-label/type DataFrames."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    schema = GraphSchema(
        nodes=[NodeDef(**n) for n in manifest["nodes"]],
        relationships=[
            RelationshipDef(**r) for r in manifest["relationships"]
        ],
    )
    nodes = {
        n.name: spark.read.parquet(os.path.join(path, "nodes", n.name))
        for n in schema.nodes
    }
    edges = {
        r.label: EdgeFrame(
            meta=r,
            df=spark.read.parquet(os.path.join(path, "edges", r.label)),
        )
        for r in schema.relationships
    }
    return PropertyGraph(schema=schema, nodes=nodes, edges=edges)
