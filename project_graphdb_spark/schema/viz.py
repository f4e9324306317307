"""Schema visualization (D13/D14) without heavy dependencies.

The reference renders the ERD with graphviz (reference:
final/erd.py:6-33) and the graph schema with pyvis physics HTML
(reference: final/graph.py:4-69). Neither library is available here —
and neither is engine-critical — so we emit the *artifacts* those
libraries consume: Graphviz DOT text (renderable anywhere) and a
self-contained HTML page using vis-network from a CDN, mirroring the
reference's node/edge payload shape.
"""

from __future__ import annotations

import html
import json

from project_graphdb_spark.schema.graph_schema import GraphSchema
from project_graphdb_spark.schema.relational import RelationalSchema


def erd_dot(schema: RelationalSchema) -> str:
    """Graphviz DOT for the relational ERD: record-shaped table nodes,
    FK edges (the reference's erd.py drawing, as portable text)."""
    lines = [
        "digraph ERD {",
        "  rankdir=LR;",
        '  node [shape=record, fontsize=10];',
    ]
    for t in schema:
        fields = []
        for col, typ in t.columns:
            tag = " PK" if col in t.primary_keys else ""
            fields.append(f"<{col}> {col}: {typ}{tag}")
        label = "{" + t.name + "|" + "|".join(fields) + "}"
        lines.append(f'  "{t.name}" [label="{label}"];')
    for t in schema:
        for fk in t.foreign_keys:
            lines.append(
                f'  "{t.name}":{fk.from_col} -> '
                f'"{fk.table}":{fk.to_col};'
            )
    lines.append("}")
    return "\n".join(lines)


def graph_schema_dot(schema: GraphSchema) -> str:
    """DOT for the inferred property graph: one node per label, one
    labeled directed edge per relationship type."""
    lines = ["digraph GraphSchema {", "  node [shape=ellipse];"]
    for n in schema.nodes:
        props = ", ".join(n.properties[:4])
        more = "…" if len(n.properties) > 4 else ""
        lines.append(
            f'  "{n.name}" [label="{n.name}\\nkey: {n.key}'
            + (f"\\n{props}{more}" if props else "")
            + '"];'
        )
    for r in schema.relationships:
        lines.append(
            f'  "{r.source}" -> "{r.target}" [label="{r.label}"];'
        )
    lines.append("}")
    return "\n".join(lines)


def graph_schema_html(schema: GraphSchema, title: str = "Graph schema") -> str:
    """Self-contained interactive HTML (vis-network via CDN) with the
    same nodes/edges payload shape the reference's pyvis page builds."""
    nodes = [
        {"id": n.name, "label": n.name, "title": f"key: {n.key}"}
        for n in schema.nodes
    ]
    edges = [
        {
            "from": r.source,
            "to": r.target,
            "label": r.label,
            "arrows": "to",
        }
        for r in schema.relationships
    ]
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{html.escape(title)}</title>
<script src="https://unpkg.com/vis-network/standalone/umd/vis-network.min.js"></script>
<style>#net {{ width: 100%; height: 90vh; border: 1px solid #ccc; }}</style>
</head><body>
<h3>{html.escape(title)}</h3><div id="net"></div>
<script>
const nodes = new vis.DataSet({json.dumps(nodes)});
const edges = new vis.DataSet({json.dumps(edges)});
new vis.Network(document.getElementById("net"), {{nodes, edges}},
                {{physics: {{stabilization: true}}}});
</script></body></html>"""
