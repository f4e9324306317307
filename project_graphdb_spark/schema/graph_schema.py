"""Graph schema IR — structural parity with the reference's Pydantic
``ModellingOutput`` (reference: final/schema.py:51-68): labeled nodes with
a unique key property and a flat property list, plus directed typed
relationships with endpoint key columns and a property list.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class NodeDef:
    """A node label. ``table_names`` lists the source tables whose rows
    merge into this label (multi-table merge, reference
    final/inject_node.py:390-403); ``key`` is the unique key column."""

    name: str
    key: str
    properties: list[str] = field(default_factory=list)
    table_names: list[str] = field(default_factory=list)


@dataclass
class RelationshipDef:
    """A directed, typed relationship.

    ``key_s``/``key_t`` are the columns *in the source table*
    (``table_name``) holding the source / target node keys — exactly the
    reference's contract (final/schema.py:57-64) used to resolve CSV rows
    to node endpoints.
    """

    source: str  # source node label
    target: str  # target node label
    label: str  # relationship type
    key_s: str
    key_t: str
    properties: list[str] = field(default_factory=list)
    table_name: str = ""


@dataclass
class GraphSchema:
    nodes: list[NodeDef]
    relationships: list[RelationshipDef]

    def node(self, name: str) -> NodeDef:
        for n in self.nodes:
            if n.name == name:
                return n
        raise KeyError(f"no node label {name!r}")

    def relationship(self, label: str) -> RelationshipDef:
        for r in self.relationships:
            if r.label == label:
                return r
        raise KeyError(f"no relationship type {label!r}")

    def describe(self) -> str:
        """Neo4j-ish schema string used as LLM/validation context (the
        analog of the reference's graph.schema printout)."""
        lines = []
        for n in self.nodes:
            props = ", ".join([n.key, *n.properties])
            lines.append(f"(:{n.name} {{{props}}})")
        for r in self.relationships:
            props = f" {{{', '.join(r.properties)}}}" if r.properties else ""
            lines.append(f"(:{r.source})-[:{r.label}{props}]->(:{r.target})")
        return "\n".join(lines)
