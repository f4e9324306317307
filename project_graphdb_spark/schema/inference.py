"""Deterministic relational → property-graph schema inference.

The reference infers its graph schema with an LLM over ERD text
(reference: final/schema.py:7-78); its prompt encodes two rules we make
deterministic here (so tests are reproducible — SURVEY.md §1.3):

1. **Entity tables → nodes.** A table with a single-column primary key
   becomes a node label; the PK is the node key, every other non-FK
   column a property.
2. **Lookup/edge tables → relationships.** A table with ≥2 foreign keys
   and no single-column PK (classic association table, cf. the prompt
   rule at final/schema.py:14) becomes a directed relationship from the
   first FK's target to the second FK's target, with all remaining
   columns (including surplus FKs) as edge properties.
3. **FK columns in entity tables → relationships.** Each FK in a node
   table becomes an edge from the owning table's label to the referenced
   table's label (canonical orientation: FK-owner → FK-target, per
   FIXTURES.md).

Naming is deterministic: labels are ``CamelCase`` singular-ish table
names; relationship types are ``HAS_<stem>`` where the stem is the FK
column with its table prefix and key-ish suffix stripped, or an explicit
override via ``rel_names``. An LLM-backed modeler can be plugged in
behind the same ``infer_graph_schema`` signature, but is never on the
test path.
"""

from __future__ import annotations

import re

from project_graphdb_spark.schema.graph_schema import (
    GraphSchema,
    NodeDef,
    RelationshipDef,
)
from project_graphdb_spark.schema.relational import RelationalSchema, TableInfo


def node_label(table_name: str) -> str:
    """region -> Region, order_items -> OrderItems."""
    return "".join(p.capitalize() for p in re.split(r"[_\W]+", table_name) if p)


def _fk_stem(col: str, table: TableInfo) -> str:
    """Strip a 1-2 char table-alias prefix (``o_custkey`` -> ``custkey``)
    and key-ish suffixes (``custkey`` -> ``cust``, ``store_id`` -> ``store``)."""
    stem = col.lower()
    m = re.match(r"^[a-z]{1,2}_(.+)$", stem)
    if m and all(c.lower().startswith(stem[: stem.index("_") + 1]) for c in table.column_names):
        stem = m.group(1)
    stem = re.sub(r"(_?id|_?key|_?num(ber)?)$", "", stem)
    return stem or col.lower()


def is_edge_table(t: TableInfo) -> bool:
    """Association-table test (rule 2)."""
    return len(t.foreign_keys) >= 2 and len(t.primary_keys) != 1


def infer_graph_schema(
    schema: RelationalSchema,
    rel_names: dict[tuple[str, str], str] | None = None,
) -> GraphSchema:
    """Apply rules 1-3. ``rel_names`` overrides relationship type names,
    keyed by (table_name, fk_from_col) for FK edges and
    (table_name, "") for edge tables."""
    rel_names = rel_names or {}
    nodes: list[NodeDef] = []
    rels: list[RelationshipDef] = []

    node_tables = {t.name: t for t in schema if not is_edge_table(t)}

    for t in schema:
        if t.name in node_tables:
            key = t.primary_keys[0]
            props = [c for c in t.column_names if c != key]
            nodes.append(
                NodeDef(
                    name=node_label(t.name),
                    key=key,
                    properties=props,
                    table_names=[t.name],
                )
            )
            for fk in t.foreign_keys:
                if fk.table not in node_tables:
                    continue
                label = rel_names.get(
                    (t.name, fk.from_col),
                    f"HAS_{_fk_stem(fk.from_col, t).upper()}",
                )
                rels.append(
                    RelationshipDef(
                        source=node_label(t.name),
                        target=node_label(fk.table),
                        label=label,
                        key_s=t.primary_keys[0],
                        key_t=fk.from_col,
                        properties=[],
                        table_name=t.name,
                    )
                )
        else:
            fk_s, fk_t = t.foreign_keys[0], t.foreign_keys[1]
            used = {fk_s.from_col, fk_t.from_col}
            props = [c for c in t.column_names if c not in used]
            label = rel_names.get(
                (t.name, ""),
                f"{node_label(fk_s.table).upper()}_{node_label(fk_t.table).upper()}",
            )
            rels.append(
                RelationshipDef(
                    source=node_label(fk_s.table),
                    target=node_label(fk_t.table),
                    label=label,
                    key_s=fk_s.from_col,
                    key_t=fk_t.from_col,
                    properties=props,
                    table_name=t.name,
                )
            )

    # two FKs (e.g. orders.store_id and staffs.store_id) can infer the
    # same default label; qualify colliding ones with the source label
    # so no relationship silently shadows another
    seen: dict[str, int] = {}
    for r in rels:
        seen[r.label] = seen.get(r.label, 0) + 1
    for r in rels:
        if seen[r.label] > 1:
            r.label = f"{r.source.upper()}_{r.label}"

    return GraphSchema(nodes=nodes, relationships=rels)


# Canonical relationship names for the TPC-H-ish test graph (the
# deterministic analog of the reference's LLM-chosen names like
# PLACED_BY / CONTAINS_ITEM, FIXTURES.md §1-2).
TPCH_REL_NAMES: dict[tuple[str, str], str] = {
    ("nation", "n_regionkey"): "IN_REGION",
    ("customer", "c_nationkey"): "FROM_NATION",
    ("supplier", "s_nationkey"): "LOCATED_IN",
    ("orders", "o_custkey"): "PLACED_BY",
    ("lineitem", ""): "CONTAINS_ITEM",
}
