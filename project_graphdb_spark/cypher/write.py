"""Cypher write surface: the reference's batch-load MERGE templates.

The reference loads its graph exclusively through two LLM-free Cypher
templates executed over bolt with ``$rows`` parameter batches:

* node upsert  (reference final/inject_node.py:351-358)::

    UNWIND $rows AS row
    MERGE (n:Label {key: row.key})
    SET n += {key: row.key, p1: row.p1, ...}
    RETURN count(n) AS processed

* relationship merge  (reference final/inject_relationship.py:636-644)::

    UNWIND $rows AS row
    MATCH (s:Src) WHERE s.sk = row.a
    WITH s, row
    MATCH (t:Dst) WHERE t.tk = row.b
    WITH s, t, row
    MERGE (s)-[r:TYPE {p: row.p, ...}]->(t)
    RETURN count(r) AS relationships_created

This module parses exactly that write dialect (plus the inline-map
``MATCH (s:Src {sk: row.a})`` spelling) and executes it against a
:class:`PropertyGraph` with set-oriented DataFrame ops:

* node MERGE+SET  → one full-outer join per batch
  (:func:`graph.builder.merge_upsert` — update wins, insert otherwise);
* relationship MERGE → endpoint resolution via two semi joins (dangling
  rows drop, same as the reference's MATCH failing to bind) and an
  anti-join against the existing edge frame so only absent edges are
  created (MERGE semantics; existing edges win, no duplicates).

Graphs are immutable here: execution returns a NEW PropertyGraph plus
the one-row RETURN count frame. Nothing collects to the driver except
that count — batches of any size stay distributed, unlike the
reference's driver-side pandas batching (500-row UNWIND chunks over
TLS; BASELINE.md's 149 nodes/s). General-purpose CREATE/DELETE remains
out of scope (CYPHER.md) — the reference never emits it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from project_graphdb_spark.cypher import ast as A
from project_graphdb_spark.cypher.parser import (
    CypherSyntaxError,
    _Parser,
    tokenize,
)
from project_graphdb_spark.graph.builder import merge_upsert
from project_graphdb_spark.graph.property_graph import (
    EdgeFrame,
    PropertyGraph,
)


@dataclass
class NodeMergeStmt:
    param: str  # UNWIND $<param>
    row_var: str  # ... AS <row_var>
    label: str
    key: str  # merge-key property
    key_src: str  # rows column bound to it
    # SET n += {prop: row.col, ...}; empty + set_all_row for SET n += row
    set_props: list[tuple[str, str]] = field(default_factory=list)
    set_all_row: bool = False
    # ON CREATE SET / ON MATCH SET — conditional prop lists applied only
    # to inserted / updated rows respectively (None = clause absent)
    on_create_props: list[tuple[str, str]] | None = None
    on_match_props: list[tuple[str, str]] | None = None
    count_alias: str | None = None


@dataclass
class _Endpoint:
    var: str
    label: str
    key: str
    key_src: str


@dataclass
class RelMergeStmt:
    param: str
    row_var: str
    src: _Endpoint
    dst: _Endpoint
    rel_type: str
    props: list[tuple[str, str]] = field(default_factory=list)
    count_alias: str | None = None


WriteStmt = NodeMergeStmt | RelMergeStmt


def _row_col(e: A.Expr, row_var: str, what: str) -> str:
    """row.<col> property access -> the rows-frame column name."""
    if (
        isinstance(e, A.Prop)
        and isinstance(e.base, str)
        and e.base == row_var
    ):
        return e.name
    raise CypherSyntaxError(
        f"{what} must be {row_var}.<column>, got {e!r}"
    )


class _WriteParser(_Parser):
    """Recursive-descent over the same token stream as the read parser."""

    def parse_write(self) -> WriteStmt:
        self.expect("kw", "unwind")
        param = self.expect("param")
        self.expect("kw", "as")
        row_var = self.expect_name()

        endpoints: dict[str, _Endpoint] = {}
        while self.at_kw("match", "with"):
            if self.accept("kw", "with"):
                # endpoint/row passthrough (WITH s, row) — names only
                self.expect_name()
                while self.accept(","):
                    self.expect_name()
                continue
            self.expect("kw", "match")
            ep = self._parse_endpoint(row_var)
            endpoints[ep.var] = ep

        self.expect("kw", "merge")
        pat = self.parse_pattern()
        stmt: WriteStmt
        if len(pat.nodes) == 1:
            if endpoints:
                raise CypherSyntaxError(
                    "MATCH before a single-node MERGE is not supported"
                )
            stmt = self._node_merge(pat.nodes[0], param, row_var)
        elif len(pat.nodes) == 2 and len(pat.edges) == 1:
            stmt = self._rel_merge(pat, endpoints, param, row_var)
        else:
            raise CypherSyntaxError(
                "MERGE supports (n:Label {..}) or (s)-[r:T]->(t) patterns"
            )

        if self.accept("kw", "return"):
            fn = self.expect_name()
            if fn.lower() != "count":
                raise CypherSyntaxError(
                    f"write RETURN must be count(var), got {fn!r}"
                )
            self.expect("(")
            self.expect_name()
            self.expect(")")
            self.expect("kw", "as")
            stmt.count_alias = self.expect_name()
        self.expect("eof")
        return stmt

    def _parse_endpoint(self, row_var: str) -> _Endpoint:
        """(s:Label {key: row.col})  or  (s:Label) WHERE s.key = row.col"""
        node = self.parse_node()
        if node.var is None or node.label is None:
            raise CypherSyntaxError(
                "endpoint MATCH needs a variable and a label"
            )
        if node.props:
            if len(node.props) != 1:
                raise CypherSyntaxError(
                    "endpoint MATCH takes exactly one key property"
                )
            key, expr = node.props[0]
            return _Endpoint(
                node.var, node.label, key,
                _row_col(expr, row_var, "endpoint key"),
            )
        self.expect("kw", "where")
        cond = self.parse_expr()
        if not (
            isinstance(cond, A.Cmp)
            and cond.op == "="
            and isinstance(cond.left, A.Prop)
            and isinstance(cond.left.base, str)
            and cond.left.base == node.var
        ):
            raise CypherSyntaxError(
                "endpoint WHERE must be <var>.<key> = row.<column>"
            )
        return _Endpoint(
            node.var, node.label, cond.left.name,
            _row_col(cond.right, row_var, "endpoint key"),
        )

    def _node_merge(
        self, node: A.NodePat, param: str, row_var: str
    ) -> NodeMergeStmt:
        if node.label is None or len(node.props) != 1:
            raise CypherSyntaxError(
                "node MERGE needs a label and exactly one key property"
            )
        key, key_expr = node.props[0]
        stmt = NodeMergeStmt(
            param, row_var, node.label, key,
            _row_col(key_expr, row_var, "merge key"),
        )
        # ON CREATE SET / ON MATCH SET (each at most once, either
        # order), then an optional unconditional SET — Neo4j's MERGE
        # clause shape, which generated Cypher uses freely even though
        # the reference's own two load templates only emit plain SET
        while self._at_ident_ci("on"):
            self.next()
            which = self.expect_name().lower()
            if which not in ("create", "match"):
                raise CypherSyntaxError(
                    f"expected ON CREATE or ON MATCH, got ON {which!r}"
                )
            self.expect("kw", "set")
            props, all_row = self._parse_set_items(row_var)
            if all_row:
                # conditional `+= row` would silently alias the plain
                # SET; require explicit props so intent is visible
                raise CypherSyntaxError(
                    f"ON {which.upper()} SET needs explicit properties "
                    f"(n.p = row.col or n += {{...}}), not += row"
                )
            attr = f"on_{which}_props"
            if getattr(stmt, attr) is not None:
                raise CypherSyntaxError(
                    f"duplicate ON {which.upper()} SET clause"
                )
            setattr(stmt, attr, props)
        if self.accept("kw", "set"):
            stmt.set_props, stmt.set_all_row = self._parse_set_items(
                row_var
            )
        return stmt

    def _at_ident_ci(self, word: str) -> bool:
        k, v = self.peek()
        return k == "ident" and v.lower() == word

    def _parse_set_items(
        self, row_var: str
    ) -> tuple[list[tuple[str, str]], bool]:
        """One SET item list: ``n += row`` | ``n += {p: row.c, ...}`` |
        ``n.p = row.c [, n.q = row.d]*`` → (props, all_row)."""
        props: list[tuple[str, str]] = []
        mvar = self.expect_name()  # the merge variable
        if self.accept("+="):
            k, v = self.peek()
            if k == "ident" and v == row_var:
                self.next()
                return props, True
            self.expect("{")
            while True:
                prop = self.expect_name()
                self.expect(":")
                props.append(
                    (prop, _row_col(self.parse_expr(), row_var, "SET"))
                )
                if not self.accept(","):
                    break
            self.expect("}")
            return props, False
        while True:
            self.expect(".")
            prop = self.expect_name()
            self.expect("=")
            props.append(
                (prop, _row_col(self.parse_expr(), row_var, "SET"))
            )
            if not self.accept(","):
                break
            nxt = self.expect_name()
            if nxt != mvar:
                raise CypherSyntaxError(
                    f"SET list must stay on variable {mvar!r}, got {nxt!r}"
                )
        return props, False

    def _rel_merge(
        self,
        pat: A.PathPat,
        endpoints: dict[str, _Endpoint],
        param: str,
        row_var: str,
    ) -> RelMergeStmt:
        s_pat, t_pat = pat.nodes
        edge = pat.edges[0]
        if edge.rel_type is None:
            raise CypherSyntaxError("relationship MERGE needs a type")
        if edge.undirected or edge.var_length:
            raise CypherSyntaxError(
                "relationship MERGE must be a single directed edge"
            )
        if edge.reversed:
            s_pat, t_pat = t_pat, s_pat
        for np in (s_pat, t_pat):
            if np.var not in endpoints:
                raise CypherSyntaxError(
                    f"MERGE endpoint {np.var!r} has no preceding MATCH"
                )
        props = [
            (p, _row_col(e, row_var, "edge property"))
            for p, e in edge.props
        ]
        return RelMergeStmt(
            param, row_var,
            endpoints[s_pat.var], endpoints[t_pat.var],
            edge.rel_type, props,
        )


def parse_write(query: str) -> WriteStmt:
    """Parse one UNWIND+MERGE load statement (see module docstring)."""
    return _WriteParser(tokenize(query)).parse_write()


def _count_frame(df: DataFrame, alias: str) -> DataFrame:
    return df.agg(F.count("*").alias(alias))


def cypher_write(
    graph: PropertyGraph,
    query: str,
    params: dict[str, DataFrame],
) -> tuple[PropertyGraph, DataFrame]:
    """Execute a write statement; returns (new graph, RETURN frame).

    ``params`` supplies the ``$rows`` batches as DataFrames — the
    distributed analog of the reference's list-of-dict bolt parameter.
    """
    stmt = parse_write(query)
    if stmt.param not in params:
        raise KeyError(f"missing parameter ${stmt.param}")
    rows = params[stmt.param]

    if isinstance(stmt, NodeMergeStmt):

        def _project(
            batch: DataFrame, props: list[tuple[str, str]]
        ) -> DataFrame:
            """rows-batch -> update frame keyed on the merge key."""
            # the same property may appear in both the plain SET list
            # and an ON CREATE/ON MATCH list — legal in Neo4j, last
            # assignment wins; dedupe so the select emits one column
            # per name instead of an ambiguous-reference pair
            props = list(dict(props).items())
            if stmt.set_all_row:
                out = batch.withColumnRenamed(stmt.key_src, stmt.key)
                for prop, src in props:
                    if prop != stmt.key:
                        out = out.withColumn(
                            prop,
                            F.col(
                                stmt.key if src == stmt.key_src else src
                            ),
                        )
                return out
            cols = [F.col(stmt.key_src).alias(stmt.key)] + [
                F.col(src).alias(prop)
                for prop, src in props
                if prop != stmt.key
            ]
            return batch.select(*cols)

        existing = graph.node(stmt.label)
        if stmt.on_create_props is None and stmt.on_match_props is None:
            merged = merge_upsert(
                existing, _project(rows, stmt.set_props), stmt.key
            )
        else:
            # conditional MERGE: split the batch on key existence, so
            # ON MATCH props touch only updated nodes and ON CREATE
            # props only inserted ones (the plain SET applies to both).
            # Two keyed passes over the SAME join key — the second
            # reuses the first's partitioning; matched updates carry
            # only their named columns, so nothing else is clobbered,
            # and created keys match nothing, so pass 2 is pure insert.
            ex_keys = existing.select(F.col(stmt.key).alias("__mk"))
            on_key = rows[stmt.key_src] == F.col("__mk")
            matched = rows.join(ex_keys, on_key, "left_semi")
            created = rows.join(ex_keys, on_key, "left_anti")
            merged = merge_upsert(
                existing,
                _project(
                    matched, stmt.set_props + (stmt.on_match_props or [])
                ),
                stmt.key,
            )
            merged = merge_upsert(
                merged,
                _project(
                    created, stmt.set_props + (stmt.on_create_props or [])
                ),
                stmt.key,
            )
        nodes = dict(graph.nodes)
        nodes[stmt.label] = merged
        out = PropertyGraph(graph.schema, nodes, dict(graph.edges))
        processed = _count_frame(
            rows.dropDuplicates([stmt.key_src]),
            stmt.count_alias or "processed",
        )
        return out, processed

    # relationship merge: resolve endpoints, anti-join, append
    src_keys = graph.node(stmt.src.label).select(
        F.col(stmt.src.key).alias("__sk")
    )
    dst_keys = graph.node(stmt.dst.label).select(
        F.col(stmt.dst.key).alias("__dk")
    )
    new_edges = (
        rows.na.drop(subset=[stmt.src.key_src, stmt.dst.key_src])
        .join(
            src_keys, rows[stmt.src.key_src] == src_keys["__sk"], "left_semi"
        )
        .join(
            dst_keys, rows[stmt.dst.key_src] == dst_keys["__dk"], "left_semi"
        )
        .select(
            F.col(stmt.src.key_src).alias("src"),
            F.col(stmt.dst.key_src).alias("dst"),
            *[F.col(src).alias(p) for p, src in stmt.props],
        )
        .dropDuplicates(["src", "dst"])
    )
    if stmt.rel_type not in graph.edges:
        raise KeyError(
            f"unknown relationship type {stmt.rel_type!r}; MERGE loads "
            "into schema-declared types (reference parity: the loader "
            "derives types from the FK schema before injecting)"
        )
    existing = graph.edge(stmt.rel_type)
    created = new_edges.join(existing, ["src", "dst"], "left_anti")
    edges = dict(graph.edges)
    edges[stmt.rel_type] = EdgeFrame(
        graph.edges[stmt.rel_type].meta,
        existing.unionByName(created, allowMissingColumns=True),
    )
    out = PropertyGraph(graph.schema, dict(graph.nodes), edges)
    return out, _count_frame(
        new_edges, stmt.count_alias or "relationships_created"
    )
