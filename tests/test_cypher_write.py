"""Cypher write surface: the reference's UNWIND+MERGE load templates
executed as DataFrame upserts (cypher/write.py).

Templates under test mirror reference final/inject_node.py:351-358 and
final/inject_relationship.py:636-644 verbatim (modulo schema names).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_graphdb_spark.cypher.parser import CypherSyntaxError
from project_graphdb_spark.cypher.write import (
    NodeMergeStmt,
    RelMergeStmt,
    cypher_write,
    parse_write,
)
from project_graphdb_spark.graph.builder import tpch_graph

SF_DIR = "/root/testdata/sf0.001"

NODE_TEMPLATE = """
UNWIND $rows AS row
MERGE (n:Customer {c_custkey: row.c_custkey})
SET n += {c_custkey: row.c_custkey, c_name: row.c_name}
RETURN count(n) AS processed
"""

REL_TEMPLATE = """
UNWIND $rows AS row
MATCH (s:Orders) WHERE s.o_orderkey = row.order_id
WITH s, row
MATCH (t:Customer) WHERE t.c_custkey = row.cust_id
WITH s, t, row
MERGE (s)-[r:PLACED_BY]->(t)
RETURN count(r) AS relationships_created
"""


def test_parse_node_template():
    stmt = parse_write(NODE_TEMPLATE)
    assert isinstance(stmt, NodeMergeStmt)
    assert stmt.label == "Customer"
    assert stmt.key == "c_custkey" and stmt.key_src == "c_custkey"
    assert ("c_name", "c_name") in stmt.set_props
    assert stmt.count_alias == "processed"


def test_parse_set_plus_equals_row():
    stmt = parse_write(
        "UNWIND $rows AS row MERGE (n:Part {p_partkey: row.pk}) SET n += row"
    )
    assert isinstance(stmt, NodeMergeStmt)
    assert stmt.set_all_row and stmt.key_src == "pk"


def test_parse_rel_template():
    stmt = parse_write(REL_TEMPLATE)
    assert isinstance(stmt, RelMergeStmt)
    assert stmt.rel_type == "PLACED_BY"
    assert (stmt.src.label, stmt.src.key, stmt.src.key_src) == (
        "Orders", "o_orderkey", "order_id",
    )
    assert (stmt.dst.label, stmt.dst.key, stmt.dst.key_src) == (
        "Customer", "c_custkey", "cust_id",
    )


def test_parse_inline_props_endpoint():
    stmt = parse_write(
        "UNWIND $batch AS r "
        "MATCH (s:Orders {o_orderkey: r.o}) MATCH (t:Customer {c_custkey: r.c}) "
        "MERGE (s)-[:PLACED_BY]->(t)"
    )
    assert isinstance(stmt, RelMergeStmt)
    assert stmt.param == "batch" and stmt.src.key_src == "o"


@pytest.mark.parametrize(
    "bad",
    [
        "MERGE (n:Customer {c_custkey: 1})",  # no UNWIND
        "UNWIND $r AS row MERGE (n:Customer)",  # no merge key
        "UNWIND $r AS row MERGE (n {k: row.k})",  # no label
        # endpoint without a preceding MATCH
        "UNWIND $r AS row MERGE (s)-[:PLACED_BY]->(t)",
        # var-length merge edge
        "UNWIND $r AS row MATCH (s:Orders {o_orderkey: row.o}) "
        "MATCH (t:Customer {c_custkey: row.c}) MERGE (s)-[:X*1..2]->(t)",
    ],
)
def test_parse_rejects(bad):
    with pytest.raises(CypherSyntaxError):
        parse_write(bad)


def test_node_merge_updates_and_inserts(spark):
    g = tpch_graph(spark, SF_DIR)
    before = g.node("Customer")
    n_before = before.count()
    existing_key = before.select("c_custkey").orderBy("c_custkey").first()[0]
    rows = spark.createDataFrame(
        [(existing_key, "UPDATED NAME"), (99_999_901, "BRAND NEW")],
        "c_custkey bigint, c_name string",
    )
    g2, ret = cypher_write(g, NODE_TEMPLATE, {"rows": rows})
    assert ret.columns == ["processed"]
    assert ret.first()[0] == 2
    after = g2.node("Customer")
    assert after.count() == n_before + 1
    got = {
        r.c_custkey: r.c_name
        for r in after.filter(
            after.c_custkey.isin(existing_key, 99_999_901)
        ).collect()
    }
    assert got[existing_key] == "UPDATED NAME"
    assert got[99_999_901] == "BRAND NEW"
    # other properties of the updated row survive (SET += semantics)
    kept = (
        g2.node("Customer")
        .filter(F.col("c_custkey") == existing_key)
        .select("c_acctbal")
        .first()[0]
    )
    assert kept is not None
    # source graph untouched (immutable frames)
    assert g.node("Customer").count() == n_before


def test_rel_merge_creates_only_missing(spark):
    g = tpch_graph(spark, SF_DIR)
    edges = g.edge("PLACED_BY")
    n_before = edges.count()
    ex = edges.select("src", "dst").orderBy("src").first()
    some_cust = (
        g.node("Customer").select("c_custkey").orderBy("c_custkey").first()[0]
    )
    # an order with no PLACED_BY edge to some_cust: grab any order key
    # not equal to ex.src and pair it with some_cust only if that edge
    # is absent — easiest: invent no new order (dangling drops), use an
    # existing (order, cust) pair that differs from its true edge? No:
    # (src, dst) identity means a second edge from the same order is a
    # new edge. Use ex.src -> a *different* customer.
    other_cust = (
        g.node("Customer")
        .filter(F.col("c_custkey") != ex.dst)
        .select("c_custkey")
        .orderBy("c_custkey")
        .first()[0]
    )
    rows = spark.createDataFrame(
        [
            (ex.src, ex.dst),  # already exists -> not duplicated
            (ex.src, other_cust),  # new edge -> created
            (123_456_789, some_cust),  # dangling order -> dropped
            (None, some_cust),  # null key -> dropped
        ],
        "order_id bigint, cust_id bigint",
    )
    g2, ret = cypher_write(g, REL_TEMPLATE, {"rows": rows})
    assert ret.columns == ["relationships_created"]
    assert ret.first()[0] == 2  # resolved, deduped rows
    assert g2.edge("PLACED_BY").count() == n_before + 1
    assert g.edge("PLACED_BY").count() == n_before


def test_unknown_rel_type_rejected(spark):
    g = tpch_graph(spark, SF_DIR)
    rows = spark.createDataFrame([(1, 1)], "order_id bigint, cust_id bigint")
    q = REL_TEMPLATE.replace("PLACED_BY", "NOT_A_TYPE")
    with pytest.raises(KeyError, match="NOT_A_TYPE"):
        cypher_write(g, q, {"rows": rows})


def test_missing_param_rejected(spark):
    g = tpch_graph(spark, SF_DIR)
    with pytest.raises(KeyError, match="rows"):
        cypher_write(g, NODE_TEMPLATE, {})


ON_TEMPLATE = """
UNWIND $rows AS row
MERGE (n:Customer {c_custkey: row.c_custkey})
ON CREATE SET n.c_name = row.new_name, n.c_comment = row.tag
ON MATCH SET n.c_comment = row.tag
SET n.c_acctbal = row.bal
RETURN count(n) AS processed
"""


def test_parse_on_create_on_match():
    stmt = parse_write(ON_TEMPLATE)
    assert isinstance(stmt, NodeMergeStmt)
    assert stmt.on_create_props == [
        ("c_name", "new_name"), ("c_comment", "tag")
    ]
    assert stmt.on_match_props == [("c_comment", "tag")]
    assert stmt.set_props == [("c_acctbal", "bal")]
    assert stmt.set_all_row is False


def test_parse_on_clause_rejects():
    with pytest.raises(CypherSyntaxError, match="explicit properties"):
        parse_write(
            "UNWIND $rows AS row MERGE (n:Customer {c_custkey: "
            "row.k}) ON CREATE SET n += row RETURN count(n) AS c"
        )
    with pytest.raises(CypherSyntaxError, match="duplicate ON MATCH"):
        parse_write(
            "UNWIND $rows AS row MERGE (n:Customer {c_custkey: row.k}) "
            "ON MATCH SET n.c_name = row.a "
            "ON MATCH SET n.c_name = row.b RETURN count(n) AS c"
        )
    with pytest.raises(CypherSyntaxError, match="ON CREATE or ON MATCH"):
        parse_write(
            "UNWIND $rows AS row MERGE (n:Customer {c_custkey: row.k}) "
            "ON DELETE SET n.c_name = row.a RETURN count(n) AS c"
        )
    with pytest.raises(CypherSyntaxError, match="must stay on variable"):
        parse_write(
            "UNWIND $rows AS row MERGE (n:Customer {c_custkey: row.k}) "
            "SET n.c_name = row.a, m.c_name = row.b "
            "RETURN count(n) AS c"
        )


def test_node_merge_on_create_on_match(spark):
    """ON CREATE props touch only inserted nodes, ON MATCH only updated
    ones, the plain SET both (Neo4j MERGE semantics)."""
    g = tpch_graph(spark, SF_DIR)
    before = g.node("Customer")
    existing_key = before.select("c_custkey").orderBy("c_custkey").first()[0]
    old_name = (
        before.filter(F.col("c_custkey") == existing_key)
        .select("c_name").first()[0]
    )
    rows = spark.createDataFrame(
        [
            (existing_key, "SHOULD NOT APPLY", "tag-upd", 11.0),
            (99_999_902, "FRESH NODE", "tag-new", 22.0),
        ],
        "c_custkey bigint, new_name string, tag string, bal double",
    )
    g2, ret = cypher_write(g, ON_TEMPLATE, {"rows": rows})
    assert ret.first()[0] == 2
    after = g2.node("Customer")
    got = {
        r.c_custkey: r
        for r in after.filter(
            after.c_custkey.isin(existing_key, 99_999_902)
        ).collect()
    }
    upd, new = got[existing_key], got[99_999_902]
    # ON MATCH applied, ON CREATE not, plain SET applied; name kept
    assert upd.c_name == old_name
    assert upd.c_comment == "tag-upd"
    assert float(upd.c_acctbal) == 11.0
    # ON CREATE applied on the insert, plus the plain SET
    assert new.c_name == "FRESH NODE"
    assert new.c_comment == "tag-new"
    assert float(new.c_acctbal) == 22.0


def test_node_merge_dotted_set(spark):
    """SET n.p = row.c spelling (no +=) drives the same upsert."""
    g = tpch_graph(spark, SF_DIR)
    key = (
        g.node("Customer").select("c_custkey")
        .orderBy("c_custkey").first()[0]
    )
    rows = spark.createDataFrame(
        [(key, "DOTTED")], "c_custkey bigint, nm string"
    )
    q = (
        "UNWIND $rows AS row "
        "MERGE (n:Customer {c_custkey: row.c_custkey}) "
        "SET n.c_name = row.nm RETURN count(n) AS processed"
    )
    g2, _ = cypher_write(g, q, {"rows": rows})
    assert (
        g2.node("Customer")
        .filter(F.col("c_custkey") == key)
        .first().c_name
        == "DOTTED"
    )
