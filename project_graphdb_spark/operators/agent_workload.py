"""Workload entries that exercise the full agent pipeline (D1-D5):
question → template planner → validate (direction-correct, value-probe)
→ compile → DataFrame. The driver's oracle check then covers the whole
NL-question path, not just the compiler."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from project_graphdb_spark.agent.workflow import TemplatePlanner
from project_graphdb_spark.cypher.compiler import compile_cypher
from project_graphdb_spark.cypher.corrector import correct_directions
from project_graphdb_spark.cypher.parser import parse
from project_graphdb_spark.graph.builder import tpch_graph
from project_graphdb_spark.operators.exact import SQL_DEC, SQL_REVENUE
from project_graphdb_spark.workload import register


def _ask(spark: SparkSession, sf_dir: str, question: str) -> DataFrame:
    """The workflow's generate→validate→compile stages, returning the
    compiled DataFrame (the driver collects; ref executes at :455-465)."""
    graph = tpch_graph(spark, sf_dir)
    planner = TemplatePlanner()
    query = parse(planner.generate_cypher(question, graph.schema.describe()))
    correct_directions(graph, query)
    return compile_cypher(graph, query)


@register(
    "agent_total_sales_2000",
    oracle=f"""
    SELECT CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) AS DOUBLE) AS total_sales
    FROM orders WHERE year(o_orderdate) = 2000
    """,
    description="D1-D4 pipeline on the RCA checkpoint question "
    "'total sales for year N' (ref rca_tool_class.ipynb:371)",
)
def agent_total_sales_2000(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ask(spark, sf_dir, "total sales for year 2000")


@register(
    "agent_top5_customers",
    oracle=f"""
    SELECT c_name AS name,
           CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY revenue DESC, name LIMIT 5
    """,
    description="D1-D4 pipeline incl. the direction-correction stage "
    "(the template emits a reversed arrow)",
)
def agent_top5_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ask(spark, sf_dir, "top 5 customers by revenue")


@register(
    "agent_customers_without_orders",
    oracle="""
    SELECT COUNT(*) AS n_customers FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
    description="D1-D4 pipeline generating the OPTIONAL MATCH + IS NULL "
    "anti-join idiom from 'how many customers have no orders?'",
)
def agent_customers_without_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _ask(spark, sf_dir, "how many customers have no orders?")


BROKEN_TOP5 = (
    # two deliberate faults vs the schema: the arrow is reversed
    # (PLACED_BY goes Orders->Customer) and o_totalprice is misspelled
    "MATCH (c:Customer)-[:PLACED_BY]->(o:Orders) "
    "RETURN c.c_name AS name, sum(o.o_totalpryce) AS revenue "
    "ORDER BY revenue DESC, name LIMIT 5"
)


@register(
    "agent_correction_loop_top5",
    oracle=f"""
    SELECT c_name AS name,
           CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY revenue DESC, name LIMIT 5
    """,
    description="the full D2->D3->D4 loop live-fired: generation carries "
    "a reversed arrow AND a misspelled property; direction correction "
    "(validate stage b) fixes the arrow, the bounded correct_cypher loop "
    "repairs the typo from the error list + schema string, and the "
    "repaired statement executes (ref final/langraph_neo4j3.py:310-451)",
)
def agent_correction_loop_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_graphdb_spark.agent.state import new_state
    from project_graphdb_spark.agent.workflow import (
        FaultyPlanner,
        run_agent_workflow,
    )

    graph = tpch_graph(spark, sf_dir)
    state = run_agent_workflow(
        new_state("top 5 customers by revenue"),
        graph,
        FaultyPlanner(BROKEN_TOP5),
    )
    steps = state["steps"]
    if "correct_cypher" not in steps or "execute_cypher" not in steps:
        raise RuntimeError(f"correction loop not exercised: {steps}")
    if "o_totalpryce" in state["cypher_statement"]:
        raise RuntimeError("typo survived the correction loop")
    final = parse(state["cypher_statement"])
    if not correct_directions(graph, final):
        raise RuntimeError("expected the reversed arrow to need flipping")
    return compile_cypher(graph, final)


@register(
    "rca_largest_drop_drilldown",
    oracle=f"""
    WITH rev AS (
      SELECT year(o_orderdate) AS y, SUM({SQL_REVENUE}) AS r
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1
    ),
    ratios AS (
      SELECT a.y, CAST(a.r AS DOUBLE) / CAST(b.r AS DOUBLE) AS ratio
      FROM rev a JOIN rev b ON b.y = a.y - 1
      WHERE CAST(b.r AS DOUBLE) > 0
    ),
    target AS (SELECT y FROM ratios ORDER BY ratio, y LIMIT 1),
    years AS (
      SELECT y - 1 AS y FROM target UNION ALL SELECT y FROM target
    )
    SELECT CAST(years.y AS INTEGER) AS order_year,
           o_orderstatus AS status, COUNT(*) AS n
    FROM orders JOIN years ON year(o_orderdate) = years.y
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    description="D7-D11 end-to-end: full adaptive RCA stream (chatbot->"
    "tools loop, query_tool dispatch, event generator), then the "
    "drill-down frame for the data-chosen largest-drop year; the oracle "
    "re-derives the same year choice in SQL, so the hash check covers "
    "the adaptive decision itself (ref final/rca_final.py:130-264)",
)
def rca_largest_drop_drilldown(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Runs the REAL investigation (stream drained, all sub-queries
    executed through the D1-D5 pipeline), then returns the status-count
    comparison for the investigator's target year vs the prior year."""
    from project_graphdb_spark.agent.rca import (
        AdaptiveInvestigator,
        stream_rca,
    )

    graph = tpch_graph(spark, sf_dir)
    inv = AdaptiveInvestigator()
    events = list(
        stream_rca(graph, "why did revenue change?", investigator=inv)
    )
    if not events or not events[-1].get("final") or inv._target_year is None:
        raise RuntimeError("RCA investigation did not complete")
    frames = []
    for yr in (inv._target_year - 1, inv._target_year):
        df = _ask(spark, sf_dir, f"order status counts for year {yr}")
        frames.append(
            df.select(
                F.lit(yr).cast("int").alias("order_year"), "status", "n"
            )
        )
    return frames[0].unionByName(frames[1]).orderBy("order_year", "status")
