"""Agent lifecycle + RCA loop tests (deterministic planner path)."""

from __future__ import annotations

import pytest

from project_graphdb_spark.agent import (
    new_state,
    run_agent_workflow,
    stream_rca,
)
from project_graphdb_spark.agent.rca import query_tool, run_rca
from project_graphdb_spark.agent.workflow import (
    NO_RESULTS_SENTINEL,
    TemplatePlanner,
)
from project_graphdb_spark.graph.builder import tpch_graph
from project_graphdb_spark.operators.relational import flagship_revenue_per_year


@pytest.fixture(scope="module")
def graph(spark, sf_dir):
    return tpch_graph(spark, sf_dir)


def test_workflow_happy_path(spark, sf_dir, graph):
    state = run_agent_workflow(
        new_state("What is the total revenue per year?"), graph
    )
    assert state["steps"][:2] == ["generate_cypher", "validate_cypher"]
    assert "execute_cypher" in state["steps"]
    records = state["database_records"]
    expected = {
        r.order_year: r.revenue
        for r in flagship_revenue_per_year(spark, sf_dir).collect()
    }
    got = {r["order_year"]: r["revenue"] for r in records}
    assert got == expected
    assert "Results for" in state["answer"]


def test_workflow_direction_correction(graph):
    """The top-k template writes the arrow backwards on purpose — the
    validate stage must repair it (ref corrector stage)."""
    state = run_agent_workflow(
        new_state("top 3 customers by revenue"), graph
    )
    assert "correct_direction" in state["steps"]
    assert len(state["database_records"]) == 3


def test_workflow_value_missing(graph):
    state = run_agent_workflow(
        new_state("how many customers in the 'cardboard' segment?"), graph
    )
    assert "does not exist" in state["answer"]
    assert "execute_cypher" not in state["steps"]


def test_workflow_value_exists(graph):
    state = run_agent_workflow(
        new_state("how many customers in the 'BUILDING' segment?"), graph
    )
    assert state["database_records"][0]["n_customers"] > 0


def test_workflow_empty_result_sentinel(graph):
    state = run_agent_workflow(
        new_state("order status counts for year 1970"), graph
    )
    assert state["database_records"] == NO_RESULTS_SENTINEL
    assert state["answer"] == NO_RESULTS_SENTINEL


def test_workflow_unanswerable_question(graph):
    with pytest.raises(ValueError):
        run_agent_workflow(new_state("what is the meaning of life?"), graph)


def test_correction_loop_bounded(graph):
    class BrokenPlanner(TemplatePlanner):
        def generate_cypher(self, question, schema):
            return "MATCH (x:Nope) RETURN x"

        def correct_cypher(self, question, cypher, errors, schema):
            return "MATCH (x:StillNope) RETURN x"

    state = run_agent_workflow(new_state("anything"), graph, BrokenPlanner())
    assert "Could not produce a valid query" in state["answer"]
    assert state["steps"].count("correct_cypher") == 3  # bounded


def test_query_tool_and_rca_stream(graph):
    answer = query_tool(graph, "total sales for year 2000")
    assert "total_sales" in answer

    events = list(stream_rca(graph, "why did revenue drop in 2001?"))
    types = [e["type"] for e in events]
    assert types[0] == "system" and types[1] == "user"
    assert any(e["type"] == "tool" for e in events)
    assert events[-1].get("final")
    # the scripted plan issues 4 sub-queries over 3 loop iterations
    assert sum(1 for e in events if e["type"] == "tool") == 4

    summary = run_rca(graph, "why did revenue drop in 2001?")
    assert "Investigation of" in summary and "4 sub-queries" in summary


def test_adaptive_rca_reacts_to_findings(spark, graph):
    from project_graphdb_spark.agent.rca import (
        AdaptiveInvestigator,
        run_rca,
        stream_rca,
    )

    inv = AdaptiveInvestigator()
    events = list(
        stream_rca(graph, "why did revenue change?", investigator=inv)
    )
    # round 2's queries must target the data-determined worst year
    # (2001 is the partial year in the synthetic data)
    assert inv._target_year == 2001
    tool_calls = [
        q for e in events if e.get("tool_calls") for q in e["tool_calls"]
    ]
    assert "order status counts for year 2001" in tool_calls
    assert "order status counts for year 2000" in tool_calls
    final = [e for e in events if e.get("final")][0]["content"]
    assert "2001" in final

    # determinism: a fresh run reproduces the same summary
    again = run_rca(
        graph, "why did revenue change?", investigator=AdaptiveInvestigator()
    )
    assert again == final
