"""Agent state — field-for-field parity with the reference's
``AgentState`` (reference: final/langraph_neo4j3.py:62-69) plus the RCA
``State`` extras (final/rca_final.py:30-37)."""

from __future__ import annotations

from typing import Any, TypedDict


class AgentState(TypedDict, total=False):
    question: str
    next_action: str
    cypher_statement: str
    cypher_errors: list[str]
    database_records: list[dict[str, Any]] | str
    steps: list[str]
    answer: str


def new_state(question: str) -> AgentState:
    return AgentState(
        question=question,
        next_action="",
        cypher_statement="",
        cypher_errors=[],
        database_records=[],
        steps=[],
        answer="",
    )
