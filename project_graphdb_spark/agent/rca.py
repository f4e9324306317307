"""Root-cause-analysis loop: an analytical "why" question is decomposed
into sub-queries, each answered by the full §3.1 pipeline, then
summarized.

Structural parity with the reference (reference: final/rca_final.py):

* ``query_tool`` (ref :74-87): an English sub-query runs the entire
  generate→validate→correct→execute→answer workflow and returns the
  answer string.
* chatbot → tools → chatbot loop with a hard loop bound
  (ref :130-131,180-213; bound ``loop_count > 10``).
* event streaming: a generator yielding typed JSON-able events
  (system/user/ai/tool — ref :215-264), which the reference pipes over
  chunked HTTP.

The reference's chatbot node is an LLM choosing tool calls; ours is a
pluggable ``Investigator`` whose deterministic default decomposes the
recognized "why did X change in YEAR" questions into the same
sub-queries the recorded reference sessions issued (yearly totals,
status counts, top-k contributors — rca_tool_class.ipynb:355-400).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field
from typing import Protocol

from project_graphdb_spark.agent.state import new_state
from project_graphdb_spark.agent.workflow import (
    Planner,
    run_agent_workflow,
)
from project_graphdb_spark.graph.property_graph import PropertyGraph

MAX_LOOPS = 10


class Investigator(Protocol):
    """LLM seam: given the question + answers so far, pick the next
    sub-queries (empty list = investigation complete)."""

    def next_queries(
        self, question: str, findings: list[tuple[str, str]]
    ) -> list[str]: ...

    def summarize(
        self, question: str, findings: list[tuple[str, str]]
    ) -> str: ...


@dataclass
class ScriptedInvestigator:
    """Deterministic RCA decomposition for the recognized templates, or
    an explicit scripted plan (list of sub-questions)."""

    plan: list[list[str]] = field(default_factory=list)
    _step: int = 0

    @classmethod
    def for_question(cls, question: str) -> "ScriptedInvestigator":
        q = question.lower()
        import re

        m = re.search(r"\b(19\d{2}|20\d{2})\b", q)
        if ("why" in q or "drop" in q or "change" in q) and m:
            year = int(m.group(1))
            return cls(
                plan=[
                    ["what is the total revenue per year?"],
                    [
                        f"order status counts for year {year}",
                        f"order status counts for year {year - 1}",
                    ],
                    ["top 5 customers by revenue"],
                ]
            )
        return cls(plan=[[question]])

    def next_queries(
        self, question: str, findings: list[tuple[str, str]]
    ) -> list[str]:
        if self._step >= len(self.plan):
            return []
        queries = self.plan[self._step]
        self._step += 1
        return queries

    def summarize(self, question: str, findings: list[tuple[str, str]]) -> str:
        parts = [f"Investigation of: {question}"]
        for sub_q, answer in findings:
            parts.append(f"- {sub_q}\n  {answer.splitlines()[0] if answer else ''}")
        parts.append(f"(completed in {len(findings)} sub-queries)")
        return "\n".join(parts)


@dataclass
class AdaptiveInvestigator:
    """Findings-driven RCA (the reference's chatbot reads prior tool
    outputs before choosing the next call — ref final/rca_final.py:130):
    ask for the yearly series, locate the largest year-over-year drop in
    the *answer text*, then drill into that year. Deterministic — the
    'reasoning' is a rule, but the control flow is genuinely adaptive:
    the second round's queries depend on the first round's data.
    """

    _step: int = 0
    _target_year: int | None = None

    def next_queries(
        self, question: str, findings: list[tuple[str, str]]
    ) -> list[str]:
        import re

        if self._step == 0:
            self._step = 1
            return ["what is the total revenue per year?"]
        if self._step == 1:
            self._step = 2
            series: dict[int, float] = {}
            for _, answer in findings:
                for m in re.finditer(
                    r"order_year=(\d{4}), revenue=([0-9.]+)", answer
                ):
                    series[int(m.group(1))] = float(m.group(2))
            drops = [
                (series[y] / series[y - 1], y)
                for y in series
                if y - 1 in series and series[y - 1] > 0
            ]
            if not drops:
                return []
            self._target_year = min(drops)[1]
            return [
                f"order status counts for year {self._target_year}",
                f"order status counts for year {self._target_year - 1}",
                "top 5 customers by revenue",
            ]
        return []

    def summarize(
        self, question: str, findings: list[tuple[str, str]]
    ) -> str:
        head = (
            f"Investigation of: {question}\n"
            f"Largest year-over-year revenue drop: {self._target_year}"
        )
        body = "\n".join(f"- {q}" for q, _ in findings)
        return f"{head}\n{body}\n({len(findings)} sub-queries)"


def query_tool(
    graph: PropertyGraph, english_query: str, planner: Planner | None = None
) -> str:
    """English sub-query → full agent pipeline → answer string
    (ref final/rca_final.py:74-87)."""
    state = run_agent_workflow(new_state(english_query), graph, planner)
    return state["answer"]


def stream_rca(
    graph: PropertyGraph,
    question: str,
    investigator: Investigator | None = None,
    planner: Planner | None = None,
) -> Iterator[dict]:
    """Streamed RCA investigation — yields typed events
    (ref final/rca_final.py:215-264)."""
    inv = investigator or ScriptedInvestigator.for_question(question)
    yield {"type": "system", "content": "RCA investigation started"}
    yield {"type": "user", "content": question}

    # repeated sub-queries hit the same node/edge frames — persist for
    # the investigation (the reference's warm Neo4j page cache analog)
    graph.persist()
    try:
        findings: list[tuple[str, str]] = []
        loop_count = 0
        while loop_count <= MAX_LOOPS:
            loop_count += 1
            queries = inv.next_queries(question, findings)
            if not queries:
                break
            yield {
                "type": "ai",
                "content": f"investigating: {'; '.join(queries)}",
                "tool_calls": queries,
            }
            for sub_q in queries:
                try:
                    answer = query_tool(graph, sub_q, planner)
                except ValueError as e:  # unrecognized template
                    answer = f"could not answer: {e}"
                findings.append((sub_q, answer))
                yield {
                    "type": "tool", "name": "query_tool", "content": answer
                }

        summary = inv.summarize(question, findings)
        yield {"type": "ai", "content": summary, "final": True}
    finally:
        graph.unpersist()


def run_rca(
    graph: PropertyGraph,
    question: str,
    investigator: Investigator | None = None,
    planner: Planner | None = None,
) -> str:
    """Drain the stream, return the final summary."""
    final = ""
    for event in stream_rca(graph, question, investigator, planner):
        if event.get("final"):
            final = event["content"]
    return final
