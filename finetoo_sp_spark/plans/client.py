"""Pluggable NL-planner client: the seam that closes the reference's
NL -> plan -> execute -> response loop without baking in any one LLM.

Reference surface: query_service.cc:208-268 ``ProcessQuery`` (build
prompt -> client call -> ParseOperationPlan -> execute ops -> assemble
QueryResponse with timing) and src/cloud/vertex_ai_client.h:24-43
(``GenerateContent(prompt) -> string`` — the entire client contract is
one prompt-in/text-out method). This module keeps exactly that
contract as a Protocol so any backend (an HTTP LLM API, a local model,
a deterministic fake in tests) plugs in; the engine itself stays fully
deterministic and offline-testable (SURVEY §3 EP3 keeps the live LLM
out of v0 — the fake client in tests/test_frontend.py drives the loop
end-to-end).

Parse failures retry with error feedback: the reference surfaces the
parse error text with the raw response attached
(query_service.cc:172-175 "Failed to parse operation plan: ...
LLM Response: ..."); here that same message is appended to the re-ask
prompt so a capable planner can self-correct, bounded by ``retries``.
"""

from __future__ import annotations

import json
from typing import Protocol, runtime_checkable

from finetoo_sp_spark.operators.primitives import PropertyGraphFrames
from finetoo_sp_spark.plans.frontend import QueryResponse, build_prompt, process_plan
from finetoo_sp_spark.plans.interpreter import parse_plan_json
from finetoo_sp_spark.schema.registry import Schema


@runtime_checkable
class PlannerClient(Protocol):
    """prompt in, raw planner text out (possibly markdown-fenced JSON) —
    the vertex_ai_client.h GenerateContent contract."""

    def generate(self, prompt: str) -> str: ...


class StaticPlanner:
    """Deterministic offline client: returns canned responses keyed by a
    substring of the prompt's question line, falling back to a default.
    The test/CI backend — also a template for wrapping a real API client
    (implement ``generate`` with the HTTP call; nothing else changes)."""

    def __init__(self, responses: dict[str, str] | None = None, default: str = ""):
        self.responses = responses or {}
        self.default = default
        self.calls: list[str] = []  # prompts seen, for test inspection

    def generate(self, prompt: str) -> str:
        self.calls.append(prompt)
        for needle, resp in self.responses.items():
            if needle in prompt:
                return resp
        return self.default


def answer_query(
    g: PropertyGraphFrames,
    schema: Schema,
    question: str,
    client: PlannerClient,
    retries: int = 1,
    max_answer_rows: int = 10,
    materialize: bool = True,
) -> QueryResponse:
    """The full ProcessQuery loop: schema prompt + question -> client ->
    fence-strip/parse (retrying with error feedback up to ``retries``
    times) -> fused plan execution -> QueryResponse with timing.

    Raises ValueError with the reference's error-message shape when the
    planner never produces a parseable plan.
    """
    prompt = build_prompt(schema) + f"\n\nQuestion: {question}"
    last_err = ""
    for _attempt in range(retries + 1):
        raw = client.generate(prompt)
        try:
            ops = parse_plan_json(raw)
        except (ValueError, KeyError, json.JSONDecodeError) as e:
            last_err = f"Failed to parse operation plan: {e}\nLLM Response: {raw}"
            prompt = prompt + "\n\n" + last_err + "\nRespond with ONLY valid JSON."
            continue
        return process_plan(g, ops, max_answer_rows=max_answer_rows, materialize=materialize)
    raise ValueError(last_err)
