"""Operation-plan interpreter: a JSON plan -> one fused DataFrame.

Reference surface: proto/operations.proto:16-87 (Operation / OperationPlan
/ OperationResult) executed sequentially with the previous result piped
into the next op (reference: query_service.cc:244-252 executor loop;
operation_executor.cc:37-45 ExecutePlan skeleton). The reference re-scans
the whole graph per op; here the fold builds ONE lazy plan and Catalyst
fuses it (filters merge, projections prune, the final action runs a single
physical plan — SURVEY.md §4 "free upgrade").

Plan JSON format (the API kept from the reference's LLM front-end,
query_service.cc:103-176, minus the LLM — plans are deterministic inputs):

    {"operations": [
        {"type": "FILTER", "target_type": "block",
         "property": "n_words", "predicate": "GT", "value": 10},
        {"type": "GROUP_BY", "target_type": "block", "property": "tag"}
    ]}
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from finetoo_sp_spark.operators.primitives import (
    PropertyGraphFrames,
    op_aggregate,
    op_compare,
    op_filter,
    op_group_by,
    op_join,
    op_match,
    op_project,
    op_traverse,
)
from finetoo_sp_spark.schema.registry import CapabilityError

def strip_fences(raw: str) -> str:
    """Find-based fence strip matching the reference exactly
    (query_service.cc:108-130 ParseOperationPlan): take everything after
    a leading ```json (or bare ```) marker, cut at the next ```, trim —
    which also tolerates planner prose before/after the fenced block,
    not just fences at the string boundaries."""
    s = raw
    i = s.find("```json")
    if i != -1:
        s = s[i + 7 :]
    else:
        i = s.find("```")
        if i != -1:
            s = s[i + 3 :]
    j = s.find("```")
    if j != -1:
        s = s[:j]
    return s.strip()


def parse_plan_json(raw: str) -> list[dict]:
    """Parse a plan, tolerating markdown code fences and surrounding
    prose (reference: query_service.cc:103-140 strips ``` fences before
    the JSON parse)."""
    doc = json.loads(strip_fences(raw))
    ops = doc["operations"] if isinstance(doc, dict) else doc
    if not isinstance(ops, list):
        raise ValueError("plan must be a list of operations")
    return ops


@dataclass
class PlanResult:
    """Final DataFrame + per-op provenance descriptions (reference:
    OperationResult provenance + timing, proto/operations.proto:70-87)."""

    df: DataFrame
    steps: list[str] = field(default_factory=list)


def execute_plan(g: PropertyGraphFrames, plan: list[dict] | str) -> PlanResult:
    if isinstance(plan, str):
        plan = parse_plan_json(plan)

    state: DataFrame | None = None
    state_type: str | None = None
    steps: list[str] = []

    for op in plan:
        kind = op.get("type", "").upper()
        t = op.get("target_type")
        if kind == "MATCH":
            state = op_match(g, t, op["property"], op["value"])
            state_type = t
        elif kind == "FILTER":
            if state is not None and state_type == t:
                # piped: apply this filter to the previous node set
                from finetoo_sp_spark.operators.primitives import predicate

                state = state.filter(
                    predicate(op["property"], op.get("predicate", "EQUALS"), op["value"])
                )
            else:
                state = op_filter(
                    g, t, op["property"], op.get("predicate", "EQUALS"), op["value"]
                )
            state_type = t
        elif kind == "COMPARE":
            state = op_compare(
                g,
                t,
                op["property"],
                op.get("key_property", "node_id"),
                op["key1"],
                op["key2"],
                op.get("tolerance"),
            )
            state_type = None
        elif kind == "TRAVERSE":
            start = None
            if state is not None and "node_id" in state.columns:
                start = state.select("node_id")
            state = op_traverse(g, op["edge_type"], start, int(op.get("max_depth", 1)))
            state_type = None
        elif kind in ("AGGREGATE", "GROUP_BY"):
            source = state if (state is not None and state_type == t) else None
            if kind == "AGGREGATE":
                state = op_aggregate(
                    g, t, op.get("aggregation", "COUNT"), op.get("property"),
                    group_by=op.get("group_by"), source=source,
                )
            else:
                state = op_group_by(
                    g, t, op["property"], op.get("aggregation", "COUNT"),
                    op.get("agg_property"), source=source,
                )
            state_type = None
        elif kind == "PROJECT":
            source = state if (state is not None and state_type == t) else None
            state = op_project(g, t, op["properties"], op.get("rename"), source=source)
            state_type = None
        elif kind == "JOIN":
            left = state if (state is not None and state_type == op["left_type"]) else None
            state = op_join(g, op["left_type"], op["right_type"], op["edge_type"], left=left)
            state_type = None
        else:
            raise CapabilityError(f"unknown operation type {kind!r}")
        steps.append(f"{kind}({t or op.get('edge_type', '')})")

    if state is None:
        raise ValueError("empty plan")
    return PlanResult(df=state, steps=steps)
