"""NL-front-end scaffolding: prompt content + QueryResponse assembly
(reference: query_service.cc:18-101 BuildPrompt, :208-268 ProcessQuery)."""

from __future__ import annotations

import json

from finetoo_sp_spark.plans.frontend import build_prompt, process_plan
from finetoo_sp_spark.schema.registry import web_graph_schema


def test_prompt_contains_schema_surface():
    p = build_prompt(web_graph_schema())
    # node types, properties, capability flags
    assert "- page:" in p and "- block:" in p
    assert "url (string) [unique, indexed]" in p
    assert "n_words (int64) [indexed, comparable, aggregable]" in p
    # edges with endpoints
    assert "- CONTAINS: page -> block" in p
    assert "- LINKS_TO: page -> page" in p
    # op templates as valid JSON lines + format instruction
    assert '{"operations":' in p
    tmpl_lines = [ln for ln in p.splitlines() if ln.startswith('{"type"')]
    assert len(tmpl_lines) == 3
    for ln in tmpl_lines:
        json.loads(ln)


def test_prompt_deterministic():
    assert build_prompt(web_graph_schema()) == build_prompt(web_graph_schema())


def test_process_plan_assembles_response(spark):
    from finetoo_sp_spark.contract import tpch_graph

    g = tpch_graph(spark, "/root/testdata/sf0.001")
    raw = """```json
{"operations": [
  {"type": "FILTER", "target_type": "orders", "property": "o_orderpriority",
   "predicate": "EQUALS", "value": "1-URGENT"},
  {"type": "GROUP_BY", "target_type": "orders", "property": "o_orderstatus"}
]}
```"""
    resp = process_plan(g, raw)
    assert resp.steps == ["FILTER(orders)", "GROUP_BY(orders)"]
    assert resp.plan[0]["type"] == "FILTER"
    assert resp.elapsed_ms > 0
    # answer header carries the result columns; at least one data row
    header, *rows = resp.answer.splitlines()
    assert header == "o_orderstatus | count_nodes"
    assert rows
    # lazy mode triggers no action and renders no answer
    lazy = process_plan(g, resp.plan, materialize=False)
    assert lazy.answer == "" and lazy.df.columns == resp.df.columns
