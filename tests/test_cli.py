"""CLI entry points smoke (the reference's tools/ binaries analogue)."""

from __future__ import annotations

import json
import sys


def test_cli_report_and_query(spark, sf_dir, tmp_path, capsys):
    sys.path.insert(0, "tools")
    import finetoo_cli

    finetoo_cli.cmd_report(spark, [sf_dir])
    out = capsys.readouterr().out
    assert "pages: 500" in out
    assert "block-type histogram" in out
    assert "h1" in out

    plan = tmp_path / "plan.json"
    plan.write_text(
        json.dumps(
            {
                "operations": [
                    {
                        "type": "FILTER",
                        "target_type": "block",
                        "property": "n_words",
                        "predicate": "GT",
                        "value": 10,
                    },
                    {"type": "GROUP_BY", "target_type": "block", "property": "tag"},
                ]
            }
        )
    )
    finetoo_cli.cmd_query(spark, [sf_dir, str(plan)])
    out = capsys.readouterr().out
    assert "FILTER(block) -> GROUP_BY(block)" in out


def test_cli_ask_full_nl_loop(spark, sf_dir, tmp_path, capsys):
    """The demo_llm_bom analogue: NL question + canned planner reply
    (prose + fenced JSON) -> answer_query -> printed QueryResponse."""
    import tools.finetoo_cli as finetoo_cli

    reply = tmp_path / "planner_reply.txt"
    reply.write_text(
        "Sure, here's the plan:\n```json\n"
        '{"operations": [\n'
        ' {"type": "FILTER", "target_type": "block", "property": "is_content",\n'
        '  "predicate": "EQUALS", "value": true},\n'
        ' {"type": "GROUP_BY", "target_type": "block", "property": "tag"}\n'
        "]}\n```\n"
    )
    finetoo_cli.cmd_ask(spark, [sf_dir, "count content blocks by tag", str(reply)])
    out = capsys.readouterr().out
    assert "steps: FILTER(block) -> GROUP_BY(block)" in out
    assert "tag | count_nodes" in out
