"""Markdown rendering: hand-pinned fixtures beyond the oracle corpus
(deep heading levels, dt, boilerplate-only pages) + the Spark wrapper."""

import pandas as pd

from finetoo_sp_spark.extraction.markdown import extract_markdown, markdown_batch


def _render(html: str) -> tuple[str, int]:
    out = markdown_batch(
        pd.Series(["https://x.example.com/1"]), pd.Series([html.encode()])
    )
    return out["markdown"].iloc[0], int(out["n_content_blocks"].iloc[0])


TEN = "these are exactly ten plain words for the threshold rule"


def test_heading_ladder_and_quote():
    html = (
        "<body><h1>alpha</h1><h3>beta gamma</h3><h6>zeta</h6>"
        f"<p>{TEN}</p>"
        f"<blockquote>{TEN} indeed</blockquote></body>"
    )
    md, n = _render(html)
    assert md == (
        "# alpha\n\n### beta gamma\n\n###### zeta\n\n"
        f"{TEN}\n\n> {TEN} indeed"
    )
    assert n == 5


def test_list_and_definition_terms():
    html = (
        f"<ul><li>{TEN} one</li><li>{TEN} two</li></ul>"
        f"<dl><dt>{TEN} term</dt><dd>{TEN} definition</dd></dl>"
    )
    md, n = _render(html)
    assert md == (
        f"- {TEN} one\n\n- {TEN} two\n\n- {TEN} term\n\n{TEN} definition"
    )
    assert n == 4


def test_boilerplate_only_page_renders_empty():
    md, n = _render('<nav><a href="/">home</a> <a href="/b">b</a></nav>')
    assert md == "" and n == 0
    # Short non-heading text stays out; a 1-word heading stays in.
    md2, n2 = _render("<p>too short</p><h2>kept</h2>")
    assert md2 == "## kept" and n2 == 1


def test_spark_wrapper_matches_kernel(spark):
    htmls = [
        f"<h1>t{i}</h1><p>{TEN} row {i}</p>".encode() for i in range(6)
    ]
    df = spark.createDataFrame(
        [(f"https://h/{i}", h) for i, h in enumerate(htmls)],
        "url string, html binary",
    )
    rows = {r["url"]: r for r in extract_markdown(df).collect()}
    for i in range(6):
        assert rows[f"https://h/{i}"]["markdown"] == (
            f"# t{i}\n\n{TEN} row {i}"
        )
        assert rows[f"https://h/{i}"]["n_content_blocks"] == 2
