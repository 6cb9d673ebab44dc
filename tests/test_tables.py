"""HTML table extraction (extraction/tables.py)."""

from finetoo_sp_spark.extraction.tables import extract_tables


def _rows(spark, pages):
    df = spark.createDataFrame(pages, "url string, html string")
    return sorted(map(tuple, extract_tables(df).collect()))


def test_multi_table_indices_and_tag_strip(spark):
    html = (
        '<html><body><TABLE class="x"><tr><th>a</th><th>b</th></tr>'
        "<tr><td> 1 </td><td><b>2</b></td></tr></TABLE><p>no</p>"
        "<table><tr><td>z</td></tr></table></body></html>"
    )
    assert _rows(spark, [("u", html)]) == [
        ("u", 0, 0, 0, "a"),
        ("u", 0, 0, 1, "b"),
        ("u", 0, 1, 0, "1"),
        ("u", 0, 1, 1, "2"),
        ("u", 1, 0, 0, "z"),
    ]


def test_tableless_page_contributes_nothing(spark):
    assert _rows(spark, [("u", "<html><body><p>x</p></body></html>")]) == []


def test_multiline_markup_and_binary_html(spark):
    html = "<table>\n<tr>\n<td>v1</td>\n<td>v2</td>\n</tr>\n</table>"
    df = spark.createDataFrame(
        [("u", html.encode("utf-8"))], "url string, html binary"
    )
    out = sorted(map(tuple, extract_tables(df).collect()))
    assert out == [("u", 0, 0, 0, "v1"), ("u", 0, 0, 1, "v2")]


def test_nested_table_markup_is_stripped_not_recursed(spark):
    html = "<table><tr><td>outer <table><tr><td>inner</td></tr></table></td></tr></table>"
    out = _rows(spark, [("u", html)])
    # documented limit: one cell, inner markup stripped to its text
    assert out == [("u", 0, 0, 0, "outer inner")]
