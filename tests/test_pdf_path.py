"""PDF layout-analysis path: reading order, block segmentation, routing."""

from __future__ import annotations

import pandas as pd
import pytest

from finetoo_sp_spark.extraction.pdf import (
    extract_pdf_batch,
    make_fake_pdf,
)


@pytest.fixture()
def payload():
    # two pages; fragments deliberately out of reading order
    return make_fake_pdf(
        [
            (0, 300.0, 700.0, "right header"),
            (0, 72.0, 700.0, "left header"),
            (0, 72.0, 600.0, "body paragraph one"),
            (0, 72.0, 590.0, "continues close below"),
            (1, 72.0, 700.0, "second page"),
        ]
    )


def test_reading_order_and_blocks(payload):
    out = extract_pdf_batch(pd.Series(["u"]), pd.Series([payload]))
    r = out.iloc[0]
    # same-y fragments join left->right; y-gap starts a new block; page break too
    assert r["text"] == "left header right header\nbody paragraph one continues close below\nsecond page"
    assert r["n_blocks"] == 3
    assert r["content_chars"] == len(r["text"]) - 2


def test_unknown_binary_yields_empty_not_error():
    out = extract_pdf_batch(pd.Series(["u"]), pd.Series([b"\x89PNG not a pdf"]))
    assert out.iloc[0]["text"] == ""
    assert out.iloc[0]["n_blocks"] == 0


def test_deterministic(payload):
    a = extract_pdf_batch(pd.Series(["u"]), pd.Series([payload]))
    b = extract_pdf_batch(pd.Series(["u"]), pd.Series([payload]))
    pd.testing.assert_frame_equal(a, b)


def test_spark_routing_union(spark):
    from finetoo_sp_spark.extraction.pdf import extract_pages_any

    html = b"<html><body><h1>Hello Page</h1><p>" + b"word " * 12 + b"</p></body></html>"
    rows = [
        ("https://a/html", bytearray(html)),
        ("https://b/pdf", bytearray(make_fake_pdf([(0, 10.0, 100.0, "pdf text block")]))),
    ]
    pages = spark.createDataFrame(rows, ["url", "html"])
    out = {r["url"]: r for r in extract_pages_any(pages).collect()}
    assert out["https://b/pdf"]["text"] == "pdf text block"
    assert out["https://a/html"]["text"].startswith("Hello Page")
    assert set(out["https://a/html"].asDict()) == set(out["https://b/pdf"].asDict())
