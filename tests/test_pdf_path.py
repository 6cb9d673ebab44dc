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


def test_mixed_corpus_resumable_byte_identical(spark, tmp_path):
    """North-star e2e: a corpus with every 5th page as a FAKEPDF layout
    doc runs through the FULL resumable pipeline (routing + lineage +
    manifests) with ZERO byte-identical-text mismatches, including after
    a simulated partial failure (deleted manifests -> resume)."""
    import shutil

    from pyspark.sql import functions as F

    from finetoo_sp_spark.datagen import gen_pages
    from finetoo_sp_spark.extraction.pdf import extract_pages_any
    from finetoo_sp_spark.sources.lineage import run_resumable_extraction

    out_dir = str(tmp_path / "mixed_out")
    pages = gen_pages(spark, 400, partitions=4, pdf_every=5)
    n_pdf = pages.filter(F.startswith(F.col("html"), F.lit(b"%PDF-"))).count()
    assert n_pdf == 400 // 5

    metrics = run_resumable_extraction(
        pages, out_dir, n_buckets=8, extractor=extract_pages_any
    )
    assert metrics["rows_out"] == 400

    result = spark.read.parquet(f"{out_dir}/data")
    joined = result.select("url", "text").join(
        pages.select("url", "expected_text"), "url"
    )
    assert joined.count() == 400
    assert joined.filter(F.col("text") != F.col("expected_text")).count() == 0

    # resume: drop two bucket manifests, re-run, still byte-identical
    for b in (0, 3):
        shutil.rmtree(f"{out_dir}/_manifests/bucket={b}", ignore_errors=True)
    m2 = run_resumable_extraction(
        pages, out_dir, n_buckets=8, extractor=extract_pages_any
    )
    assert m2["buckets_processed"] == 2
    result2 = spark.read.parquet(f"{out_dir}/data")
    j2 = result2.select("url", "text").join(pages.select("url", "expected_text"), "url")
    assert j2.filter(F.col("text") != F.col("expected_text")).count() == 0
