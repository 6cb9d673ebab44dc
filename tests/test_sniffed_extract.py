"""Fused sniffing extractor: parity with the two-stage path, and the
resumable production pipeline running with extractor=extract_pages_sniffed."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from finetoo_sp_spark.extraction.extract import (
    extract_pages,
    extract_pages_sniffed,
)


def _legacy_pages(spark, n=24):
    from finetoo_sp_spark.datagen import gen_pages

    # Re-encode the utf-8 corpus as declared ISO-8859-1 (ascii bodies:
    # byte-identical text either way, but the DECODE PATH is the legacy
    # one and the charset column must say so).
    pages = gen_pages(spark, n).select(
        "url",
        F.encode(
            F.concat(
                F.lit('<meta charset="iso-8859-1">'),
                F.decode("html", "UTF-8"),
            ),
            "ISO-8859-1",
        ).alias("html"),
        "expected_text",
    )
    return pages


def test_fused_matches_two_stage(spark):
    from finetoo_sp_spark.extraction.charset import decode_pages

    pages = _legacy_pages(spark).cache()
    fused = {
        r["url"]: (r["text"], r["charset"], r["title"])
        for r in extract_pages_sniffed(pages).collect()
    }
    dec = decode_pages(pages, passthrough=("url",))
    redec = dec.select(
        "url", F.encode("text", "UTF-8").alias("html"), "charset"
    )
    staged = {
        r["url"]: (r["text"], r["charset"], r["title"])
        for r in extract_pages(redec, keep_cols=["charset"]).collect()
    }
    assert fused == staged
    assert all(v[1] == "windows-1252" for v in fused.values())
    pages.unpersist()


def test_resumable_pipeline_with_sniffing_extractor(spark, tmp_path):
    from finetoo_sp_spark.sources.lineage import run_resumable_extraction

    pages = _legacy_pages(spark, n=30).cache()
    out = str(tmp_path / "out")
    m = run_resumable_extraction(
        pages, out, n_buckets=8, extractor=extract_pages_sniffed
    )
    assert m["rows_out"] == 30 and m["buckets_processed"] > 0
    got = spark.read.parquet(out)
    assert "charset" in got.columns
    joined = got.select("url", F.col("text").alias("got_text")).join(
        pages.select("url", F.col("expected_text").alias("exp_text")), "url"
    )
    assert joined.count() == 30
    assert joined.filter(F.col("got_text") != F.col("exp_text")).count() == 0
    # Resume: nothing left to do, nothing recomputed.
    m2 = run_resumable_extraction(
        pages, out, n_buckets=8, extractor=extract_pages_sniffed
    )
    assert m2["rows_out"] == 0 and m2["buckets_processed"] == 0
    pages.unpersist()
