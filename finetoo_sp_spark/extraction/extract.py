"""Spark-side extraction pipeline: pages DataFrame -> extracted DataFrame.

Scale design (BASELINE.json north_rule, 10^12-row design point):

- all per-page work happens inside ``mapInPandas`` over Arrow batches —
  a narrow, shuffle-free map stage that scales linearly with executors;
- optional explicit ``repartition(n, xxhash64(url))`` *before* the map
  stage defuses host-level skew (many pages per host landing in one input
  split) — the reference has no analogue (single-threaded), this is the
  job-level design SURVEY.md §4.1 calls out;
- no collect, no driver-side loops; the output is a DataFrame the caller
  writes with ``sources.lineage.write_with_manifests``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from finetoo_sp_spark.extraction.kernel import extract_batch

SPAN_TYPE = StructType(
    [
        StructField("start", LongType(), False),
        StructField("end", LongType(), False),
        StructField("tag", StringType(), True),
    ]
)

EXTRACT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("text", StringType(), False),
        StructField("spans", ArrayType(SPAN_TYPE), False),
        StructField("title", StringType(), True),
        StructField("h1", StringType(), True),
        StructField("lang_attr", StringType(), True),
        StructField("n_blocks", LongType(), False),
        StructField("n_content_blocks", LongType(), False),
        StructField("content_chars", LongType(), False),
    ]
)


def url_salt(
    n_buckets: int, url: Column | str = "url", hash_mode: str = "xxhash64"
) -> Column:
    """Deterministic bucket id: ``pmod(hash(url), n_buckets)``.

    Used both for skew-defusing repartition and for lineage-manifest
    partitioning (resume granularity). ``hash_mode='sha'`` uses the
    sha256-derived 60-bit hash that DuckDB can reproduce — the
    verification mode that lets the manifest table itself sit under a
    value oracle; production keeps xxhash64.
    """
    c = F.col(url) if isinstance(url, str) else url
    if hash_mode == "sha":
        h = F.conv(F.substring(F.sha2(c, 256), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(c)
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def extract_pages(
    pages: DataFrame,
    repartition_buckets: int | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Run the vectorized extraction kernel over a pages table.

    ``pages`` needs columns (url:string, html:binary|string); any
    ``keep_cols`` (e.g. warc_ts, lang) are passed through unchanged.

    ``repartition_buckets``: if set, hash-repartition on xxhash64(url)
    first — the explicit skew salt required by the north rule. Leave None
    for small/benchmark runs where input splits are already balanced.
    """
    keep_cols = keep_cols or []
    src = pages.select("url", "html", *keep_cols)
    if repartition_buckets:
        src = src.repartition(repartition_buckets, url_salt(repartition_buckets))

    out_schema = StructType(
        EXTRACT_SCHEMA.fields
        + [pages.schema[c] for c in keep_cols]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            res = extract_batch(pdf["url"], pdf["html"])
            for c in keep_cols:
                res[c] = pdf[c].reset_index(drop=True)
            yield res

    return src.mapInPandas(run, schema=out_schema)


def extract_pages_sniffed(
    pages: DataFrame,
    repartition_buckets: int | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """``extract_pages`` drop-in whose decode step is the WHATWG
    charset sniff (extraction/charset.py) instead of utf-8-only —
    the extractor to plug into ``run_resumable_extraction(extractor=)``
    for corpora with legacy-encoded pages. Sniff + decode + tokenize +
    classify run FUSED in one Arrow kernel (no intermediate re-encode,
    no second mapInPandas); the detected ``charset`` is appended as an
    output column so downstream audits can stratify by encoding.
    """
    from finetoo_sp_spark.extraction.charset import sniff_decode_pandas

    keep_cols = keep_cols or []
    src = pages.select("url", "html", *keep_cols)
    if repartition_buckets:
        src = src.repartition(repartition_buckets, url_salt(repartition_buckets))

    out_schema = StructType(
        EXTRACT_SCHEMA.fields
        + [StructField("charset", StringType(), True)]
        + [pages.schema[c] for c in keep_cols]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            sniffed = sniff_decode_pandas(pdf["html"])
            res = extract_batch(pdf["url"], sniffed["text"])
            res["charset"] = sniffed["charset"].reset_index(drop=True)
            for c in keep_cols:
                res[c] = pdf[c].reset_index(drop=True)
            yield res

    return src.mapInPandas(run, schema=out_schema)
