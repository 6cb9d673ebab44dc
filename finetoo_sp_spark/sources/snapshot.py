"""Crawl-snapshot delta: what changed between two crawls of the web.

At the 10^12-page design point, re-extracting the whole corpus for
every crawl snapshot is the single biggest avoidable cost — crawl churn
is typically a few percent, so the winning pipeline is

    delta = snapshot_delta(prev_pages, next_pages)   # url-level status
    work  = changed_pages(prev_pages, next_pages)    # added+changed only
    run_resumable_extraction(work, ...)              # pay for churn only

Semantics (url is the snapshot key; one row per url per snapshot):

* ``added``     — url present only in the new snapshot;
* ``removed``   — url present only in the old snapshot;
* ``changed``   — present in both, payload fingerprint differs;
* ``unchanged`` — present in both, payload fingerprint equal.

Scale shape: both helpers project each snapshot down to
``(url, xxhash64(payload))`` BEFORE any join, so the shuffle moves ~24
bytes per page, never the html payload. ``changed_pages`` then joins the
old side's slim hash dimension into the new snapshot — one equi-join on
url. With snapshots written through the lineage layout (bucketed by
hash(url), sources/lineage.py) both joins are bucket-local and the
whole delta is shuffle-free; without bucketing it is one co-partitioned
sort-merge exchange per side, still payload-free. No driver-side state,
no collect.

The fingerprint defaults to ``xxhash64`` of the raw payload column —
change *detection* needs speed, not cryptographic strength (a false
"unchanged" needs a 64-bit collision on the SAME url between two
crawls). Pass ``fingerprint_col`` to compare on extracted text or a
stored content sha instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _slim(pages: DataFrame, key: str, fingerprint_col: Column | None, alias: str) -> DataFrame:
    fp = fingerprint_col if fingerprint_col is not None else F.xxhash64("html")
    return pages.select(F.col(key).alias(key), fp.alias(alias))


def snapshot_delta(
    old_pages: DataFrame,
    new_pages: DataFrame,
    key: str = "url",
    fingerprint_col: Column | None = None,
) -> DataFrame:
    """(url, status) for every url in either snapshot — status in
    {added, removed, changed, unchanged}. One full-outer equi-join over
    the slim (url, hash) projections."""
    o = _slim(old_pages, key, fingerprint_col, "_h_old")
    n = _slim(new_pages, key, fingerprint_col, "_h_new")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, key, "full_outer").select(key, status.alias("status"))


def changed_pages(
    old_pages: DataFrame,
    new_pages: DataFrame,
    key: str = "url",
    fingerprint_col: Column | None = None,
) -> DataFrame:
    """The new snapshot restricted to urls that need (re-)extraction:
    added or changed vs the old snapshot. Returns new_pages rows
    unchanged (all columns). The old side joins in as a slim hash
    dimension, so only the fingerprints shuffle — the html payload of
    the new snapshot moves once, into its own extraction."""
    fp = fingerprint_col if fingerprint_col is not None else F.xxhash64("html")
    o = _slim(old_pages, key, fingerprint_col, "_h_old")
    n = new_pages.withColumn("_h_new", fp)
    return (
        n.join(o, key, "left_outer")
        .filter(F.col("_h_old").isNull() | (F.col("_h_old") != F.col("_h_new")))
        .drop("_h_old", "_h_new")
    )


def merge_extracted(
    old_extracted: DataFrame,
    delta_extracted: DataFrame,
    delta: DataFrame,
    key: str = "url",
) -> DataFrame:
    """Previous snapshot's extracted corpus + this snapshot's churn-only
    extraction -> the full extracted corpus of the new snapshot, without
    ever re-extracting an unchanged page:

        merged = (old_extracted MINUS removed/changed urls) UNION delta_extracted

    ``delta`` is snapshot_delta's (url, status) frame. The anti-join's
    right side is churn-sized (typically a few percent of the corpus),
    so Spark broadcasts it when it fits and the old output never
    shuffles; with both extraction outputs in the lineage bucket layout
    the union preserves bucketing for downstream consumers. Byte
    identity of the merge vs a full re-extraction is pinned by
    tests/test_snapshot.py.
    """
    stale = delta.filter(F.col("status").isin("removed", "changed")).select(key)
    return old_extracted.join(stale, key, "left_anti").unionByName(delta_extracted)
