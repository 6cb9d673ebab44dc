"""sitemaps.org XML parsing: sitemap documents -> typed URL-frontier rows.

The discovery-side complement to robots.txt (sources/robots.py gates
what a crawler MAY fetch; sitemaps enumerate what a host WANTS fetched,
with freshness hints). Parsing is three JVM regexp passes over the XML
string — the same declarative extract/posexplode shape as
extraction/tables.py — so the plan is a fully narrow projection:
no UDF, no shuffle, linear in input bytes.

A real crawl stores fetched sitemap bodies as (host, sitemap_xml) rows;
<sitemapindex> files simply yield more sitemap URLs to fetch and land
back in the same table, so the parser here handles the <urlset> leaf
format plus index detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tag(block, name: str):
    """Inner text of <name>...</name> within a url block ('' if absent)."""
    return F.regexp_extract(block, rf"(?s)<{name}>\s*(.*?)\s*</{name}>", 1)


def parse_sitemaps(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Parse <urlset> sitemap bodies into one typed row per <url> entry.

    Returns (host, loc, lastmod:date, changefreq, priority_ppm:long):
    lastmod is NULL when absent or unparseable (try-cast semantics),
    priority is exposed as integer parts-per-million (decimal parse,
    never a float round-trip), changefreq '' -> NULL. <sitemapindex>
    bodies yield zero rows here — their <sitemap><loc> children are new
    sitemap fetch targets, surfaced by :func:`index_entries`.
    """
    blocks = F.expr(f"regexp_extract_all({xml_col}, '(?s)<url>(.*?)</url>', 1)")
    e = df.select(
        F.col(host_col).alias("host"), F.explode(blocks).alias("_b")
    )
    return e.select(
        "host",
        _tag(F.col("_b"), "loc").alias("loc"),
        F.try_to_timestamp(
            F.nullif(_tag(F.col("_b"), "lastmod"), F.lit("")),
            F.lit("yyyy-MM-dd"),
        )
        .cast("date")
        .alias("lastmod"),
        F.nullif(_tag(F.col("_b"), "changefreq"), F.lit("")).alias("changefreq"),
        (
            F.nullif(_tag(F.col("_b"), "priority"), F.lit("")).try_cast(
                "decimal(10,6)"
            )
            * 1000000
        )
        .cast("long")
        .alias("priority_ppm"),
    ).filter(F.col("loc") != "")


def index_entries(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, sitemap_loc) children of <sitemapindex> bodies — the next
    round of sitemap fetches (the crawl loop unions them back into the
    fetch frontier)."""
    blocks = F.expr(
        f"regexp_extract_all({xml_col}, '(?s)<sitemap>(.*?)</sitemap>', 1)"
    )
    return (
        df.select(F.col(host_col).alias("host"), F.explode(blocks).alias("_b"))
        .select("host", _tag(F.col("_b"), "loc").alias("sitemap_loc"))
        .filter(F.col("sitemap_loc") != "")
    )
