"""Recrawl planning: conditional-GET economics for a recurring crawl.

Refetching everything every round is the single largest avoidable cost
of a recurring crawl — most pages don't change, and HTTP already
provides the machinery to pay almost nothing for them: a conditional
GET with ``If-None-Match`` (ETag) or ``If-Modified-Since`` costs a
304 instead of a body. This operator turns the previous snapshot's
validators plus freshness signals (sitemap/feed ``lastmod``) into a
per-URL action plan:

1. a lastmod signal NEWER than our fetch -> ``fetch`` (known stale;
   conditional headers would just waste a round trip),
2. an ETag on file -> ``revalidate`` with ``if-none-match`` (ETag
   beats Last-Modified per RFC 9110 §13.1.3 when both exist),
3. a Last-Modified on file -> ``revalidate`` with ``if-modified-since``,
4. no validators and older than the age budget -> ``fetch``,
5. otherwise ``skip`` (young enough to trust).

One left join of the snapshot against the (dimension-sized) lastmod
signal table + a narrow CASE chain — no window, no skew. The output
is exactly what the frontier scheduler (operators/frontier.py)
consumes as its next round's input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recrawl_plan(
    snapshot: DataFrame,
    lastmods: DataFrame,
    now_epoch_s: int,
    max_age_s: int,
) -> DataFrame:
    """(url, action, cond_header, cond_value) per snapshot row.

    snapshot: (url, fetched_at:long epoch-s, etag:string|null,
    last_modified:string|null). lastmods: (url, lastmod:long epoch-s)
    freshness signals (sitemap <lastmod>, feed pubDate — absent URLs
    simply have no signal). action in fetch/revalidate/skip;
    cond_header/cond_value carry the conditional request header for
    revalidations ('' otherwise).
    """
    j = snapshot.join(lastmods.select("url", "lastmod"), "url", "left")
    stale_signal = F.col("lastmod").isNotNull() & (
        F.col("lastmod") > F.col("fetched_at")
    )
    has_etag = F.col("etag").isNotNull() & (F.col("etag") != "")
    has_lm = F.col("last_modified").isNotNull() & (F.col("last_modified") != "")
    too_old = (F.lit(int(now_epoch_s)) - F.col("fetched_at")) > int(max_age_s)
    action = (
        F.when(stale_signal, F.lit("fetch"))
        .when(has_etag | has_lm, F.lit("revalidate"))
        .when(too_old, F.lit("fetch"))
        .otherwise(F.lit("skip"))
    )
    header = F.when(
        ~stale_signal & has_etag, F.lit("if-none-match")
    ).when(~stale_signal & has_lm, F.lit("if-modified-since")).otherwise(F.lit(""))
    value = (
        F.when(~stale_signal & has_etag, F.col("etag"))
        .when(~stale_signal & has_lm, F.col("last_modified"))
        .otherwise(F.lit(""))
    )
    return j.select(
        "url",
        action.alias("action"),
        header.alias("cond_header"),
        value.alias("cond_value"),
    )
