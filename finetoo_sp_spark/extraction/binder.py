"""Binder generation: grouped, ordered multi-page export manifests.

Reference surface: BinderConfig (proto/graph.proto:360-383) — the
reference's multi-format export direction assembles drawings into a PDF
binder with a configured page order (README.md:143 "Multi-format export
(DXF, PDF, CSV)"). The web analogue: group extracted pages into
"binders" (one per configured group key), order pages deterministically
within each binder, and emit a manifest row per binder carrying the
ordered page list and a combined content hash — the artifact a
downstream PDF/print renderer consumes.

Scale shape: ONE groupBy on the binder key; the page ordering is
`sort_array(collect_list(struct(order, ...)))` inside the aggregate
(the E3 determinism discipline — partition-order-proof), so the binder
hash is byte-stable under any partitioning. Binder groups are
host/source-sized; a pathological giant group is capped by
``max_pages`` (head of the sorted list) rather than collected.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BinderConfig:
    """What the reference's BinderConfig declares: grouping, ordering,
    size cap, and title template for each assembled binder."""

    group_col: str = "source"
    order_col: str = "url"
    text_col: str = "text"
    max_pages: int | None = None
    title_prefix: str = "Binder"


def build_binder_manifest(pages: DataFrame, cfg: BinderConfig | None = None) -> DataFrame:
    """One row per binder: (binder_id, title, n_pages, binder_sha,
    first_url, last_url).

    ``binder_sha`` = sha256 over the pages' content hashes concatenated
    in ``order_col`` order — the binder-level analogue of the
    block-content hash (reference: block_analyzer.cc:22-30 sorted
    hashing), so two binders are byte-equal iff every page is.
    """
    cfg = cfg or BinderConfig()
    g, o = cfg.group_col, cfg.order_col
    per_page = pages.select(
        F.col(g).alias("binder_id"),
        F.col(o).alias("ord"),
        F.sha2(F.col(cfg.text_col), 256).alias("page_sha"),
    )
    pl = F.sort_array(F.collect_list(F.struct(F.col("ord"), F.col("page_sha"))))
    if cfg.max_pages is not None:
        pl = F.slice(pl, 1, cfg.max_pages)
    agg = per_page.groupBy("binder_id").agg(pl.alias("page_list"))
    return agg.select(
        "binder_id",
        F.concat(F.lit(cfg.title_prefix + " "), F.col("binder_id")).alias("title"),
        F.size("page_list").cast("long").alias("n_pages"),
        F.sha2(
            F.concat_ws("", F.transform("page_list", lambda x: x["page_sha"])), 256
        ).alias("binder_sha"),
        F.element_at(F.col("page_list"), 1)["ord"].alias("first_url"),
        F.element_at(F.col("page_list"), -1)["ord"].alias("last_url"),
    )
