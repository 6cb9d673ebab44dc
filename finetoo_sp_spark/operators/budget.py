"""Crawl-budget apportionment (Hamilton largest-remainder method).

Training-pipeline extension (no reference analogue): a recrawl or
ingestion round has a fixed page budget and must split it across hosts
(or domains, or languages) proportionally to a weight — page count,
quality mass, churn rate. Naive ``round(total * w / W)`` over- or
under-shoots the total; the Hamilton / largest-remainder method is the
classic exact apportionment: every key gets ``floor(total * w / W)``,
and the ``total - sum(floors)`` leftover units go one each to the keys
with the largest remainders (ties broken by key for determinism).

Everything is integer arithmetic on BIGINTs — quota floors are
``(total * w) div W`` and remainders ``(total * w) % W`` — so the
allocation is exact (sums to ``total`` by construction), partition-
order independent, and reproducible by a DuckDB oracle bit-for-bit.

Scale story: the input is already a per-key aggregate (dimension-sized,
|hosts| rows, not |pages|); one broadcast of the scalar weight sum, one
window rank over the dimension. Never touches page-grain data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def allocate_budget(
    keys: DataFrame, key_col: str, weight_col: str, total: int
) -> DataFrame:
    """(key, weight, alloc) — Hamilton apportionment of ``total`` units
    proportional to ``weight_col`` (non-negative longs; zero-weight keys
    get 0). sum(alloc) == total exactly whenever sum(weight) > 0."""
    k = keys.select(
        F.col(key_col).alias("key"), F.col(weight_col).cast("long").alias("weight")
    )
    tot = k.agg(F.sum("weight").alias("_w_total"))
    staged = k.crossJoin(F.broadcast(tot)).select(
        "key",
        "weight",
        F.expr(f"({int(total)} * weight) div _w_total").alias("_base"),
        F.expr(f"({int(total)} * weight) % _w_total").alias("_rem"),
    )
    w = Window.orderBy(F.col("_rem").desc(), F.col("key").asc())
    leftover = F.lit(int(total)) - F.sum("_base").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return staged.select(
        "key",
        "weight",
        (
            F.col("_base")
            + (F.row_number().over(w) <= leftover).cast("long")
        ).alias("alloc"),
    )
