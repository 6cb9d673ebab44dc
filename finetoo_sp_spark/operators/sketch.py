"""Distributed cardinality sketches: HyperLogLog registers + KMV.

The 100 TB motivation: "how many distinct URLs / users / shingles per
group" is the first question every crawl and dedup job asks, and exact
``count(DISTINCT ...)`` is a full shuffle of the key space. Sketches cut
that to a bounded per-group state that merges associatively — the same
reason Spark ships approx_count_distinct (HLL++) and Iceberg stores
theta sketches in manifests.

Why not just call ``approx_count_distinct``: its register layout and
hash are JVM-internal, so results are not reproducible outside Spark
and the sketch itself is not exportable. Both operators below use the
repo's portable 60-bit sha hash (operators/dedup.sha60 == the oracle's
_H60), making every register and estimate bit-reproducible in DuckDB —
the sketches can be persisted next to the data and merged by ANY engine
(the Iceberg-manifest discipline, not a Spark-private blob).

Scale shapes:
- ``hll_registers``: one partially-aggregated groupBy on
  (group, bucket) — max() combines map-side, shuffle carries at most
  m=2^p longs per group per partition. Merging two corpora's sketches
  is an elementwise max (tested). Insert is idempotent, so no distinct
  pre-pass is needed.
- ``kmv_distinct``: distinct (group, hash) then a per-group k-smallest
  cut. The estimate ((k-1) * 2^60 / h_k) is computed entirely in BIGINT
  (rescaled by 2^20 so (k-1)*2^40 never overflows) — identical integer
  division in both engines, no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from finetoo_sp_spark.operators.dedup import sha60

HASH_BITS = 60


def hll_registers(df: DataFrame, key_col: str, group_col: str, p: int = 12) -> DataFrame:
    """(group, bucket, register) — sparse HyperLogLog register file per
    group (Flajolet 2007): bucket = low p bits of the 60-bit hash,
    register = max over keys of (#leading zeros of the remaining
    60-p bits) + 1. Buckets no key hashed into are simply absent
    (register 0 by convention) — the sparse representation HLL++
    formalized. rho is computed exactly via the bit length of the
    remaining hash value (length(bin(w))), never floating log2.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    m = 1 << p
    rem = HASH_BITS - p
    h = sha60(key_col)
    w = F.shiftrightunsigned(h, p)
    rho = F.when(w == 0, F.lit(rem + 1)).otherwise(F.lit(rem + 1) - F.length(F.bin(w)))
    return (
        df.select(
            F.col(group_col).alias("grp"),
            h.bitwiseAND(F.lit(m - 1)).cast("long").alias("bucket"),
            rho.cast("long").alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate_py(registers: list[tuple[int, int]], p: int = 12) -> float:
    """Driver-side HLL estimate from collected (bucket, register) pairs
    — the read-out path (floats are fine here: the sketch itself is the
    exact, mergeable artifact; the estimate is a display value).
    Includes the small-range linear-counting correction."""
    import math

    m = 1 << p
    regs = dict(registers)
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / s
    zeros = m - len(regs)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


def kmv_distinct(df: DataFrame, key_col: str, group_col: str, k: int = 256) -> DataFrame:
    """(grp, n_kept, kth_hash, est_distinct) — K-minimum-values distinct
    estimate per group (Bar-Yossef 2002): keep the k smallest distinct
    hashes; if fewer than k exist the count is exact, else
    est = (k-1) * 2^60 / h_k, evaluated as
    (k-1) * 2^40 div (h_k >> 20) so every intermediate fits a BIGINT.

    The kept set is the sketch: union-merging two groups' sets and
    re-cutting to k is the distributed combine (tested).
    """
    if not 2 <= k <= (1 << 22):
        raise ValueError(f"k must be in [2, 2^22], got {k}")
    hashes = df.select(F.col(group_col).alias("grp"), sha60(key_col).alias("h")).distinct()
    win = Window.partitionBy("grp").orderBy("h")
    kept = hashes.withColumn("rn", F.row_number().over(win)).filter(F.col("rn") <= k)
    agg = kept.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth_hash")
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(f"CAST({k - 1} AS BIGINT) * {1 << 40} div greatest(kth_hash >> 20, 1)")
    )
    return agg.select("grp", "n_kept", "kth_hash", est.cast("long").alias("est_distinct"))
