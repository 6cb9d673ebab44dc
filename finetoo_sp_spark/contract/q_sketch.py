"""Contract queries: distributed cardinality sketches (HLL / KMV).

New in round 4 — the approximate-distinct machinery a 100 TB crawl
needs for "distinct URLs per host" questions without a full key-space
shuffle. Both sketches use the portable 60-bit sha hash, so DuckDB
reproduces every register / kept hash / integer estimate exactly.
"""

from __future__ import annotations

from finetoo_sp_spark.contract._core import (
    DataFrame,
    SparkSession,
    F,
    T,
    _q,
)

# Synthesized URL universe with known duplication: doc_id % 700 pages
# per source host. Shared verbatim between both engines.
_URLS_SQL = """
  SELECT source AS grp,
    'https://' || source || '.example.com/page' || (doc_id % 700) AS url
  FROM documents
"""


def _urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.select(
        F.col("source").alias("grp"),
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/page"),
            (F.col("doc_id") % 700).cast("string"),
        ).alias("url"),
    )


@_q(
    "hll_sketch",
    f"""
WITH u AS ({_URLS_SQL}),
h AS (
  SELECT grp, CAST('0x' || substr(sha256(url), 1, 15) AS BIGINT) AS h FROM u
),
r AS (
  SELECT grp, h & 4095 AS bucket,
    CASE WHEN (h >> 12) = 0 THEN 49
         ELSE 49 - length(bin(h >> 12)) END AS rho
  FROM h
)
SELECT grp, CAST(bucket AS BIGINT) AS bucket,
  CAST(max(rho) AS BIGINT) AS register
FROM r GROUP BY grp, bucket""",
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse HyperLogLog register file per source host over a
    synthesized duplicated URL universe: one partially-aggregated
    max() groupBy; every register is bit-reproducible (rho via integer
    bit length, never floating log2). The oracle rebuilds the full
    register file from the same hash in SQL."""
    from finetoo_sp_spark.operators.sketch import hll_registers

    return hll_registers(_urls(spark, sf_dir), "url", "grp", p=12)


@_q(
    "kmv_distinct",
    f"""
WITH u AS ({_URLS_SQL}),
h AS (
  SELECT DISTINCT grp,
    CAST('0x' || substr(sha256(url), 1, 15) AS BIGINT) AS h FROM u
),
rn AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM h
)
SELECT grp, CAST(count(*) AS BIGINT) AS n_kept,
  CAST(max(h) AS BIGINT) AS kth_hash,
  CAST(CASE WHEN count(*) < 64 THEN count(*)
       ELSE (CAST(63 AS BIGINT) * CAST(1099511627776 AS BIGINT))
            // greatest(max(h) >> 20, 1) END AS BIGINT) AS est_distinct
FROM rn WHERE rn <= 64 GROUP BY grp""",
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-URL estimate per source host, k=64 —
    small enough that the estimator branch (not the exact-count branch)
    is live at the sf0.01 driver gate. Entirely BIGINT: the estimate is
    (k-1)*2^40 div (h_k >> 20) on both engines, identical truncation."""
    from finetoo_sp_spark.operators.sketch import kmv_distinct

    return kmv_distinct(_urls(spark, sf_dir), "url", "grp", k=64)
