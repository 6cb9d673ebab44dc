"""Per-partition lineage manifests + checkpoint resume.

North-rule requirement: "writes extracted rows back with per-partition
lineage manifests and extraction-rate metrics so any failed partition range
can be resumed from checkpoint without recompute."

Design (scale-sane — no driver-side per-bucket loops):

1. every row gets a deterministic ``bucket = pmod(xxhash64(url), B)``;
2. output is written ``partitionBy("bucket")`` (idempotent per-bucket
   dynamic overwrite — a re-run of a bucket replaces exactly that bucket);
3. a *manifest* table (one row per bucket: input_count, output_count,
   content checksum, status='committed') is computed as a single
   ``groupBy(bucket)`` aggregation over the just-written data and appended
   atomically per bucket (one file per bucket under ``_manifests/``);
4. resume = anti-join the full bucket domain against committed manifest
   buckets, re-run only the missing buckets' rows.

The checksum is an order-independent 64-bit fold (``bit_xor`` of
``xxhash64(url, text)``) so it is partition-order-proof — the
same determinism discipline the reference needs for block hashes
(reference: src/graph/block_analyzer.cc:22-30 sorted-by-handle hashing).

On a real cluster the output table would be Iceberg
(``df.writeTo(...).append()`` with atomic snapshot commits); in this
sandbox we use the parquet directory layout + per-bucket manifest files,
which gives the same resume semantics (a bucket is committed iff its
manifest file exists).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finetoo_sp_spark.extraction.extract import extract_pages, url_salt

MANIFEST_DIRNAME = "_manifests"


def _manifest_frame(result: DataFrame, input_counts: DataFrame) -> DataFrame:
    """One row per bucket: counts + order-independent content checksum."""
    out = result.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("output_count"),
        # XOR-fold of row hashes -> order/partition independent, no overflow
        F.bit_xor(F.xxhash64("url", "text")).alias("content_checksum"),
        F.sum(F.length("text")).alias("output_chars"),
    )
    return (
        input_counts.join(out, "bucket", "left")
        .select(
            "bucket",
            "input_count",
            F.coalesce("output_count", F.lit(0)).alias("output_count"),
            F.coalesce("content_checksum", F.lit(0)).alias("content_checksum"),
            F.coalesce("output_chars", F.lit(0)).alias("output_chars"),
            F.lit("committed").alias("status"),
        )
    )


def read_manifests(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, MANIFEST_DIRNAME)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def write_with_manifests(result: DataFrame, out_dir: str) -> None:
    """Write a bucketed result + its manifest rows.

    ``result`` must carry a ``bucket`` column. Data lands under
    ``out_dir/data`` partitioned by bucket via *dynamic partition
    overwrite* — re-running a bucket (e.g. after a mid-write failure)
    replaces exactly that bucket's files, never duplicates them. Manifests
    land under ``out_dir/_manifests`` (manifest presence == commit marker
    for that bucket; written only after the data commit succeeds).
    """
    spark = result.sparkSession
    data_path = os.path.join(out_dir, "data")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    result.write.mode("overwrite").partitionBy("bucket").parquet(data_path)

    input_counts = result.groupBy("bucket").agg(F.count(F.lit(1)).alias("input_count"))
    written = spark.read.parquet(data_path).join(
        input_counts.select("bucket"), "bucket", "left_semi"
    )
    manifest = _manifest_frame(written, input_counts)
    manifest.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(out_dir, MANIFEST_DIRNAME)
    )


def run_resumable_extraction(
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    keep_cols: list[str] | None = None,
) -> dict:
    """Extract ``pages`` -> ``out_dir``, skipping buckets already committed.

    Returns a metrics dict (extraction-rate metrics manifest): buckets
    total/committed/processed, rows in/out.
    """
    spark = pages.sparkSession
    pages_b = pages.withColumn("bucket", url_salt(n_buckets))

    committed = read_manifests(spark, out_dir)
    if committed is not None:
        done = committed.select("bucket").distinct()
        todo = pages_b.join(done, "bucket", "left_anti")  # resume: skip committed
        n_done = done.count()
    else:
        todo = pages_b
        n_done = 0

    n_in = todo.count()
    if n_in == 0:
        return {
            "buckets_total": n_buckets,
            "buckets_committed_before": n_done,
            "buckets_processed": 0,
            "rows_in": 0,
            "rows_out": 0,
        }

    extracted = extract_pages(
        todo, repartition_buckets=None, keep_cols=(keep_cols or []) + ["bucket"]
    )
    write_with_manifests(extracted, out_dir)

    man = read_manifests(spark, out_dir)
    agg = man.agg(
        F.countDistinct("bucket").alias("b"),
        F.sum("output_count").alias("o"),
    ).collect()[0]
    return {
        "buckets_total": n_buckets,
        "buckets_committed_before": n_done,
        "buckets_processed": int(agg["b"]) - n_done,
        "rows_in": n_in,
        "rows_out": int(agg["o"]),
    }
